package graft

import graft.operators.{CorpusOps, Dedup}
import org.apache.spark.sql.functions._

/** Library behavior on degenerate inputs — empty corpora, single rows,
  * all-identical documents, empty text. A curation library gets handed
  * these at the edges of real pipelines (an empty shard, a filter that
  * rejected everything), and each must return a well-formed empty or
  * trivial answer, never throw or hang.
  */
class DegenerateInputSpec extends SparkSpec {
  import spark.implicits._

  private val schema = Seq.empty[(Long, String, String)]
    .toDF("doc_id", "text", "lang")

  test("empty corpus: every per-row operator returns an empty result") {
    assert(CorpusOps.gopherRules(schema, "doc_id", "text").count() === 0)
    assert(CorpusOps.packLayout(schema, "doc_id", "text", "lang")
      .count() === 0)
    assert(CorpusOps.packEfficiency(schema, "doc_id", "text", "lang")
      .count() === 0)
    assert(CorpusOps.repetitionMetrics(schema, "doc_id", "text")
      .count() === 0)
    assert(CorpusOps
      .stratifiedSample(schema, "doc_id", "lang", Seq("en" -> 500))
      .count() === 0)
  }

  test("empty corpus: dedup grouping and canonical selection are empty") {
    assert(CorpusOps.dedupGroups(schema, "doc_id", "text").count() === 0)
    assert(CorpusOps
      .canonicalPerGroup(schema.withColumn("n_chars", length($"text")),
        "doc_id", "text", "n_chars")
      .count() === 0)
  }

  test("connected components of an empty edge list is empty") {
    val edges = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(Dedup.connectedComponents(edges).count() === 0)
  }

  test("hill tail: all-tied top frequencies yield H=0, alpha sentinel 0") {
    // the 100x scale probe's replica corpus: every word occurs exactly
    // once, so the whole top-k is tied — 1/H would divide by zero
    val dir = java.nio.file.Files
      .createTempDirectory("graft_degenerate").toString
    (0L until 40L)
      .map(i => (i, s"w${i}a w${i}b w${i}c", "en", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.operators.TextOps.qHillTail.fn(spark, dir)
      .select($"k", $"hill_h", $"alpha")
      .as[(Long, Double, Double)].head()
    assert(r._2 === 0.0, "tied tail has zero Hill H")
    assert(r._3 === 0.0, "alpha reports the documented sentinel, not 1/0")
  }

  test("single document: its own group, its own keeper, one pack bin") {
    val one = Seq((7L, "alpha beta gamma delta epsilon zeta", "en"))
      .toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length($"text"))
    val groups = CorpusOps.dedupGroups(one, "doc_id", "text").collect()
    assert(groups.length === 1 && groups.head.getLong(1) === 7L)
    val canon = CorpusOps
      .canonicalPerGroup(one, "doc_id", "text", "n_chars").collect()
    assert(canon.length === 1)
    assert(canon.head.getAs[Boolean]("keep"))
    assert(canon.head.getAs[Long]("n_members") === 1L)
    val layout = CorpusOps.packLayout(one, "doc_id", "text", "lang")
      .collect()
    assert(layout.length === 1)
    assert(layout.head.getAs[Int]("bin") === 0)
    assert(layout.head.getAs[Int]("offset") === 0)
  }

  test("all-identical corpus: one group, one keeper, min id wins") {
    val clones = (1L to 6L)
      .map(i => (i, "the quick brown fox jumps over the lazy dog again",
        "en"))
      .toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length($"text"))
    val canon = CorpusOps
      .canonicalPerGroup(clones, "doc_id", "text", "n_chars")
      .collect()
    assert(canon.length === 6)
    assert(canon.forall(_.getAs[Long]("group_id") === 1L))
    assert(canon.forall(_.getAs[Long]("canonical_doc") === 1L))
    assert(canon.count(_.getAs[Boolean]("keep")) === 1)
    assert(canon.forall(_.getAs[Long]("n_members") === 6L))
  }

  test("empty text survives every text operator without throwing") {
    val weird = Seq(
      (1L, "", "en"),
      (2L, "   ", "en"),
      (3L, "one", "en"))
      .toDF("doc_id", "text", "lang")
    val rules = CorpusOps.gopherRules(weird, "doc_id", "text").collect()
    assert(rules.length === 3)
    // none can pass: all are far below the word-count floor
    assert(rules.forall(!_.getAs[Boolean]("pass")))
    val layout = CorpusOps.packLayout(weird, "doc_id", "text", "lang")
      .collect()
    assert(layout.length === 3)
    layout.foreach(r => assert(r.getAs[Int]("n_tokens") >= 0))
  }

  test("weighted sample with k larger than the corpus returns everything") {
    val tiny = Seq((1L, 2.0), (2L, 1.0), (3L, 3.0)).toDF("id", "wgt")
    val got = CorpusOps.weightedSample(tiny, "id", "wgt", k = 100)
    assert(got.count() === 3)
  }
  test("empty corpus: prefix-filter join, spectral, and typed centroid degenerate cleanly") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.prefixFilterPairs(docs).count() === 0)
    val emb = Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    // moments buffer is well-formed with n = 0 …
    val m = graft.operators.Spectral.moments(emb).head().getSeq[Double](0)
    assert(m.head === 0.0)
    // … and the eigen path refuses it loudly instead of emitting NaN
    val err = intercept[IllegalArgumentException] {
      graft.operators.Spectral.covarianceMatrix(emb)
    }
    assert(err.getMessage.contains("no valid vectors"))
    // the typed centroid finishes to the zero vector on an empty group
    val agg = new graft.functions.TypedAggregators
      .VecCentroid[Seq[Float]](4, identity)
    assert(agg.finish(agg.zero).toSeq === Seq(0.0, 0.0, 0.0, 0.0))
  }
}
