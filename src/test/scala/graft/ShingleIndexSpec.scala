package graft

import graft.operators.Curation
import graft.sources.ShingleIndex
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The persisted postings index must reproduce the oracle-gated
  * incremental-dedup semantics: an index built from the "existing"
  * corpus half, probed with the "new batch" half, equals
  * q_crosscorpus_dedup's DuckDB-checked rows — plus the storage
  * properties (mergeable appends, bucket-pruned reads) that make it the
  * at-scale form.
  */
class ShingleIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)
  private def evens = docs.filter($"doc_id" % 2 === 0)
  private def odds = docs.filter($"doc_id" % 2 === 1)

  test("matchBatch over a built index equals the oracle-gated crosscorpus dedup") {
    val dir = Files.createTempDirectory("shidx").toString + "/index"
    val idx = new ShingleIndex(spark, dir)
    idx.build(evens)
    val got = idx.matchBatch(odds)
      .select($"new_doc", $"dup_of", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val want = Curation.qCrossCorpusDedup.fn(spark, sf)
      .as[(Long, Long, Double)].collect().toSet
    assert(want.nonEmpty, "fixture must contain cross-half near-dups")
    assert(got === want)
  }

  test("append merges into the same layout: split build == one-shot build") {
    val dir = Files.createTempDirectory("shidxa").toString + "/index"
    val idx = new ShingleIndex(spark, dir)
    idx.build(evens.filter($"doc_id" < 250))
    idx.append(evens.filter($"doc_id" >= 250))
    val got = idx.matchBatch(odds)
      .as[(Long, Long, Double)].collect().toSet
    val oneShotDir = Files.createTempDirectory("shidxb").toString + "/index"
    val oneShot = new ShingleIndex(spark, oneShotDir)
    oneShot.build(evens)
    val want = oneShot.matchBatch(odds)
      .as[(Long, Long, Double)].collect().toSet
    assert(got === want)
  }

  test("batch probe prunes the index read to the batch's buckets") {
    val dir = Files.createTempDirectory("shidxp").toString + "/index"
    val idx = new ShingleIndex(spark, dir)
    idx.build(evens)
    // a tiny batch touches few buckets; the index scan must carry a
    // PartitionFilters entry on the bucket column
    val df = idx.matchBatch(odds.filter($"doc_id" < 20))
    df.collect()
    val scans = df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("FileScan parquet"))
      .filter(_.contains(dir.split('/').last))
      .toSeq
    assert(scans.exists(_.contains("PartitionFilters: [bucket")),
      s"index scan must prune buckets:\n${scans.mkString("\n")}")
  }

  test("bucket stats account for every posting and spot skew honestly") {
    val dir = Files.createTempDirectory("shidxs").toString + "/index"
    val idx = new ShingleIndex(spark, dir)
    idx.build(docs)
    val st = idx.stats().as[(Long, Long, Long, Long)].collect()
    assert(st.nonEmpty && st.length <= 64, "at most nBuckets rows")
    st.foreach { case (b, np, ns, nd) =>
      assert(b >= 0 && b < 64)
      assert(ns <= np && nd <= np, s"bucket $b distincts exceed postings")
    }
    // totals reconcile with a direct read of the index
    val direct = spark.read.parquet(dir).count()
    assert(st.map(_._2).sum === direct, "postings total diverged")
  }

  test("the query-side DF cap drops shingles hot across index AND batch") {
    val dir = Files.createTempDirectory("shidxc").toString + "/index"
    val idx = new ShingleIndex(spark, dir)
    idx.build(evens)
    // cap 1 drops EVERY shared shingle (any match needs df >= 2 across
    // the union), so no pair can reach the Jaccard threshold
    assert(idx.matchBatch(odds, dfCap = 1).count() === 0)
  }
}
