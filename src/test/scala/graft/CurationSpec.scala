package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Semantic-dedup scale contract: the cluster count grows with the
  * corpus, so the within-cell all-pairs cost per cell stays bounded
  * instead of growing O((N/k)²) under a fixed k.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("semanticCellCount scales with corpus size (min 16)") {
    assert(Curation.semanticCellCount(500) === 16)
    assert(Curation.semanticCellCount(16000) === 16)
    assert(Curation.semanticCellCount(100000) === 100)
    assert(Curation.semanticCellCount(1000000000L) === 1000000)
    // ceil division: one straggler row still gets a cell
    assert(Curation.semanticCellCount(100001) === 101)
  }

  test("per-cell candidate-pair cost shrinks as the cell count scales up") {
    val emb = Tables.embeddings(spark, sf) // 500 vectors
    def pairCost(k: Int): (Long, Long) = {
      val sizes = Curation
        .semanticCells(emb, k)
        .groupBy($"cid")
        .agg(count(lit(1)).as("n"))
        .select($"n")
        .as[Long]
        .collect()
      (sizes.map(n => n * (n - 1) / 2).sum, sizes.max)
    }
    val (cost4, max4) = pairCost(4)
    val (cost16, max16) = pairCost(16)
    val (cost125, max125) = pairCost(125)
    // scaling k down-bounds the quadratic tail: more cells → smaller
    // max cell → fewer within-cell pairs. The all-pairs baseline is
    // 500*499/2 = 124750.
    assert(cost4 < 124750, "4 cells must already beat all-pairs")
    assert(cost16 < cost4)
    assert(cost125 < cost16)
    assert(max16 < max4)
    assert(max125 < max16)
    // with k≈n/4 the biggest cell is a small constant factor of target
    assert(max125 <= 50, s"max cell size $max125 not bounded at k=125")
  }

  test("assignment covers every non-zero vector exactly once") {
    val emb = Tables.embeddings(spark, sf)
    val cells = Curation.semanticCells(emb, 16)
    assert(cells.count() === emb.count()) // fixture has no zero vectors
    assert(cells.select($"vec_id").distinct().count() === emb.count())
  }

  test("source overlap matches a plain-Scala set computation") {
    val docs = Seq(
      (1L, "a b c d e", "s1"),
      (2L, "c d e f g", "s2"),
      (3L, "x y z w q", "s3"),
      (4L, "a b c x y", "s1")
    ).toDF("doc_id", "text", "source")
    val got = graft.operators.CorpusOps
      .sourceOverlap(docs, "source", "text")
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    def sh(ts: String*): Set[String] =
      ts.flatMap(_.split(" ").sliding(3).map(_.mkString(" "))).toSet
    val vocab = Map(
      "s1" -> sh("a b c d e", "a b c x y"),
      "s2" -> sh("c d e f g"),
      "s3" -> sh("x y z w q"))
    for (a <- vocab.keys; b <- vocab.keys if a != b) {
      val common = (vocab(a) & vocab(b)).size
      if (common == 0)
        assert(!got.contains((a, b)), s"($a,$b) shares nothing, no row")
      else {
        val (na, nc, cont) = got((a, b))
        assert(na === vocab(a).size.toLong, s"($a,$b) |A|")
        assert(nc === common.toLong, s"($a,$b) common")
        assert(cont ===
          math.floor(common * 10000.0 / vocab(a).size + 0.5) / 10000.0,
          s"($a,$b) containment")
      }
    }
    // containment is asymmetric: s1 covers all of s2's overlap but not
    // vice versa when vocab sizes differ
    assert(got((("s1"), ("s2")))._3 != got((("s2"), ("s1")))._3 ||
      vocab("s1").size == vocab("s2").size)
  }
}
