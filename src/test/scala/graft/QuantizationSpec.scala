package graft

import graft.operators.Quantization
import org.apache.spark.sql.functions._

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  test("PQ assignment: one code per (vector, subspace), codes in [0, K)") {
    val a = Quantization.assignment(Tables.embeddings(spark, sf))
      .select($"vec_id", $"s", $"cid", $"dist4")
      .as[(Long, Int, Int, Long)].collect()
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(a.length === nVecs * Quantization.PqM,
      "every vector must get exactly M codes")
    assert(a.map(r => (r._1, r._2)).distinct.length === a.length,
      "(vec_id, s) must be unique")
    a.foreach { case (v, s, cid, d4) =>
      assert(cid >= 0 && cid < Quantization.PqK, s"code $cid out of range")
      assert(d4 >= 0, s"negative quantized distance for ($v, $s)")
    }
    // a codebook seed vector's own subvector IS a centroid, so its
    // assigned distance must be exactly zero in every subspace
    a.filter(_._1 < Quantization.PqK).foreach { case (v, s, _, d4) =>
      assert(d4 === 0L, s"seed vector $v subspace $s has nonzero dist $d4")
    }
  }

  test("PQ subspace report: M rows, bounded codes, mean <= max") {
    val got = Quantization.qPqQuantize.fn(spark, sf)
      .as[(Int, Long, Long, Double, Double)].collect()
    assert(got.length === Quantization.PqM)
    assert(got.map(_._1).sorted.toSeq === (0 until Quantization.PqM).toSeq)
    val nVecs = Tables.embeddings(spark, sf).count()
    got.foreach { case (s, n, used, meanD, maxD) =>
      assert(n === nVecs, s"subspace $s dropped vectors")
      assert(used >= 1 && used <= Quantization.PqK)
      assert(meanD >= 0.0 && meanD <= maxD + 1e-9,
        s"subspace $s mean $meanD above max $maxD")
    }
  }

  test("PQ ADC recall: one row per query, hits in [0, 10], recall = hits/10") {
    val got = Quantization.qPqRecall.fn(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(got.map(_._1).sorted.toSeq === Seq(0L, 1L, 2L))
    got.foreach { case (qid, hits, recall) =>
      assert(hits >= 0 && hits <= 10, s"query $qid hits $hits")
      assert(math.abs(recall - hits / 10.0) < 1e-12)
    }
    // ADC over 8-of-64-dim codes on the fixture must beat random chance
    // (random top-10 of ~500 would overlap ~0.2 vectors on average)
    assert(got.map(_._2).sum >= 3, "ADC recall no better than chance")
  }

  test("IVF-PQ: pruning real, recall sane, scanned bounded by corpus") {
    val got = Quantization.qAnnIvfPq.fn(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.map(_._1).sorted.toSeq === Seq(0L, 1L, 2L))
    val nVecs = Tables.embeddings(spark, sf).count()
    got.foreach { case (qid, scanned, hits, recall) =>
      // probing nprobe of nCells cells MUST prune: scanning the whole
      // corpus means the cell routing is broken
      assert(scanned > 0 && scanned < nVecs,
        s"query $qid scanned $scanned of $nVecs — no pruning")
      assert(hits >= 0 && hits <= 10)
      assert(math.abs(recall - hits / 10.0) < 1e-12)
    }
    // the probed cells contain the query itself and its neighborhood;
    // across 3 queries the index must beat chance decisively
    assert(got.map(_._3).sum >= 3, "IVF-PQ recall no better than chance")
  }

  test("PQ plans broadcast the codebook and LUT, never sort-merge") {
    def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
      df.collect() // force AQE finalization
      val p = df.queryExecution.executedPlan.toString
      val i = p.indexOf("== Initial Plan ==")
      if (i >= 0) p.substring(0, i) else p
    }
    val pq = finalPlan(Quantization.qPqQuantize.fn(spark, sf))
    assert(!pq.contains("SortMergeJoin"),
      s"codebook is M*K rows; no sort-merge join in:\n$pq")
    val pr = finalPlan(Quantization.qPqRecall.fn(spark, sf))
    assert(!pr.contains("SortMergeJoin"),
      s"LUT and query sides are tiny; no sort-merge join in:\n$pr")
    val pi = finalPlan(Quantization.qAnnIvfPq.fn(spark, sf))
    assert(!pi.contains("SortMergeJoin"),
      s"cells/codebook/LUT all broadcast; no sort-merge join in:\n$pi")
  }
}
