package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import scala.math.BigDecimal.RoundingMode

class TextDistributionSpec extends SparkSpec {
  import spark.implicits._

  private def r4(v: Double): Double =
    BigDecimal(v).setScale(4, RoundingMode.HALF_UP).toDouble

  private def tokens: Seq[String] = Tables.documents(spark, sf)
    .select(explode(graft.functions.TextFunctions.words($"text")).as("w"))
    .as[String].collect().toSeq

  test("zipf fit matches a plain-Scala OLS over the same quantized logs") {
    val got = TextOps.qZipfFit.fn(spark, sf)
      .as[(Long, Double, Double, Double)].collect()
    assert(got.length === 1)
    val (nRanks, slope, intercept, r2) = got.head

    val counts = tokens.groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (w, n) => (-n, w) }
      .take(TextOps.ZipfTopN)
    assert(nRanks === counts.length.toLong)
    val xy = counts.zipWithIndex.map { case ((_, n), i) =>
      (math.floor(math.log10((i + 1).toDouble) * 100000.0 + 0.5).toLong,
        math.floor(math.log10(n.toDouble) * 100000.0 + 0.5).toLong)
    }
    val k = xy.length.toLong
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val syy = xy.map(p => p._2 * p._2).sum
    val num = k * sxy - sx * sy
    val den = k * sxx - sx * sx
    val deny = k * syy - sy * sy
    val eSlope = num * 1.0 / den
    assert(slope === r4(eSlope), "slope differs from plain-Scala OLS")
    assert(intercept === r4(sy * 1.0 / k - eSlope * (sx * 1.0 / k)))
    assert(r2 === r4(eSlope * (num * 1.0 / deny)))
    // distributional sanity: frequency falls with rank and the log-log
    // fit explains most of the variance on natural-ish text
    assert(slope < 0.0, s"Zipf slope must be negative, got $slope")
    assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9, s"r2 $r2 out of [0,1]")
  }

  test("pmi collocations: floor respected, lift recomputed, order correct") {
    val got = TextOps.qPmiCollocations.fn(spark, sf)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.length <= 20)

    val toks = tokens
    val uni = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nTok = toks.size.toLong
    val docs = Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.words($"text").as("w"))
      .as[Seq[String]].collect()
    val bi = docs.flatMap(w => w.zip(w.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

    got.foreach { case (h, n, pairN, headN, nextN, lift) =>
      assert(pairN >= 5, s"pair ($h,$n) below the count floor")
      assert(bi((h, n)) === pairN, s"pair count mismatch for ($h,$n)")
      assert(uni(h) === headN && uni(n) === nextN)
      assert(lift === r4(pairN * 1.0 * nTok / (headN * 1.0 * nextN)),
        s"lift mismatch for ($h,$n)")
      assert(lift > 0.0)
    }
    // non-increasing lift down the list (ties broken by pair text)
    val lifts = got.map(_._6).toSeq
    lifts.zip(lifts.tail).foreach { case (a, b) =>
      assert(a >= b - 1e-9, "lift must be non-increasing")
    }
  }
}
