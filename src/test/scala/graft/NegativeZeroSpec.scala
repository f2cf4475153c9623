package graft

import org.apache.spark.sql.Row

/** Registry-wide signed-zero fence.
  *
  * Spark's `round()` lowers through BigDecimal, which has no signed
  * zero, while DuckDB's `round()` preserves the IEEE sign bit of a
  * tiny negative argument — so any rounded DOUBLE column can emit
  * `0.0` on one engine and `-0.0` on the other for the same value.
  * The driver hashes byte representations, so a single such cell
  * flips a correctness row red (this killed q_embed_project in r6/r7
  * on exactly one cell of 8,000).
  *
  * This law materializes EVERY registry query at both fixture scales
  * and asserts no output cell is a negative-zero double or float. The
  * paired convention (SURVEY §8): any rounded DOUBLE output appends
  * `+ 0.0` in BOTH engine texts (IEEE: `-0.0 + 0.0 = +0.0`), or
  * integer-quantizes (`CAST(round(x*10000) AS BIGINT)`). A query that
  * trips this spec on a future testdata generation names the exact
  * query/column/scale to apply the convention to.
  */
class NegativeZeroSpec extends SparkSpec {

  private val NegZeroBits = java.lang.Double.doubleToRawLongBits(-0.0d)
  private val NegZeroBitsF = java.lang.Float.floatToRawIntBits(-0.0f)

  private def negZeroPaths(v: Any, path: String): Seq[String] = v match {
    case null => Nil
    case d: java.lang.Double
        if java.lang.Double.doubleToRawLongBits(d) == NegZeroBits =>
      Seq(path)
    case f: java.lang.Float
        if java.lang.Float.floatToRawIntBits(f) == NegZeroBitsF =>
      Seq(path)
    case r: Row =>
      r.schema match {
        case null =>
          r.toSeq.zipWithIndex.flatMap { case (c, i) =>
            negZeroPaths(c, s"$path.$i")
          }
        case sch =>
          r.toSeq.zip(sch.fieldNames).flatMap { case (c, n) =>
            negZeroPaths(c, s"$path.$n")
          }
      }
    case s: scala.collection.Seq[_] =>
      s.toSeq.zipWithIndex.flatMap { case (c, i) =>
        negZeroPaths(c, s"$path[$i]")
      }
    case m: scala.collection.Map[_, _] =>
      m.flatMap { case (k, c) => negZeroPaths(c, s"$path[$k]") }.toSeq
    case _ => Nil
  }

  private def auditScale(sfDir: String): Unit = {
    val offenders = SparkEntry.allDefs.flatMap { q =>
      // audit EVERY row: registry results are aggregate-sized by the
      // driver-fetch convention, so a full collect is cheap (a .take
      // after collect would bound nothing anyway — collect already
      // materialized the result)
      val hits = q.fn(spark, sfDir).collect().flatMap { row =>
        negZeroPaths(row, q.name)
      }
      hits.take(3) // a few exemplar cells per query suffice to localize
    }
    assert(
      offenders.isEmpty,
      s"negative-zero double cells at $sfDir (apply the `+ 0.0` / " +
        s"integer-quantize convention, SURVEY §8): ${offenders.mkString(", ")}")
  }

  test("no registry query emits a negative-zero cell at sf0.001") {
    auditScale(sf)
  }

  test("no registry query emits a negative-zero cell at sf0.01") {
    auditScale("/root/testdata/sf0.01")
  }
}
