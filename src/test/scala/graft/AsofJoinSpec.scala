package graft

import graft.operators.Temporal
import org.apache.spark.sql.functions._

/** Semantics + plan-shape spec for the native as-of join exec
  * ([[graft.plans.AsofJoinExec]]). The DuckDB oracle gates it end-to-end
  * at verify time; these tests pin the edge semantics the oracle data
  * never exercises, and the physical shape.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def leftDf(rows: (Long, String, Long)*) =
    rows.toDF("l_id", "l_key", "l_ts")
  private def rightDf(rows: (Long, String, Long)*) =
    rows.toDF("r_id", "r_key", "r_ts")

  private def join(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame, strict: Boolean = true) =
    Temporal.asofJoin(l, r, "l_key", "r_key", "l_ts", "r_ts", strict)
      .select($"l_id", $"r_id").as[(Long, Option[Long])]
      .collect().sortBy(_._1).toSeq

  test("picks the latest strictly-earlier right row per key") {
    val l = leftDf((1, "a", 100), (2, "a", 200), (3, "b", 150))
    val r = rightDf((10, "a", 50), (11, "a", 99), (12, "a", 150), (13, "b", 150))
    assert(join(l, r) === Seq(
      (1L, Some(11L)), // 99 < 100; 150 is too late
      (2L, Some(12L)), // latest below 200
      (3L, None))) // b@150 not STRICTLY earlier
  }

  test("non-strict mode admits equal timestamps") {
    val l = leftDf((1, "b", 150))
    val r = rightDf((13, "b", 150))
    assert(join(l, r, strict = false) === Seq((1L, Some(13L))))
  }

  test("unmatched and null keys yield null right side (left outer)") {
    val l = Seq((1L, Option("a"), 100L), (2L, Option.empty[String], 100L),
      (3L, Option("zz"), 100L)).toDF("l_id", "l_key", "l_ts")
    val r = rightDf((10, "a", 60))
    val got = Temporal.asofJoin(l, r, "l_key", "r_key", "l_ts", "r_ts", strict = true)
      .select($"l_id", $"r_id").as[(Long, Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, Some(10L)), (2L, None), (3L, None)))
  }

  test("every left row survives across many keys and partitions") {
    val l = (0L until 1000L).map(i => (i, s"k${i % 7}", i * 10)).toDF("l_id", "l_key", "l_ts")
    val r = (0L until 300L).map(i => (i, s"k${i % 5}", i * 31)).toDF("r_id", "r_key", "r_ts")
    val out = Temporal.asofJoin(l, r, "l_key", "r_key", "l_ts", "r_ts")
    assert(out.count() === 1000)
    // cross-check a sample against a window-free brute force
    val brute = l.as("l").join(r.as("r"),
        $"l.l_key" === $"r.r_key" && $"r.r_ts" < $"l.l_ts", "left")
      .groupBy($"l_id").agg(max_by($"r_id", $"r_ts").as("want"))
    val gotVsWant = out.select($"l_id", $"r_id")
      .join(brute, "l_id")
      .filter(!($"r_id" <=> $"want"))
    assert(gotVsWant.count() === 0)
  }

  test("a null right time within a matching key is skipped, not a scan stopper") {
    // null times sort FIRST within the key: halting on one would hide the
    // key's real rows from every left probe
    val l = leftDf((1, "k", 100))
    val r = Seq((9L, "k", Option.empty[Long]), (10L, "k", Option(50L)))
      .toDF("r_id", "r_key", "r_ts")
    val got = Temporal.asofJoin(l, r, "l_key", "r_key", "l_ts", "r_ts")
      .select($"l_id", $"r_id").as[(Long, Option[Long])].collect().toSeq
    assert(got === Seq((1L, Some(10L))))
  }

  test("bare collect() works (exec must emit UnsafeRow, not JoinedRow)") {
    val l = leftDf((1, "a", 100))
    val r = rightDf((10, "a", 50))
    // no select() above the exec: the collect path casts rows to UnsafeRow
    val rows = Temporal.asofJoin(l, r, "l_key", "r_key", "l_ts", "r_ts").collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("r_id") === 10L)
    // same for a shuffle directly above the exec
    assert(Temporal.asofJoin(l, r, "l_key", "r_key", "l_ts", "r_ts")
      .orderBy($"l_id").count() === 1)
  }

  test("equal-time right rows resolve deterministically via the tiebreak") {
    val l = leftDf((1, "k", 100))
    val r = rightDf((7, "k", 50), (9, "k", 50), (8, "k", 50))
    val got = Temporal.asofJoin(l, r, "l_key", "r_key", "l_ts", "r_ts",
        strict = true, rightTieBreak = Seq("r_id"))
      .select($"r_id").as[Long].collect().toSeq
    assert(got === Seq(9L), "last in (key, time, r_id) order must win")
  }

  test("native equals the composed union+window formulation on real data") {
    val native = Temporal.qAsofJoinNative.fn(spark, sf)
    val composed = Temporal.qAsofJoin.fn(spark, sf)
    assert(native.except(composed).count() === 0)
    assert(composed.except(native).count() === 0)
  }

  test("plan shape: custom exec, one exchange per side, SMJ-style sorts") {
    val df = Temporal.qAsofJoinNative.fn(spark, sf)
    df.collect()
    // the AQE string prints Final AND Initial plans — scope to Final
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("AsofJoin"), s"custom exec missing:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 2,
      s"expect exactly one shuffle per side:\n$p")
  }
}
