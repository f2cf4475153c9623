package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no built-in for — as-of join and
  * range join — composed from windows and range predicates (SURVEY §2.3
  * "ABSENT" list; preference order (a): compose existing ops).
  *
  * Scale design: the as-of join is the union+window formulation — both
  * inputs shuffle ONCE on the join key and a single ordered window pass
  * resolves every probe row, instead of a per-row backward scan. This is
  * the standard distributed as-of pattern (a sort-merge within key
  * partitions); at 100 TB it is one exchange of each side, same as any
  * equi-join. The range join stays an equi-join on the key with the time
  * band as a post-join predicate, so Catalyst still plans a hash join —
  * never a cartesian product.
  */
object Temporal {

  /** As-of join: for each purchase, the most recent strictly-earlier
    * click by the same user. Spark: union both streams, one window pass;
    * oracle: DuckDB's native ASOF JOIN. */
  val qAsofJoin = QueryDef.sql(
    "q_asof_join",
    """SELECT p.event_id,
      |       p.user_id,
      |       c.event_id AS prior_click
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND c.ts < p.ts
      |ORDER BY p.event_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val ev = Tables.events(s, d).filter($"event_type".isin("purchase", "click"))
    // clicks sort before purchases at identical ts (ts are ns-unique in
    // this data, but keep the tag in the order for determinism)
    // compare at µs like the oracle (DuckDB truncates TIMESTAMP_NS to
    // µs); purchases sort BEFORE clicks at an equal µs so the -1 frame
    // excludes same-µs clicks — matching the oracle's STRICT c.ts < p.ts
    // — and event_id makes equal-µs click order deterministic
    val tagged = ev.select(
      $"event_id",
      $"user_id",
      expr("ts_ns div 1000").as("ts_us"),
      when($"event_type" === "click", $"event_id").as("click_id"),
      ($"event_type" === "purchase").cast("int").as("is_purchase"))
    val w = Window
      .partitionBy($"user_id")
      .orderBy($"ts_us", $"is_purchase".desc, $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged
      .withColumn("prior_click", last($"click_id", ignoreNulls = true).over(w))
      .filter($"is_purchase" === 1)
      .select($"event_id", $"user_id", $"prior_click")
      .orderBy($"event_id")
  }

  /** Range join: events by the same user inside (t, t+5min] after each
    * purchase — equi-join on user_id with a time-band predicate. */
  val qRangeJoin = QueryDef.sql(
    "q_range_join",
    """SELECT p.event_id,
      |       count(e.event_id) AS n_follow
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN events e
      |  ON p.user_id = e.user_id
      | AND epoch_us(e.ts) > epoch_us(p.ts)
      | AND epoch_us(e.ts) <= epoch_us(p.ts) + 300000000
      |GROUP BY p.event_id
      |ORDER BY p.event_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val ev = Tables.events(s, d)
    val purchases = ev
      .filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id".as("p_user"),
        expr("ts_ns div 1000").as("p_ts"))
    val follows = ev.select($"event_id".as("e_id"), $"user_id".as("e_user"),
      expr("ts_ns div 1000").as("e_ts"))
    purchases
      .join(
        follows,
        $"p_user" === $"e_user" && $"e_ts" > $"p_ts" &&
          $"e_ts" <= $"p_ts" + 300000000L,
        "left")
      .groupBy($"p_id")
      .agg(count($"e_id").as("n_follow"))
      .select($"p_id".as("event_id"), $"n_follow")
      .orderBy($"event_id")
  }

  /** Dataset-level entry for the native as-of join
    * ([[graft.plans.AsofJoin]]): registers the planner strategy
    * (idempotent), requires disjoint column names between the sides (the
    * caller renames — this keeps attribute ids disjoint too, since
    * renames are fresh Aliases), and returns left ++ nullable right. */
  def asofJoin(
      left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      strict: Boolean = true,
      rightTieBreak: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, DatasetBridge}
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsofJoinStrategy
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"asofJoin: rename overlapping columns $overlap")
    DatasetBridge.ofRows(
      spark,
      graft.plans.AsofJoin(
        DatasetBridge.analyzedPlan(left),
        DatasetBridge.analyzedPlan(right),
        ColumnBridge.expression(left(leftKey)),
        ColumnBridge.expression(right(rightKey)),
        ColumnBridge.expression(left(leftTime)),
        ColumnBridge.expression(right(rightTime)),
        strict,
        rightTieBreak.map(c => ColumnBridge.expression(right(c)))))
  }

  /** The same query as [[qAsofJoin]] through the NATIVE as-of exec —
    * gated by the identical DuckDB ASOF JOIN oracle, so the custom
    * operator's merge logic is hash-checked end-to-end against an
    * independent engine. */
  val qAsofJoinNative = QueryDef.sql(
    "q_asof_join_native",
    """SELECT p.event_id,
      |       p.user_id,
      |       c.event_id AS prior_click
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND c.ts < p.ts
      |ORDER BY p.event_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val ev = Tables.events(s, d)
    val purchases = ev
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", expr("ts_ns div 1000").as("ts_us"))
    val clicks = ev
      .filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("c_user"),
        expr("ts_ns div 1000").as("c_ts"))
    // tiebreak on click_id: clicks sharing a (user, µs) must resolve to
    // the largest id, matching the composed form's window ordering
    asofJoin(purchases, clicks, "user_id", "c_user", "ts_us", "c_ts",
      rightTieBreak = Seq("click_id"))
      .select($"event_id", $"user_id", $"click_id".as("prior_click"))
      .orderBy($"event_id")
  }

  /** Interval concurrency (sweep line): each order is "in fulfillment"
    * from o_orderdate until its last lineitem ships; per month, the PEAK
    * number of concurrently open orders plus the start/end censuses —
    * the operational gauge (warehouse load, open-position count,
    * concurrent-session peak) computed without an interval self-join.
    *
    * Scale (100 TB): a naive overlap self-join is O(n²) in dense
    * periods; the sweep line is two scans of the interval relation
    * (±1 events) and ONE running sum. The running sum uses the
    * two-phase prefix-sum shape from `q_events_gauge`: intra-month
    * windows (parallel across months) + inter-month offsets from the
    * per-month totals via a broadcast triangular join — no
    * single-partition WindowExec anywhere. Within a (ts, delta) tie
    * block the partial sums form the same multiset under any row order,
    * so the per-month MAX is deterministic on both engines. */
  val qIntervalConcurrency = QueryDef.sql(
    "q_interval_concurrency",
    """WITH oe AS (
      |  SELECT o.o_orderkey, o.o_orderdate AS st, max(l.l_shipdate) AS en
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  GROUP BY 1, 2),
      |sweep AS (
      |  SELECT st AS ts, 1 AS delta FROM oe
      |  UNION ALL
      |  SELECT en, -1 FROM oe),
      |r AS (
      |  SELECT strftime(date_trunc('month', ts), '%Y-%m') AS month, delta,
      |         sum(delta) OVER (ORDER BY ts, delta
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lvl
      |  FROM sweep)
      |SELECT month,
      |       CAST(max(lvl) AS BIGINT) AS peak_open,
      |       CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_starts,
      |       CAST(sum(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_ends
      |FROM r GROUP BY month ORDER BY month""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val oe = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderkey", $"o_orderdate")
      .agg(max($"l_shipdate").as("en"))
      .select($"o_orderdate".as("st"), $"en")
    val sweep = oe.select($"st".as("ts"), lit(1L).as("delta"))
      .unionAll(oe.select($"en".as("ts"), lit(-1L).as("delta")))
      .select($"ts", $"delta",
        date_format(date_trunc("month", $"ts"), "yyyy-MM").as("month"))
    val intraW = Window
      .partitionBy($"month")
      .orderBy($"ts", $"delta")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = sweep.groupBy($"month").agg(sum($"delta").as("mtotal"))
    val prior = totals.select($"month".as("pmonth"), $"mtotal".as("ptotal"))
    val offsets = totals
      .join(broadcast(prior), $"pmonth" < $"month", "left")
      .groupBy($"month")
      .agg(coalesce(sum($"ptotal"), lit(0L)).as("off"))
    sweep
      .withColumn("intra", sum($"delta").over(intraW))
      .join(broadcast(offsets), "month")
      .groupBy($"month")
      .agg(
        max($"intra" + $"off").cast("long").as("peak_open"),
        sum(when($"delta" === 1L, 1L).otherwise(0L)).as("n_starts"),
        sum(when($"delta" === -1L, 1L).otherwise(0L)).as("n_ends"))
      .orderBy($"month")
  }

  def defs: Seq[QueryDef] =
    Seq(qAsofJoin, qAsofJoinNative, qRangeJoin, qIntervalConcurrency)
}
