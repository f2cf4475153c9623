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

  def defs: Seq[QueryDef] = Seq(qAsofJoin, qAsofJoinNative, qRangeJoin)
}
