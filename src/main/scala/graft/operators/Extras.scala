package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Coverage-completing operators: bag-semantics set ops, ordered array
  * aggregation, arg-max selection, approximate distinct counting, and
  * the two-phase salted aggregation pattern for skewed keys.
  */
object Extras {

  /** INTERSECT ALL / EXCEPT ALL (bag semantics — multiplicity-aware). */
  val qSetOpsAll = QueryDef.sql(
    "q_set_ops_all",
    """SELECT 'inter' AS tag, n FROM (
      |  SELECT c_nationkey AS n FROM customer
      |  INTERSECT ALL SELECT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT 'exc' AS tag, n FROM (
      |  SELECT c_nationkey AS n FROM customer
      |  EXCEPT ALL SELECT s_nationkey FROM supplier)
      |ORDER BY tag, n""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val custN = Tables.customer(s, d).select($"c_nationkey".as("n"))
    val suppN = Tables.supplier(s, d).select($"s_nationkey".as("n"))
    custN.intersectAll(suppN).select(lit("inter").as("tag"), $"n")
      .unionByName(custN.exceptAll(suppN).select(lit("exc").as("tag"), $"n"))
      .orderBy($"tag", $"n")
  }

  /** Ordered array aggregation: per return flag, the sorted set of
    * status values — collect_set + sort_array. Emitted as a ','-joined
    * string: the verify harness's pandas compare cannot hash list-typed
    * cells, and the join is lossless for single-char statuses. */
  val qArrayAgg = QueryDef.sql(
    "q_array_agg",
    """SELECT l_returnflag,
      |       list_aggregate(list_sort(list(DISTINCT l_linestatus)),
      |                      'string_agg', ',') AS statuses,
      |       CAST(len(list(DISTINCT l_linestatus)) AS INT) AS n_statuses
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables
      .lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        array_join(sort_array(collect_set($"l_linestatus")), ",").as("statuses"),
        size(collect_set($"l_linestatus")).as("n_statuses"))
      .orderBy($"l_returnflag")
  }

  /** arg-max / arg-min selection (max_by / min_by ≡ DuckDB arg_max).
    * The ordering key carries a custkey*1e-9 epsilon — far below the
    * 0.01 acctbal granularity — so equal balances break ties
    * deterministically and identically in both engines. */
  val qArgMax = QueryDef.sql(
    "q_argmax",
    """SELECT c_mktsegment,
      |       arg_max(c_name, c_acctbal + c_custkey * 0.000000001) AS richest,
      |       arg_min(c_name, c_acctbal + c_custkey * 0.000000001) AS poorest,
      |       round(max(c_acctbal), 2)   AS max_bal
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val key = $"c_acctbal" + $"c_custkey" * 0.000000001
    Tables
      .customer(s, d)
      .groupBy($"c_mktsegment")
      .agg(
        max_by($"c_name", key).as("richest"),
        min_by($"c_name", key).as("poorest"),
        round(max($"c_acctbal"), 2).as("max_bal"))
      .orderBy($"c_mktsegment")
  }

  /** HLL approximate distinct — sketch algorithms differ between engines
    * so this is rows-only; ExtrasSpec asserts the estimate is within 5%
    * of the exact count. */
  val qApproxDistinct = QueryDef.rowsOnly("q_approx_distinct") { (s, d) =>
    import s.implicits._
    Tables
      .lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_partkey").as("approx_parts"),
        countDistinct($"l_partkey").as("exact_parts"))
      .orderBy($"l_returnflag")
  }

  /** Two-phase salted aggregation: the skew-mitigation pattern — phase 1
    * aggregates on (key, salt) spreading a hot key over 8 reducers,
    * phase 2 merges partials per key. Result is identical to the plain
    * aggregation (same oracle as the token histogram). */
  val qSaltedHistogram = QueryDef.sql(
    "q_token_histogram_salted",
    """SELECT word, count(*) AS n
      |FROM (SELECT unnest(string_split_regex(trim(text), ' +')) AS word
      |      FROM documents)
      |GROUP BY word
      |ORDER BY n DESC, word
      |LIMIT 50""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables
      .documents(s, d)
      .select(explode(graft.functions.TextFunctions.words($"text")).as("word"))
      .withColumn("salt", pmod(crc32($"word".cast("binary")) + monotonically_increasing_id(), lit(8)))
      .groupBy($"word", $"salt")
      .agg(count(lit(1)).as("partial"))
      .groupBy($"word")
      .agg(sum($"partial").cast("long").as("n"))
      .orderBy($"n".desc, $"word")
      .limit(50)
  }

  /** Pivot (wide conditional aggregation): order counts per month x
    * status. Spark's groupBy().pivot() with explicit values; the oracle
    * uses conditional aggregation (identical semantics, stable columns). */
  val qPivot = QueryDef.sql(
    "q_pivot",
    """SELECT CAST(year(o_orderdate) AS INT) AS y,
      |       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS st_f,
      |       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS st_o,
      |       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS st_p
      |FROM orders
      |GROUP BY y
      |ORDER BY y""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables
      .orders(s, d)
      .groupBy(year($"o_orderdate").as("y"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select($"y",
        coalesce($"F", lit(0L)).as("st_f"),
        coalesce($"O", lit(0L)).as("st_o"),
        coalesce($"P", lit(0L)).as("st_p"))
      .orderBy($"y")
  }

  /** Distribution window functions: ntile / percent_rank / cume_dist
    * over customers by balance within segment. */
  val qWindowNtile = QueryDef.sql(
    "q_window_ntile",
    """SELECT c_custkey, c_mktsegment,
      |       CAST(ntile(4) OVER w AS INT)           AS quartile,
      |       round(percent_rank() OVER w, 6)        AS pct_rank,
      |       round(cume_dist() OVER w, 6)           AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_mktsegment, c_custkey""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal", $"c_custkey")
    Tables
      .customer(s, d)
      .select(
        $"c_custkey",
        $"c_mktsegment",
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy($"c_mktsegment", $"c_custkey")
  }

  def defs: Seq[QueryDef] =
    Seq(qSetOpsAll, qArrayAgg, qArgMax, qApproxDistinct, qSaltedHistogram,
      qPivot, qWindowNtile)
}
