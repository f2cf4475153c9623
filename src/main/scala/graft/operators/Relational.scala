package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics surface (SURVEY.md §2.3-§2.8).
  *
  * The reference has no relational engine — its query surface is KV lookups
  * and POSIX metadata ops — so this module supplies the general analytics
  * the north-star requires, written DataFrame-first so Catalyst gets full
  * freedom: filters/projections sit directly on the parquet scans (pushdown
  * + column pruning), small dimension tables are broadcast explicitly, and
  * every aggregation is a partial-agg-friendly `groupBy().agg()`.
  *
  * Scale notes (100 TB): the star joins broadcast every dimension below the
  * fact table; only fact-fact joins (orders⋈lineitem) shuffle, and they
  * shuffle on the join key both sides which AQE can further coalesce. No
  * query collects to the driver.
  */
object Relational {

  /** TPC-H Q1-style pricing summary — full-scan aggregation, map-side
    * partial aggregation makes this shuffle only |groups| rows. */
  val q1Agg = QueryDef.sql(
    "q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2)                            AS sum_qty,
      |       round(sum(l_extendedprice), 2)                       AS sum_base_price,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2)    AS sum_disc_price,
      |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |       round(avg(l_quantity), 2)                            AS avg_qty,
      |       round(avg(l_extendedprice), 2)                       AS avg_price,
      |       round(avg(l_discount), 2)                            AS avg_disc,
      |       count(*)                                             AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables
      .lineitem(s, d)
      .filter($"l_shipdate" <= lit("1998-09-01 00:00:00").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2)
          .as("sum_disc_price"),
        round(
          sum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")),
          2).as("sum_charge"),
        round(avg($"l_quantity"), 2).as("avg_qty"),
        round(avg($"l_extendedprice"), 2).as("avg_price"),
        round(avg($"l_discount"), 2).as("avg_disc"),
        count(lit(1)).as("count_order")
      )
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Selective filter + projection — predicate pushdown / column pruning
    * showcase: the parquet scan should read 4 columns and carry
    * PushedFilters for all three predicates. */
  val q6Filter = QueryDef.sql(
    "q6_selective_filter",
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.04 AND 0.07
      |  AND l_quantity < 24""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables
      .lineitem(s, d)
      .filter(
        $"l_shipdate" >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01 00:00:00").cast("timestamp") &&
          $"l_discount".between(0.04, 0.07) && $"l_quantity" < 24)
      .agg(round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"))
  }

  /** TPC-H Q3-style: selective dim filter → fact join → top-k revenue.
    * customer is broadcast; orders⋈lineitem shuffles on orderkey. */
  val q3JoinTopk = QueryDef.sql(
    "q3_join_topk",
    """SELECT l_orderkey,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      |       o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |              JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1996-06-30 00:00:00'
      |GROUP BY l_orderkey, orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val cust = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
    val ord = Tables
      .orders(s, d)
      .filter($"o_orderdate" < lit("1998-01-01 00:00:00").cast("timestamp"))
    val li = Tables
      .lineitem(s, d)
      .filter($"l_shipdate" > lit("1996-06-30 00:00:00").cast("timestamp"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .groupBy(
        $"l_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"),
        $"o_orderpriority")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2)
        .as("revenue"))
      .select($"l_orderkey", $"revenue", $"orderdate", $"o_orderpriority")
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  /** TPC-H Q5-style star join: dimensions broadcast by stats/AQE (the
    * catalog tables carry real sizes, so the planner broadcasts them
    * wherever they genuinely fit — at SF where supplier no longer fits
    * an executor, forcing it would OOM; explicit hints are reserved for
    * computed sidecars the planner can't size, r13 VERDICT #5), single
    * shuffle for the orders⋈lineitem fact join + one for the final
    * groupBy. */
  val q5StarJoin = QueryDef.sql(
    "q5_star_join",
    """SELECT n_name,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer
      |  JOIN orders   ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  JOIN nation   ON s_nationkey = n_nationkey
      |  JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val ord = Tables
      .orders(s, d)
      .filter(
        $"o_orderdate" >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          $"o_orderdate" < lit("1998-01-01 00:00:00").cast("timestamp"))
    Tables
      .customer(s, d)
      .join(ord, $"c_custkey" === $"o_custkey")
      .join(Tables.lineitem(s, d), $"l_orderkey" === $"o_orderkey")
      .join(
        Tables.supplier(s, d),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(Tables.nation(s, d), $"s_nationkey" === $"n_nationkey")
      .join(
        Tables.region(s, d).filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2)
        .as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** Left semi join (EXISTS): customers having at least one large order. */
  val qSemiJoin = QueryDef.sql(
    "q_semi_join",
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val bigOrders = Tables.orders(s, d).filter($"o_totalprice" > 400000)
    Tables
      .customer(s, d)
      .join(bigOrders, $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  /** Left anti join (NOT EXISTS): customers with no orders at all. */
  val qAntiJoin = QueryDef.sql(
    "q_anti_join",
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables
      .customer(s, d)
      .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** Left outer join with null handling: per-customer order stats,
    * customers without orders keep a 0 row (coalesce). */
  val qOuterJoin = QueryDef.sql(
    "q_outer_join",
    """SELECT c_custkey,
      |       count(o_orderkey)                        AS n_orders,
      |       round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey
      |ORDER BY c_custkey""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables
      .customer(s, d)
      .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(
        count($"o_orderkey").as("n_orders"),
        round(coalesce(sum($"o_totalprice"), lit(0.0)), 2).as("total_spent"))
      .orderBy($"c_custkey")
  }

  /** Window ranking: top-3 orders per customer by totalprice.
    * One shuffle on o_custkey; rank predicate applied post-window. */
  val qWindowRank = QueryDef.sql(
    "q_window_rank",
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey,
      |         round(o_totalprice, 2) AS totalprice,
      |         CAST(row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val w = Window
      .partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables
      .orders(s, d)
      .select(
        $"o_custkey",
        $"o_orderkey",
        round($"o_totalprice", 2).as("totalprice"),
        row_number().over(w).as("rn"))
      .filter($"rn" <= 3)
      .orderBy($"o_custkey", $"rn")
  }

  /** Window running aggregate: cumulative quantity per supplier over
    * ship-time (total order via the (shipdate, orderkey, linenumber) key). */
  val qWindowRunning = QueryDef.sql(
    "q_window_running",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |       round(sum(l_quantity) OVER (
      |         PARTITION BY l_suppkey
      |         ORDER BY l_shipdate, l_orderkey, l_linenumber
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
      |FROM lineitem
      |WHERE l_suppkey <= 3
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val w = Window
      .partitionBy($"l_suppkey")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables
      .lineitem(s, d)
      .filter($"l_suppkey" <= 3)
      .select(
        $"l_suppkey",
        $"l_orderkey",
        $"l_linenumber",
        round(sum($"l_quantity").over(w), 2).as("running_qty"))
      .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
  }

  /** Window lag/lead: per-customer gap in days between consecutive orders. */
  val qWindowLag = QueryDef.sql(
    "q_window_lag",
    """SELECT o_custkey, o_orderkey,
      |       CAST(coalesce(datediff('day',
      |         lag(o_orderdate) OVER (PARTITION BY o_custkey
      |                                ORDER BY o_orderdate, o_orderkey),
      |         o_orderdate), -1) AS INT) AS days_since_prev
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables
      .orders(s, d)
      .select(
        $"o_custkey",
        $"o_orderkey",
        coalesce(
          datediff($"o_orderdate", lag($"o_orderdate", 1).over(w)),
          lit(-1)).as("days_since_prev"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** Global sort + limit with a total order (top-k pattern: Spark plans
    * this as TakeOrderedAndProject — no full sort at scale). */
  val qSortLimit = QueryDef.sql(
    "q_sort_limit",
    """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 25""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables
      .lineitem(s, d)
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
      .select($"l_orderkey", $"l_linenumber", round($"l_extendedprice", 2).as("price"))
      .limit(25)
  }

  /** Set operations: nations that have customers vs suppliers —
    * INTERSECT / EXCEPT / UNION in one output, tagged. */
  val qSetOps = QueryDef.sql(
    "q_set_ops",
    """SELECT 'both' AS tag, n FROM (
      |  SELECT c_nationkey AS n FROM customer
      |  INTERSECT SELECT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT 'cust_only' AS tag, n FROM (
      |  SELECT c_nationkey AS n FROM customer
      |  EXCEPT SELECT s_nationkey FROM supplier)
      |ORDER BY tag, n""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val custN = Tables.customer(s, d).select($"c_nationkey".as("n"))
    val suppN = Tables.supplier(s, d).select($"s_nationkey".as("n"))
    val both = custN.intersect(suppN).select(lit("both").as("tag"), $"n")
    val custOnly =
      custN.except(suppN).select(lit("cust_only").as("tag"), $"n")
    both.unionByName(custOnly).orderBy($"tag", $"n")
  }

  /** Distinct + count-distinct aggregations. */
  val qDistinct = QueryDef.sql(
    "q_distinct",
    """SELECT l_returnflag,
      |       count(DISTINCT l_suppkey)  AS n_supp,
      |       count(DISTINCT l_partkey)  AS n_part
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables
      .lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_suppkey").as("n_supp"),
        countDistinct($"l_partkey").as("n_part"))
      .orderBy($"l_returnflag")
  }

  /** ROLLUP hierarchy totals (grouping-set aggregation). Null group keys
    * from the rollup are labeled 'ALL' so ordering stays deterministic. */
  val qRollup = QueryDef.sql(
    "q_rollup",
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |       coalesce(l_linestatus, 'ALL') AS linestatus,
      |       round(sum(l_quantity), 2)     AS sum_qty,
      |       count(*)                      AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables
      .lineitem(s, d)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(round(sum($"l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"sum_qty",
        $"n")
      .orderBy($"returnflag", $"linestatus")
  }

  /** CUBE over order status/priority. */
  val qCube = QueryDef.sql(
    "q_cube",
    """SELECT coalesce(o_orderstatus, 'ALL')    AS status,
      |       coalesce(o_orderpriority, 'ALL') AS priority,
      |       round(sum(o_totalprice), 2)       AS total,
      |       count(*)                          AS n
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables
      .orders(s, d)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(round(sum($"o_totalprice"), 2).as("total"), count(lit(1)).as("n"))
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"total",
        $"n")
      .orderBy($"status", $"priority")
  }

  /** String function surface (SURVEY §2.8 F2-F4 analogs): split, substring,
    * concat, upper/lower, length, trim. */
  val qStringFuncs = QueryDef.sql(
    "q_string_funcs",
    """SELECT p_partkey,
      |       upper(p_brand)                         AS brand_u,
      |       substr(p_type, 1, 4)                   AS type4,
      |       concat(p_brand, '/', p_type)           AS brand_type,
      |       CAST(length(p_name) AS INT)            AS name_len,
      |       split_part(p_brand, '#', 2)            AS brand_num
      |FROM part
      |WHERE p_size >= 40
      |ORDER BY p_partkey""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables
      .part(s, d)
      .filter($"p_size" >= 40)
      .select(
        $"p_partkey",
        upper($"p_brand").as("brand_u"),
        substring($"p_type", 1, 4).as("type4"),
        concat($"p_brand", lit("/"), $"p_type").as("brand_type"),
        length($"p_name").as("name_len"),
        element_at(split($"p_brand", "#"), 2).as("brand_num"))
      .orderBy($"p_partkey")
  }

  /** Date/time function surface (F5 analog): extraction + truncation. */
  val qDateFuncs = QueryDef.sql(
    "q_date_funcs",
    """SELECT CAST(year(o_orderdate) AS INT)             AS y,
      |       CAST(month(o_orderdate) AS INT)            AS m,
      |       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |       count(*)                                    AS n,
      |       round(sum(o_totalprice), 2)                 AS total
      |FROM orders
      |GROUP BY 1, 2, 3
      |ORDER BY y, m""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables
      .orders(s, d)
      .groupBy(
        year($"o_orderdate").as("y"),
        month($"o_orderdate").as("m"),
        date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd")
          .as("month_start"))
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
      .orderBy($"y", $"m")
  }

  /** Conditional expressions (P6-P8 analogs: mode-bit style CASE logic). */
  val qCaseExpr = QueryDef.sql(
    "q_case_expr",
    """SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
      |            WHEN c_acctbal < 5000 THEN 'low'
      |            ELSE 'high' END AS bal_band,
      |       count(*)             AS n,
      |       round(avg(c_acctbal), 2) AS avg_bal
      |FROM customer
      |GROUP BY bal_band
      |ORDER BY bal_band""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables
      .customer(s, d)
      .groupBy(
        when($"c_acctbal" < 0, "debt")
          .when($"c_acctbal" < 5000, "low")
          .otherwise("high")
          .as("bal_band"))
      .agg(count(lit(1)).as("n"), round(avg($"c_acctbal"), 2).as("avg_bal"))
      .orderBy($"bal_band")
  }

  /** JSON extraction from events.props (SURVEY §2.8: events table's
    * JSON-ish column). Regexp-based so Spark and DuckDB agree exactly. */
  val qJsonExtract = QueryDef.sql(
    "q_json_extract",
    """SELECT event_type,
      |       count(*) AS n,
      |       CAST(sum(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    graft.Tables
      .events(s, d)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(regexp_extract($"props", "\"k\":\\s*(\\d+)", 1).cast("long"))
          .as("sum_k"))
      .orderBy($"event_type")
  }

  /** Correlated-scalar-style query: orders above their customer's average
    * order value (decorrelated as a join against an aggregate). */
  val qHavingSub = QueryDef.sql(
    "q_above_avg_orders",
    """SELECT o_orderkey, o_custkey
      |FROM orders JOIN (
      |  SELECT o_custkey AS ck, avg(o_totalprice) AS avg_price
      |  FROM orders GROUP BY o_custkey
      |) ON o_custkey = ck
      |WHERE round(o_totalprice - 1.5 * avg_price, 6) > 0
      |ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val ord = Tables.orders(s, d)
    val avgPerCust = ord
      .groupBy($"o_custkey".as("ck"))
      .agg(avg($"o_totalprice").as("avg_price"))
    ord
      .join(avgPerCust, $"o_custkey" === $"ck")
      // rounded-margin comparison: the raw `> 1.5*avg` gates membership
      // on an unrounded float aggregate whose last ulp depends on
      // partition merge order — a boundary row could flip vs the oracle
      .filter(round($"o_totalprice" - $"avg_price" * 1.5, 6) > 0)
      .select($"o_orderkey", $"o_custkey")
      .orderBy($"o_orderkey")
  }

  /** TPC-H Q2-style min-cost selection: the supplier(s) achieving the
    * minimum account balance per nation — scalar-min decorrelated as a
    * groupBy + equality join-back. */
  val qMinCost = QueryDef.sql(
    "q_min_cost_supplier",
    """SELECT n_name, s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
      |FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN (SELECT s_nationkey AS nk, min(s_acctbal) AS min_bal
      |        FROM supplier GROUP BY s_nationkey)
      |    ON s_nationkey = nk AND s_acctbal = min_bal
      |ORDER BY n_name, s_suppkey""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val supp = Tables.supplier(s, d)
    val minPerNation = supp
      .groupBy($"s_nationkey".as("nk"))
      .agg(min($"s_acctbal").as("min_bal"))
    supp
      .join(minPerNation, $"s_nationkey" === $"nk" && $"s_acctbal" === $"min_bal")
      .join(Tables.nation(s, d), $"s_nationkey" === $"n_nationkey")
      .select($"n_name", $"s_suppkey", $"s_name", round($"s_acctbal", 2).as("acctbal"))
      .orderBy($"n_name", $"s_suppkey")
  }

  /** Windowed top-k per group: the 2 busiest users in each hour —
    * aggregation feeding a ranking window feeding a filter. */
  val qTopkPerWindow = QueryDef.sql(
    "q_topk_per_hour",
    """WITH hourly AS (
      |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
      |         user_id, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |ranked AS (
      |  SELECT hour, user_id, n,
      |         CAST(row_number() OVER (PARTITION BY hour
      |                ORDER BY n DESC, user_id) AS INT) AS rk
      |  FROM hourly)
      |SELECT hour, user_id, n, rk FROM ranked
      |WHERE rk <= 2
      |ORDER BY hour, rk""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"hour")
      .orderBy($"n".desc, $"user_id")
    graft.Tables
      .events(s, d)
      .groupBy(
        date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH").as("hour"),
        $"user_id")
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 2)
      .select($"hour", $"user_id", $"n", $"rk")
      .orderBy($"hour", $"rk")
  }

  /** Distribution window functions — percent_rank / cume_dist of each
    * event's value within its type (the empirical-CDF position an SLO
    * or scoring pipeline reads per observation). Both functions are
    * tie-stable: equal values share a rank on every engine, so no
    * tiebreak column is needed inside the window. Scale: one exchange
    * on event_type; each partition sorts independently — at 100 TB the
    * per-type partitions are what AQE splits, not a global sort. */
  val qWindowDistribution = QueryDef.sql(
    "q_window_distribution",
    """SELECT event_type, event_id,
      |       round(value, 4) AS value,
      |       round(percent_rank() OVER w, 6) AS pr,
      |       round(cume_dist()    OVER w, 6) AS cd
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY value)
      |ORDER BY event_type, event_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type")
      .orderBy($"value")
    graft.Tables
      .events(s, d)
      .select(
        $"event_type", $"event_id",
        round($"value", 4).as("value"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy($"event_type", $"event_id")
  }

  /** Market-basket association mining (Agrawal & Srikant 1994 rule
    * metrics, without the candidate-generation loop — pairwise rules
    * only): brand pairs co-purchased within an order, with support,
    * directional confidence, and lift over the ≥2%-support pairs.
    * Lift is rank-stable under the ROUNDED value convention.
    *
    * Scale: the basket relation is (order, brand) DISTINCT — the pair
    * self-join is bounded by basket size² per order (TPC-H baskets are
    * ~4 items), NOT corpus², and the brand-support/total relations are
    * aggregate-sized broadcasts. The same plan shape at 100 TB: the
    * only big exchange is the distinct + the orderkey-keyed pair join. */
  val qMarketBasket = QueryDef.sql(
    "q_market_basket",
    """WITH b AS (
      |  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      |n AS (SELECT count(DISTINCT ok) AS n_orders FROM b),
      |s AS (SELECT brand, count(*) AS nb FROM b GROUP BY 1),
      |pr AS (
      |  SELECT a.brand AS b1, c.brand AS b2, count(*) AS n12
      |  FROM b a JOIN b c ON a.ok = c.ok AND a.brand < c.brand
      |  GROUP BY 1, 2)
      |SELECT b1, b2, CAST(n12 AS BIGINT) AS n12,
      |       round(n12 * 1.0 / n.n_orders, 4) AS support,
      |       round(n12 * 1.0 / s1.nb, 4) AS confidence,
      |       round(n12 * 1.0 * n.n_orders / (s1.nb * s2.nb), 4) AS lift
      |FROM pr
      |  JOIN s s1 ON s1.brand = b1
      |  JOIN s s2 ON s2.brand = b2
      |  CROSS JOIN n
      |WHERE n12 * 1.0 / n.n_orders >= 0.02
      |ORDER BY b1, b2""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val b = Tables
      .lineitem(s, d)
      .join(graft.Tables.part(s, d),
        $"l_partkey" === $"p_partkey")
      .select($"l_orderkey".as("ok"), $"p_brand".as("brand"))
      .distinct()
    val n = b.agg(countDistinct($"ok").as("n_orders"))
    val sup = b.groupBy($"brand").agg(count(lit(1)).as("nb"))
    val pr = b.as("a")
      .join(b.as("c"), $"a.ok" === $"c.ok" && $"a.brand" < $"c.brand")
      .groupBy($"a.brand".as("b1"), $"c.brand".as("b2"))
      .agg(count(lit(1)).as("n12"))
    pr
      .join(broadcast(sup.select($"brand".as("b1"), $"nb".as("nb1"))), "b1")
      .join(broadcast(sup.select($"brand".as("b2"), $"nb".as("nb2"))), "b2")
      .crossJoin(broadcast(n))
      .filter($"n12" * lit(1.0) / $"n_orders" >= 0.02)
      .select($"b1", $"b2", $"n12".cast("long").as("n12"),
        round($"n12" * lit(1.0) / $"n_orders", 4).as("support"),
        round($"n12" * lit(1.0) / $"nb1", 4).as("confidence"),
        round($"n12" * lit(1.0) * $"n_orders" / ($"nb1" * $"nb2"), 4)
          .as("lift"))
      .orderBy($"b1", $"b2")
  }

  def defs: Seq[QueryDef] = Seq(
    q1Agg, q6Filter, q3JoinTopk, q5StarJoin, qSemiJoin, qAntiJoin,
    qOuterJoin, qWindowRank, qWindowRunning, qWindowLag, qSortLimit,
    qSetOps, qDistinct, qRollup, qCube, qStringFuncs, qDateFuncs,
    qCaseExpr, qJsonExtract, qHavingSub, qMinCost, qTopkPerWindow,
    qWindowDistribution, qMarketBasket)
}
