package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Subquery shapes and null-semantics coverage — the classic correctness
  * traps: IN / NOT IN with nullable probes (three-valued logic), scalar
  * subqueries with HAVING, null-safe equality, and struct columns.
  */
object Subqueries {

  /** TPC-H Q18-style: orders whose total lineitem quantity exceeds 300
    * (IN over a grouped HAVING subquery). */
  val qInSubquery = QueryDef.sql(
    "q_in_subquery",
    """SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
      |FROM orders
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
      |ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val big = Tables
      .lineitem(s, d)
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("q"))
      .filter($"q" > 300)
      .select($"l_orderkey")
    Tables
      .orders(s, d)
      .join(big, $"o_orderkey" === $"l_orderkey", "left_semi")
      .select($"o_orderkey", round($"o_totalprice", 2).as("totalprice"))
      .orderBy($"o_orderkey")
  }

  /** NOT IN with a NULLABLE subquery column — the three-valued-logic
    * trap: if the subquery yields any NULL, NOT IN returns no rows at
    * all. The subquery nulls out suppkey 1 via nullif, so both engines
    * must agree on the (correctly empty-ish) semantics; suppliers whose
    * key never appears still survive only because the NULL is filtered
    * in the inner query's WHERE — exercising exactly the rewrite Spark
    * does with a null-aware anti join. */
  val qNotInSubquery = QueryDef.sql(
    "q_not_in_subquery",
    """SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE s_suppkey NOT IN (
      |  SELECT nullif(l_suppkey, 1) FROM lineitem
      |  WHERE l_quantity > 49 AND nullif(l_suppkey, 1) IS NOT NULL)
      |ORDER BY s_suppkey""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val used = Tables
      .lineitem(s, d)
      .filter($"l_quantity" > 49)
      .select(nullif($"l_suppkey", lit(1)).as("k"))
      .filter($"k".isNotNull)
    Tables
      .supplier(s, d)
      .join(used, $"s_suppkey" === $"k", "left_anti")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_suppkey")
  }

  /** Null semantics: null-safe equality (<=> ≡ IS NOT DISTINCT FROM),
    * coalesce/nullif interplay, and null-grouping behavior. */
  val qNullSemantics = QueryDef.sql(
    "q_null_semantics",
    """WITH t AS (
      |  SELECT c_custkey,
      |         nullif(c_nationkey % 5, 0) AS grp,
      |         CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
      |  FROM customer)
      |SELECT coalesce(CAST(grp AS VARCHAR), 'NULL') AS grp_label,
      |       count(*)    AS n_rows,
      |       count(bal)  AS n_nonnull_bal,
      |       CAST(sum(CASE WHEN grp IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_grp,
      |       round(coalesce(sum(bal), 0), 2) AS sum_bal
      |FROM t
      |GROUP BY grp
      |ORDER BY grp_label""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables
      .customer(s, d)
      .select(
        $"c_custkey",
        nullif($"c_nationkey" % 5, lit(0)).as("grp"),
        when($"c_acctbal" < 0, lit(null)).otherwise($"c_acctbal").as("bal"))
      .groupBy($"grp")
      .agg(
        count(lit(1)).as("n_rows"),
        count($"bal").as("n_nonnull_bal"),
        sum(when($"grp" <=> lit(null), 1).otherwise(0)).cast("long").as("n_null_grp"),
        round(coalesce(sum($"bal"), lit(0.0)), 2).as("sum_bal"))
      .select(
        coalesce($"grp".cast("string"), lit("NULL")).as("grp_label"),
        $"n_rows", $"n_nonnull_bal", $"n_null_grp", $"sum_bal")
      .orderBy($"grp_label")
  }

  /** Struct (nested record) columns: build, project fields, filter on a
    * nested field — outputs flattened for oracle comparison. */
  val qStructCols = QueryDef.sql(
    "q_struct_cols",
    """WITH t AS (
      |  SELECT struct_pack(key := p_partkey, brand := p_brand,
      |                     dims := struct_pack(sz := p_size, price := p_retailprice)) AS part_rec
      |  FROM part)
      |SELECT part_rec.key   AS key,
      |       part_rec.brand AS brand,
      |       part_rec.dims.sz AS sz,
      |       round(part_rec.dims.price, 2) AS price
      |FROM t
      |WHERE part_rec.dims.sz >= 45
      |ORDER BY key""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables
      .part(s, d)
      .select(
        struct(
          $"p_partkey".as("key"),
          $"p_brand".as("brand"),
          struct($"p_size".as("sz"), $"p_retailprice".as("price")).as("dims"))
          .as("part_rec"))
      .filter($"part_rec.dims.sz" >= 45)
      .select(
        $"part_rec.key".as("key"),
        $"part_rec.brand".as("brand"),
        $"part_rec.dims.sz".as("sz"),
        round($"part_rec.dims.price", 2).as("price"))
      .orderBy($"key")
  }

  /** TPC-H Q17-style correlated aggregate: lineitems below 20% of their
    * part's average quantity (decorrelated as a join against the
    * per-part average — the standard rewrite, one shuffle per side). */
  val qCorrelatedAgg = QueryDef.sql(
    "q_correlated_agg",
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#23'
      |  AND l_quantity < (
      |    SELECT 0.2 * avg(l_quantity) FROM lineitem l2
      |    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val avgPerPart = li
      .groupBy($"l_partkey".as("pk"))
      .agg((avg($"l_quantity") * 0.2).as("qty_cap"))
    li.join(
        Tables.part(s, d).filter($"p_brand" === "Brand#23"),
        $"p_partkey" === $"l_partkey")
      .join(avgPerPart, $"l_partkey" === $"pk")
      .filter($"l_quantity" < $"qty_cap")
      .agg(round(sum($"l_extendedprice") / 7.0, 2).as("avg_yearly"))
  }

  def defs: Seq[QueryDef] =
    Seq(qInSubquery, qNotInSubquery, qNullSemantics, qStructCols,
      qCorrelatedAgg)
}
