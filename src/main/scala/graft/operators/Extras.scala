package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
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

  /** Approximate distinct count via the KMV (k-minimum-values) sketch
    * (graft.plans.KmvAgg): keep the 256 smallest distinct 60-bit hashes,
    * estimate n = (k-1) * 2^60 / h_k. Unlike HLL (whose register layout
    * is engine-private — Spark's approx_count_distinct stays spec-gated
    * in ExtrasSpec) the KMV estimate is a pure function of the hash set,
    * so DuckDB reproduces it bit-for-bit from the same md5-derived
    * hashes. Scale shape: partial buffers carry at most k longs per
    * group regardless of row count — versus count(DISTINCT) shuffling
    * every distinct value. */
  val qApproxDistinct = QueryDef.sql(
    "q_approx_distinct",
    """WITH h AS (
      |  SELECT DISTINCT l_returnflag,
      |         CAST(concat('0x',
      |                substr(md5('kmv|' || CAST(l_partkey AS VARCHAR)), 1, 15))
      |              AS BIGINT) AS h
      |  FROM lineitem),
      |s AS (
      |  SELECT l_returnflag, count(*) AS n_h,
      |         (list(h ORDER BY h))[256] AS kth
      |  FROM h GROUP BY 1),
      |e AS (
      |  SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts
      |  FROM lineitem GROUP BY 1)
      |SELECT e.l_returnflag,
      |       CAST(e.exact_parts AS BIGINT) AS exact_parts,
      |       CAST(CASE WHEN s.n_h < 256 THEN s.n_h
      |                 ELSE floor(255.0 * (1152921504606846976.0
      |                                     / CAST(s.kth AS DOUBLE)))
      |            END AS BIGINT) AS kmv_parts
      |FROM e JOIN s USING (l_returnflag)
      |ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables
      .lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("exact_parts"),
        graft.plans.KmvAgg
          .kmvDistinct(
            graft.functions.TextFunctions.stableHash60(
              concat(lit("kmv|"), $"l_partkey".cast("string"))),
            256)
          .as("kmv_parts"))
      .orderBy($"l_returnflag")
  }

  /** HyperLogLog distinct estimate (Flajolet et al. 2007) beside
    * [[qApproxDistinct]]'s KMV: m = 256 registers from the 60-bit stable
    * hash (bucket = h mod 256, register value = leading-zero rank of the
    * remaining 52 bits), harmonic-mean raw estimate
    * α·m²/Σ2^(−M_j) with the standard small-range linear-counting
    * correction (E ≤ 2.5m and empty registers present → m·ln(m/V)).
    * The per-group register table is 256 longs regardless of input size
    * — the shuffle carries ≤ groups·256 rows where count(DISTINCT)
    * shuffles every distinct value.
    *
    * The 2^(−M) terms are dyadic with a narrow exponent span, so the
    * sum is exact in double under ANY addition order — the estimate is
    * bit-identical across engines and partitionings. */
  val qHllDistinct = QueryDef.sql(
    "q_hll_distinct",
    """WITH h AS (
      |  SELECT l_returnflag,
      |         CAST(concat('0x',
      |                substr(md5('hll|' || CAST(l_partkey AS VARCHAR)), 1, 15))
      |              AS BIGINT) AS h
      |  FROM lineitem),
      |reg AS (
      |  SELECT l_returnflag, h % 256 AS b,
      |         max(CASE WHEN h // 256 = 0 THEN 53
      |                  ELSE 53 - length(bin(h // 256)) END) AS m
      |  FROM h GROUP BY 1, 2),
      |s AS (
      |  SELECT l_returnflag,
      |         count(*) AS n_filled,
      |         256 - count(*) AS v,
      |         (256 - count(*)) * 1.0 + sum(power(2.0, -m)) AS ssum
      |  FROM reg GROUP BY 1),
      |e AS (
      |  SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts
      |  FROM lineitem GROUP BY 1),
      |est AS (
      |  SELECT e.l_returnflag, e.exact_parts, s.n_filled, s.v,
      |         CASE WHEN (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 / s.ssum
      |                   <= 640.0 AND s.v > 0
      |              THEN 256.0 * ln(256.0 / s.v)
      |              ELSE (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 / s.ssum
      |         END AS raw
      |  FROM e JOIN s USING (l_returnflag))
      |SELECT l_returnflag,
      |       CAST(exact_parts AS BIGINT) AS exact_parts,
      |       CAST(n_filled AS BIGINT) AS n_filled,
      |       round(raw, 2) AS hll_est,
      |       round(abs(raw - exact_parts) / exact_parts, 4) AS rel_err
      |FROM est ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import graft.functions.TextFunctions.stableHash60
    val h = Tables
      .lineitem(s, d)
      .select($"l_returnflag",
        stableHash60(concat(lit("hll|"), $"l_partkey".cast("string"))).as("h"))
    val reg = h
      .groupBy($"l_returnflag", ($"h" % 256).as("b"))
      .agg(max(when(expr("h div 256") === 0, 53)
        .otherwise(lit(53) - length(bin(expr("h div 256"))))).as("m"))
    val st = reg
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_filled"),
        (lit(256) - count(lit(1))).as("v"),
        ((lit(256) - count(lit(1))) * 1.0 +
          sum(pow(lit(2.0), -$"m"))).as("ssum"))
    val alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    val rawE = lit(alpha) * 65536.0 / $"ssum"
    val est = when(rawE <= 640.0 && $"v" > 0,
      lit(256.0) * log(lit(256.0) / $"v")).otherwise(rawE)
    Tables
      .lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("exact_parts"))
      .join(st, "l_returnflag")
      .select($"l_returnflag",
        $"exact_parts".cast("long").as("exact_parts"),
        $"n_filled".cast("long").as("n_filled"),
        round(est, 2).as("hll_est"),
        round(abs(est - $"exact_parts") / $"exact_parts", 4).as("rel_err"))
      .orderBy($"l_returnflag")
  }

  /** Benford first-digit audit (Benford 1938, Hill 1995) over order
    * totals — the fraud/synthetic-data screen a warehouse runs on any
    * naturally-multiplicative numeric column: observed leading-digit
    * shares vs the log10(1 + 1/d) law, with each digit's χ² contribution.
    * The digit is taken from the CENTS integer (round(x·100)) so no
    * float log10 sits on a power-of-ten boundary.
    *
    * Scale: the digit extraction fuses into the scan; the aggregate is
    * 9 groups — one count-shuffle of ≤ 9·partitions rows. */
  val qBenford = QueryDef.sql(
    "q_benford",
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
      |                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
      |  FROM orders WHERE o_totalprice > 0),
      |c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
      |t AS (SELECT sum(n) AS tot FROM c)
      |SELECT c.digit, CAST(c.n AS BIGINT) AS n,
      |       round(c.n * 1.0 / t.tot, 4) AS share,
      |       round(log10(1.0 + 1.0 / c.digit), 4) AS benford,
      |       round(c.n * 1.0 / t.tot - log10(1.0 + 1.0 / c.digit), 4)
      |         + 0.0 AS diff,
      |       round(power(c.n * 1.0 / t.tot - log10(1.0 + 1.0 / c.digit), 2)
      |             / log10(1.0 + 1.0 / c.digit) * t.tot, 4) AS chi2_term
      |FROM c CROSS JOIN t ORDER BY digit""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val digits = Tables
      .orders(s, d)
      .filter($"o_totalprice" > 0)
      .select(substring(round($"o_totalprice" * 100, 0).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy($"digit")
      .agg(count(lit(1)).as("n"))
    val tot = digits.agg(sum($"n").as("tot"))
    val share = $"n" * lit(1.0) / $"tot"
    val law = log10(lit(1.0) + lit(1.0) / $"digit")
    digits
      .crossJoin(broadcast(tot))
      .select($"digit", $"n".cast("long").as("n"),
        round(share, 4).as("share"),
        round(law, 4).as("benford"),
        (round(share - law, 4) + 0.0).as("diff"),
        round(pow(share - law, 2) / law * $"tot", 4).as("chi2_term"))
      .orderBy($"digit")
  }

  /** Poisson bootstrap confidence interval (Chamandy et al. 2012,
    * "Estimating uncertainty for massive data streams" — Google's
    * distributed bootstrap): each of B = 32 resamples draws every row
    * with an independent Poisson(1) multiplicity, DERIVED FROM A HASH
    * (inverse-CDF thresholds on a per-(row, resample) uniform), so
    * resampling is a pure scan-side computation — no sampling state, no
    * shuffle of the data, and bit-identical replay on both engines. The
    * 95% CI on the mean order total is the 2.5/97.5 interpolated
    * percentile of the 32 resample means.
    *
    * Scale: the explode is a constant B× blow-up feeding a partial
    * aggregate — the shuffle carries B rows per partition, the classic
    * way to bootstrap a 100 TB table without ever materializing a
    * resample. */
  val qPoissonBootstrap = QueryDef.sql(
    "q_poisson_bootstrap",
    """WITH draws AS (
      |  SELECT b, o_totalprice,
      |         CAST(concat('0x', substr(md5('pb|' || CAST(b AS VARCHAR)
      |                || '|' || CAST(o_orderkey AS VARCHAR)), 1, 15))
      |              AS BIGINT) % 1000000000 / 1000000000.0 AS u
      |  FROM orders CROSS JOIN
      |       (SELECT unnest(generate_series(0, 31)) AS b)),
      |mult AS (
      |  SELECT b, o_totalprice,
      |         CASE WHEN u < 0.36787944117144233 THEN 0
      |              WHEN u < 0.7357588823428847 THEN 1
      |              WHEN u < 0.9196986029286058 THEN 2
      |              WHEN u < 0.9810118431238462 THEN 3
      |              WHEN u < 0.9963401531726563 THEN 4
      |              WHEN u < 0.9994058151824183 THEN 5
      |              ELSE 6 END AS k
      |  FROM draws),
      |means AS (
      |  SELECT b, sum(k * o_totalprice) / sum(k) AS m
      |  FROM mult GROUP BY b),
      |full_mean AS (SELECT avg(o_totalprice) AS mu FROM orders)
      |SELECT CAST(count(*) AS BIGINT) AS n_resamples,
      |       round(any_value(full_mean.mu), 4) AS mean,
      |       round(avg(m), 4) AS boot_mean,
      |       round(quantile_cont(m, 0.025), 4) AS ci_lo,
      |       round(quantile_cont(m, 0.975), 4) AS ci_hi
      |FROM means CROSS JOIN full_mean""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import graft.functions.TextFunctions.stableHash60
    val draws = Tables
      .orders(s, d)
      .select($"o_orderkey", $"o_totalprice",
        explode(sequence(lit(0), lit(31))).as("b"))
      .select($"b", $"o_totalprice",
        (pmod(stableHash60(concat(lit("pb|"), $"b".cast("string"),
          lit("|"), $"o_orderkey".cast("string"))),
          lit(1000000000L)) / 1000000000.0).as("u"))
    val k = when($"u" < 0.36787944117144233, 0)
      .when($"u" < 0.7357588823428847, 1)
      .when($"u" < 0.9196986029286058, 2)
      .when($"u" < 0.9810118431238462, 3)
      .when($"u" < 0.9963401531726563, 4)
      .when($"u" < 0.9994058151824183, 5)
      .otherwise(6)
    val means = draws
      .select($"b", $"o_totalprice", k.as("k"))
      .groupBy($"b")
      .agg((sum($"k" * $"o_totalprice") / sum($"k")).as("m"))
    val full = Tables.orders(s, d).agg(avg($"o_totalprice").as("mu"))
    means
      .crossJoin(broadcast(full))
      .agg(count(lit(1)).cast("long").as("n_resamples"),
        round(first($"mu"), 4).as("mean"),
        round(avg($"m"), 4).as("boot_mean"),
        round(expr("percentile(m, 0.025)"), 4).as("ci_lo"),
        round(expr("percentile(m, 0.975)"), 4).as("ci_hi"))
  }

  /** Split-conformal prediction interval (Papadopoulos et al. 2002;
    * Lei et al. 2018): hash-split lineitem into train (50%) /
    * calibration (25%) / test (25%), fit price ~ quantity by OLS
    * sufficient statistics on train, take q̂ = the 90th percentile of
    * calibration |residuals|, and report the realized test coverage of
    * ŷ ± q̂ — the distribution-free ML-serving guarantee (coverage ≈
    * 90% regardless of the model's quality). Boundary comparisons use
    * 6-decimal-rounded values on both engines.
    *
    * Scale: the split is a scan-fused hash predicate; the fit is one
    * moment aggregate; q̂ is one percentile over the calibration
    * quarter; coverage is one conditional count. */
  val qConformal = QueryDef.sql(
    "q_conformal_interval",
    """WITH li AS (
      |  SELECT l_quantity AS x, l_extendedprice AS y,
      |         CAST(concat('0x', substr(md5('cf|' || CAST(l_orderkey AS VARCHAR)
      |                || '|' || CAST(l_linenumber AS VARCHAR)), 1, 15))
      |              AS BIGINT) % 4 AS fold
      |  FROM lineitem),
      |fit AS (
      |  SELECT covar_pop(x, y) / var_pop(x) AS b1,
      |         avg(y) - covar_pop(x, y) / var_pop(x) * avg(x) AS b0,
      |         count(*) AS n_train
      |  FROM li WHERE fold <= 1),
      |cal AS (
      |  SELECT quantile_cont(abs(li.y - (fit.b0 + fit.b1 * li.x)), 0.9)
      |           AS qhat,
      |         count(*) AS n_cal
      |  FROM li CROSS JOIN fit WHERE li.fold = 2),
      |test AS (
      |  SELECT count(*) AS n_test,
      |         sum(CASE WHEN round(abs(li.y - (fit.b0 + fit.b1 * li.x)), 6)
      |                       <= round(cal.qhat, 6)
      |                  THEN 1 ELSE 0 END) AS covered
      |  FROM li CROSS JOIN fit CROSS JOIN cal WHERE li.fold = 3)
      |SELECT CAST(fit.n_train AS BIGINT) AS n_train,
      |       CAST(cal.n_cal AS BIGINT) AS n_cal,
      |       CAST(test.n_test AS BIGINT) AS n_test,
      |       round(fit.b0, 4) + 0.0 AS beta0, round(fit.b1, 4) + 0.0 AS beta1,
      |       round(cal.qhat, 4) AS qhat,
      |       round(test.covered * 1.0 / test.n_test, 4) AS coverage
      |FROM fit CROSS JOIN cal CROSS JOIN test""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import graft.functions.TextFunctions.stableHash60
    val li = Tables.lineitem(s, d)
      .select($"l_quantity".as("x"), $"l_extendedprice".as("y"),
        pmod(stableHash60(concat(lit("cf|"), $"l_orderkey".cast("string"),
          lit("|"), $"l_linenumber".cast("string"))), lit(4L)).as("fold"))
    val fit = li.filter($"fold" <= 1).agg(
      (covar_pop($"x", $"y") / var_pop($"x")).as("b1"),
      (avg($"y") - covar_pop($"x", $"y") / var_pop($"x") * avg($"x"))
        .as("b0"),
      count(lit(1)).as("n_train"))
    val cal = li.filter($"fold" === 2)
      .crossJoin(broadcast(fit))
      .agg(expr("percentile(abs(y - (b0 + b1 * x)), 0.9)").as("qhat"),
        count(lit(1)).as("n_cal"))
    val test = li.filter($"fold" === 3)
      .crossJoin(broadcast(fit))
      .crossJoin(broadcast(cal))
      .agg(count(lit(1)).as("n_test"),
        sum(when(round(abs($"y" - ($"b0" + $"b1" * $"x")), 6)
          <= round($"qhat", 6), 1).otherwise(0)).as("covered"))
    fit.crossJoin(broadcast(cal)).crossJoin(broadcast(test))
      .select($"n_train".cast("long").as("n_train"),
        $"n_cal".cast("long").as("n_cal"),
        $"n_test".cast("long").as("n_test"),
        (round($"b0", 4) + 0.0).as("beta0"), (round($"b1", 4) + 0.0).as("beta1"),
        round($"qhat", 4).as("qhat"),
        round($"covered" * lit(1.0) / $"n_test", 4).as("coverage"))
  }

  /** Spearman rank correlation of line quantity vs extended price —
    * Pearson over tie-averaged ranks, with the ranks computed by the
    * DISTRIBUTED two-phase recipe (no global window): per distinct
    * value, cum-below = intra-bucket running count under a value-bucket
    * partition + triangular broadcast offsets over the per-bucket
    * totals (the gauge/KS pattern), then avg-rank = cum_below +
    * (ties+1)/2 joined back to the rows. Reported beside Pearson —
    * divergence flags a monotone-but-nonlinear relation.
    *
    * Scale: two distinct-value aggregates (quantity's is ~50 rows and
    * broadcasts; price's shuffles once on the value), one corpus join
    * per column, one moment aggregate. */
  val qSpearman = QueryDef.sql(
    "q_spearman",
    """WITH li AS (
      |  SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem),
      |xd AS (
      |  SELECT x, count(*) AS m FROM li GROUP BY x),
      |xr AS (
      |  SELECT x,
      |         sum(m) OVER (ORDER BY x
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           - m + (m + 1) / 2.0 AS rx
      |  FROM xd),
      |yd AS (
      |  SELECT y, count(*) AS m FROM li GROUP BY y),
      |yr AS (
      |  SELECT y,
      |         sum(m) OVER (ORDER BY y
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           - m + (m + 1) / 2.0 AS ry
      |  FROM yd)
      |SELECT CAST(count(*) AS BIGINT) AS n,
      |       round(corr(xr.rx, yr.ry), 4) + 0.0 AS spearman,
      |       round(corr(li.x, li.y), 4) + 0.0 AS pearson
      |FROM li JOIN xr ON xr.x = li.x JOIN yr ON yr.y = li.y""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val li = Tables.lineitem(s, d)
      .select($"l_quantity".as("x"), $"l_extendedprice".as("y"))
    // two-phase tie-averaged ranks for a value column: intra-bucket
    // running count + triangular offsets over bucket totals — the same
    // no-global-window shape as the gauge and the KS ECDF
    def avgRanks(vals: org.apache.spark.sql.DataFrame, vc: String,
        rc: String, bucket: org.apache.spark.sql.Column) = {
      val dist = vals.groupBy(col(vc)).agg(count(lit(1)).as("m"))
        .withColumn("bk", bucket)
      val wIntra = Window.partitionBy($"bk").orderBy(col(vc))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val btot = dist.groupBy($"bk").agg(sum($"m").as("t"))
      val prior = btot.select($"bk".as("pbk"), $"t".as("pt"))
      val off = btot
        .join(broadcast(prior), $"pbk" < $"bk", "left")
        .groupBy($"bk")
        .agg(coalesce(sum($"pt"), lit(0L)).as("off"))
      dist
        .withColumn("cum", sum($"m").over(wIntra))
        .join(broadcast(off), "bk")
        .select(col(vc),
          ($"off" + $"cum" - $"m" + ($"m" + 1) / lit(2.0)).as(rc))
    }
    val xr = avgRanks(li.select($"x"), "x", "rx", $"x".cast("long"))
    val yr = avgRanks(li.select($"y"), "y", "ry",
      floor($"y" / 1000.0).cast("long"))
    li
      .join(broadcast(xr), "x")
      .join(yr, "y")
      .agg(count(lit(1)).cast("long").as("n"),
        (round(corr($"rx", $"ry"), 4) + 0.0).as("spearman"),
        (round(corr($"x", $"y"), 4) + 0.0).as("pearson"))
  }

  /** Join-cardinality estimation audit — the optimizer-style estimate a
    * planner makes BEFORE running a join, checked against the truth:
    * both sides' key histograms are hashed into 256 buckets, the
    * estimate is Σ_b c₁(b)·c₂(b) (exact when buckets are single keys;
    * inflated by hash collisions otherwise — the inflation ratio is the
    * audit), beside the exact per-key identity Σ_k c₁(k)·c₂(k) which
    * must equal the true join count. The read that tells a pipeline
    * whether a planned join will explode before any shuffle is paid.
    *
    * Scale: both histograms are count aggregates (256-row and
    * keys-sized); the bucketed estimate joins 256×256 broadcast rows;
    * the per-key identity joins the two key histograms — aggregate-
    * sized relative to the fact tables, and no row of the actual join
    * output is ever materialized. */
  val qJoinSizeEst = QueryDef.sql(
    "q_join_size_est",
    """WITH b1 AS (
      |  SELECT CAST(concat('0x', substr(md5('js|' || CAST(o_orderkey AS VARCHAR)),
      |              1, 15)) AS BIGINT) % 256 AS b, count(*) AS c
      |  FROM orders GROUP BY 1),
      |b2 AS (
      |  SELECT CAST(concat('0x', substr(md5('js|' || CAST(l_orderkey AS VARCHAR)),
      |              1, 15)) AS BIGINT) % 256 AS b, count(*) AS c
      |  FROM lineitem GROUP BY 1),
      |k1 AS (SELECT o_orderkey AS k, count(*) AS c FROM orders GROUP BY 1),
      |k2 AS (SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
      |est AS (SELECT sum(b1.c * b2.c) AS e FROM b1 JOIN b2 USING (b)),
      |ex AS (SELECT sum(k1.c * k2.c) AS x FROM k1 JOIN k2 USING (k)),
      |tru AS (SELECT count(*) AS t FROM orders
      |        JOIN lineitem ON l_orderkey = o_orderkey)
      |SELECT CAST(est.e AS BIGINT) AS est_bucketed,
      |       CAST(ex.x AS BIGINT) AS est_per_key,
      |       CAST(tru.t AS BIGINT) AS exact_rows,
      |       round(est.e * 1.0 / tru.t, 4) AS inflation
      |FROM est CROSS JOIN ex CROSS JOIN tru""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import graft.functions.TextFunctions.stableHash60
    def bucketHist(df: org.apache.spark.sql.DataFrame, key: String) =
      df.select(pmod(stableHash60(
        concat(lit("js|"), col(key).cast("string"))), lit(256L)).as("b"))
        .groupBy($"b").agg(count(lit(1)).as("c"))
    val b1 = bucketHist(Tables.orders(s, d), "o_orderkey")
    val b2 = bucketHist(Tables.lineitem(s, d), "l_orderkey")
    val k1 = Tables.orders(s, d).groupBy($"o_orderkey".as("k"))
      .agg(count(lit(1)).as("c1"))
    val k2 = Tables.lineitem(s, d).groupBy($"l_orderkey".as("k"))
      .agg(count(lit(1)).as("c2"))
    val est = b1.join(broadcast(b2.select($"b", $"c".as("c2"))), "b")
      .agg(sum($"c" * $"c2").as("e"))
    val ex = k1.join(k2, "k").agg(sum($"c1" * $"c2").as("x"))
    val tru = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), $"l_orderkey" === $"o_orderkey")
      .agg(count(lit(1)).as("t"))
    est.crossJoin(broadcast(ex)).crossJoin(broadcast(tru))
      .select($"e".cast("long").as("est_bucketed"),
        $"x".cast("long").as("est_per_key"),
        $"t".cast("long").as("exact_rows"),
        round($"e" * lit(1.0) / $"t", 4).as("inflation"))
  }

  /** Winsorized robust statistics (Dixon & Tukey 1968) per order
    * priority: clamp each total into its group's [p05, p95] band
    * (broadcast interpolated percentiles) and report the winsorized
    * mean/stddev beside the raw ones plus the clamp census — the
    * outlier-robust summary a metrics pipeline publishes when raw
    * means are whipped around by a few huge orders.
    *
    * Scale: one percentile aggregate per group (broadcast \|groups\|×2
    * doubles), then one clamped moment pass — no sort, no window. */
  val qWinsorized = QueryDef.sql(
    "q_winsorized",
    """WITH cuts AS (
      |  SELECT o_orderpriority AS pri,
      |         quantile_cont(o_totalprice, 0.05) AS lo,
      |         quantile_cont(o_totalprice, 0.95) AS hi
      |  FROM orders GROUP BY 1),
      |w AS (
      |  SELECT o.o_orderpriority AS pri, o.o_totalprice AS v,
      |         least(greatest(o.o_totalprice, c.lo), c.hi) AS wv
      |  FROM orders o JOIN cuts c ON c.pri = o.o_orderpriority)
      |SELECT pri,
      |       CAST(count(*) AS BIGINT) AS n,
      |       round(avg(v), 2) AS mean_raw,
      |       round(avg(wv), 2) AS mean_wins,
      |       round(stddev_pop(v), 2) AS sd_raw,
      |       round(stddev_pop(wv), 2) AS sd_wins,
      |       CAST(sum(CASE WHEN wv <> v THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_clamped
      |FROM w GROUP BY pri ORDER BY pri""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val cuts = Tables.orders(s, d)
      .groupBy($"o_orderpriority".as("pri"))
      .agg(expr("percentile(o_totalprice, 0.05)").as("lo"),
        expr("percentile(o_totalprice, 0.95)").as("hi"))
    val w = Tables.orders(s, d)
      .join(broadcast(cuts), $"pri" === $"o_orderpriority")
      .select($"pri", $"o_totalprice".as("v"),
        least(greatest($"o_totalprice", $"lo"), $"hi").as("wv"))
    w.groupBy($"pri")
      .agg(count(lit(1)).cast("long").as("n"),
        round(avg($"v"), 2).as("mean_raw"),
        round(avg($"wv"), 2).as("mean_wins"),
        round(stddev_pop($"v"), 2).as("sd_raw"),
        round(stddev_pop($"wv"), 2).as("sd_wins"),
        sum(when($"wv" =!= $"v", 1L).otherwise(0L)).cast("long")
          .as("n_clamped"))
      .orderBy($"pri")
  }

  /** Sample-ratio-mismatch gate (Fabijan et al. 2019, "Diagnosing
    * sample ratio mismatch in online controlled experiments") — the #1
    * trust check before reading ANY A/B result: the same deterministic
    * hash assignment [[graft.operators.Events]]' A/B test uses, arm
    * counts χ²-tested against the designed 50/50 split; a triggered
    * gate means the assignment or logging pipeline is broken and the
    * experiment is void. χ² > 3.841 (α = 0.05, 1 dof) triggers.
    *
    * Scale: one count aggregate over the scan-fused assignment hash. */
  val qSrmCheck = QueryDef.sql(
    "q_srm_check",
    """WITH a AS (
      |  SELECT CAST(concat('0x', substr(md5('ab|' || CAST(user_id AS VARCHAR)),
      |              1, 15)) AS BIGINT) % 2 AS arm
      |  FROM (SELECT DISTINCT user_id FROM events)),
      |c AS (SELECT arm, count(*) AS n FROM a GROUP BY arm),
      |t AS (SELECT sum(n) AS tot FROM c)
      |SELECT CAST(sum(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n_control,
      |       CAST(sum(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_treat,
      |       round(sum(power(n - t.tot / 2.0, 2) / (t.tot / 2.0)), 4)
      |         AS chi2,
      |       (round(sum(power(n - t.tot / 2.0, 2) / (t.tot / 2.0)), 4)
      |        > 3.841) AS srm_triggered
      |FROM c CROSS JOIN t""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import graft.functions.TextFunctions.stableHash60
    val arms = Tables.events(s, d)
      .select($"user_id").distinct()
      .select(pmod(stableHash60(
        concat(lit("ab|"), $"user_id".cast("string"))), lit(2L)).as("arm"))
      .groupBy($"arm").agg(count(lit(1)).as("n"))
    val tot = arms.agg(sum($"n").as("tot"))
    val chi2 = round(sum(pow($"n" - $"tot" / 2.0, 2) / ($"tot" / 2.0)), 4)
    arms
      .crossJoin(broadcast(tot))
      .agg(
        sum(when($"arm" === 0, $"n")).cast("long").as("n_control"),
        sum(when($"arm" === 1, $"n")).cast("long").as("n_treat"),
        chi2.as("chi2"),
        (chi2 > 3.841).as("srm_triggered"))
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

  /** Explicit GROUPING SETS (beyond rollup/cube): three chosen grouping
    * combinations in one pass with grouping() flags distinguishing
    * aggregation levels. Same single-shuffle Expand-based plan as
    * rollup — each input row fans out to its grouping sets BEFORE the
    * exchange, partial aggregation intact. */
  val qGroupingSets = QueryDef.sql(
    "q_grouping_sets",
    """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
      |       coalesce(o_orderstatus, 'ALL')   AS status,
      |       CAST(grouping(o_orderpriority) AS INT) AS g_pri,
      |       CAST(grouping(o_orderstatus) AS INT)   AS g_st,
      |       round(sum(o_totalprice), 2)      AS sum_price,
      |       count(*)                         AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority),
      |                        (o_orderpriority, o_orderstatus), ())
      |ORDER BY priority, status, g_pri, g_st""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables
      .orders(s, d)
      .groupingSets(
        Seq(Seq($"o_orderpriority"), Seq($"o_orderpriority", $"o_orderstatus"),
          Seq()),
        $"o_orderpriority", $"o_orderstatus")
      .agg(
        // grouping() resolves only inside the grouping-sets aggregate
        grouping($"o_orderpriority").cast("int").as("g_pri"),
        grouping($"o_orderstatus").cast("int").as("g_st"),
        round(sum($"o_totalprice"), 2).as("sum_price"),
        count(lit(1)).as("n"))
      .select(
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        $"g_pri", $"g_st", $"sum_price", $"n")
      .orderBy($"priority", $"status", $"g_pri", $"g_st")
  }

  /** Time-RANGE window frame: per-user moving 5-minute sum/count over
    * event time. The frame bound is numeric epoch-µs on BOTH sides (the
    * precision Spark and the ns-parquet-reading oracle share); RANGE
    * includes timestamp peers, so equal-ts rows agree deterministically
    * without a tie-break column. */
  val qWindowRangeFrame = QueryDef.sql(
    "q_window_range_frame",
    """SELECT user_id, epoch_us(ts) AS ts_us, event_id,
      |       round(sum(value) OVER w, 2) AS mv_sum_5m,
      |       CAST(count(*) OVER w AS BIGINT) AS mv_n_5m
      |FROM events
      |WHERE user_id < 20
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, ts_us, event_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // epoch-µs comes from the loader's ts_ns (works for LTZ and NTZ
    // source files alike); unix_micros would reject a TIMESTAMP_NTZ ts
    val w = Window
      .partitionBy($"user_id")
      .orderBy(expr("ts_ns div 1000"))
      .rangeBetween(-300000000L, 0L)
    Tables
      .events(s, d)
      .filter($"user_id" < 20)
      .select(
        $"user_id",
        expr("ts_ns div 1000").as("ts_us"),
        $"event_id",
        round(sum($"value").over(w), 2).as("mv_sum_5m"),
        count(lit(1)).over(w).as("mv_n_5m"))
      .orderBy($"user_id", $"ts_us", $"event_id")
  }

  /** Map-typed column functions (the xattr-map shape from SURVEY §1.2):
    * construction, key listing, point extraction, cardinality. */
  val qMapFuncs = QueryDef.sql(
    "q_map_funcs",
    """SELECT doc_id,
      |       list_aggregate(map_keys(m), 'string_agg', ',') AS keys,
      |       map_extract(m, 'lang')[1]   AS lang_v,
      |       map_extract(m, 'source')[1] AS source_v,
      |       CAST(cardinality(m) AS INT) AS n_entries
      |FROM (SELECT doc_id, map(['lang', 'source'], [lang, source]) AS m
      |      FROM documents WHERE doc_id < 100)
      |ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables
      .documents(s, d)
      .filter($"doc_id" < 100)
      .select($"doc_id",
        map(lit("lang"), $"lang", lit("source"), $"source").as("m"))
      .select(
        $"doc_id",
        array_join(map_keys($"m"), ",").as("keys"),
        element_at($"m", "lang").as("lang_v"),
        element_at($"m", "source").as("source_v"),
        size($"m").as("n_entries"))
      .orderBy($"doc_id")
  }

  /** Count-min sketch heavy hitters: 4 hash rows × 1024 buckets of plain
    * counters estimate any token's frequency as min over rows of its
    * bucket's count. The 100 TB property: the counter table is FIXED
    * SIZE (d×W groups) no matter the vocabulary, so the sketch shuffle
    * carries ≤4096 rows while an exact wordcount shuffles the full token
    * cardinality — and the counters are mergeable across any partitioning
    * (they're just sums). The query measures the sketch against the
    * exact top-20 (overcount ≥ 0 by construction, CMS never
    * underestimates); everything is integer arithmetic on the md5-derived
    * stable hash, so the oracle reproduces it bit-for-bit. */
  val qTokenCms = QueryDef.sql(
    "q_token_cms",
    """WITH tok AS (
      |  SELECT unnest(string_split_regex(trim(text), ' +')) AS token
      |  FROM documents),
      |cnt AS (SELECT token, count(*) AS true_cnt FROM tok GROUP BY token),
      |top AS (
      |  SELECT token, true_cnt FROM cnt
      |  ORDER BY true_cnt DESC, token LIMIT 20),
      |js AS (SELECT unnest([0, 1, 2, 3]) AS j),
      |counters AS (
      |  SELECT j,
      |         CAST(concat('0x', substr(md5('cms' || j || '|' || token), 1, 15))
      |              AS BIGINT) % 1024 AS bucket,
      |         count(*) AS c
      |  FROM tok CROSS JOIN js
      |  GROUP BY 1, 2),
      |probe AS (
      |  SELECT token, true_cnt, j,
      |         CAST(concat('0x', substr(md5('cms' || j || '|' || token), 1, 15))
      |              AS BIGINT) % 1024 AS bucket
      |  FROM top CROSS JOIN js)
      |SELECT p.token,
      |       CAST(p.true_cnt AS BIGINT) AS true_cnt,
      |       CAST(min(co.c) AS BIGINT) AS cms_est,
      |       CAST(min(co.c) - p.true_cnt AS BIGINT) AS overcount
      |FROM probe p JOIN counters co ON co.j = p.j AND co.bucket = p.bucket
      |GROUP BY p.token, p.true_cnt
      |ORDER BY true_cnt DESC, token""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import graft.functions.TextFunctions.{stableHash60, words}
    def bucketOf(j: Int, tok: org.apache.spark.sql.Column) =
      pmod(stableHash60(concat(lit(s"cms$j|"), tok)), lit(1024L))
    val tok = Tables
      .documents(s, d)
      .select(explode(words($"text")).as("token"))
    val cnt = tok.groupBy($"token").agg(count(lit(1)).as("true_cnt"))
    val top = cnt.orderBy($"true_cnt".desc, $"token").limit(20)
    // one pass over the token stream feeds all 4 rows; the aggregate's
    // key space is d×W, so the shuffle is bounded by the sketch size
    val counters = tok
      .select(posexplode(
        array((0 until 4).map(j => bucketOf(j, $"token")): _*))
        .as(Seq("j", "bucket")))
      .groupBy($"j", $"bucket")
      .agg(count(lit(1)).as("c"))
    // probes hash only the 20 tracked tokens (broadcast-sized)
    val probe = top.select(
      $"token", $"true_cnt",
      posexplode(array((0 until 4).map(j => bucketOf(j, $"token")): _*))
        .as(Seq("j", "bucket")))
    probe
      .join(counters, Seq("j", "bucket"))
      .groupBy($"token", $"true_cnt")
      .agg(min($"c").as("cms_est"))
      .select($"token", $"true_cnt", $"cms_est",
        ($"cms_est" - $"true_cnt").as("overcount"))
      .orderBy($"true_cnt".desc, $"token")
  }

  /** Bloom-filter shingle membership, per source: a 16384-bit / 2-hash
    * bloom over each source's distinct training 3-gram shingles, probed
    * with the held-out benchmark slice's shingles, and measured against
    * exact membership (false positives among truly-absent probes — a
    * bloom never false-negatives, which the oracle verifies implicitly:
    * n_maybe ≥ n_present per source).
    *
    * The 100 TB property: the filter is FIXED SIZE (512 32-bit words per
    * source) no matter how many shingles a source has, the words are
    * mergeable across any partitioning (bit_or of sums-of-bits), and a
    * membership pre-screen (e.g. decontamination) probes the broadcast
    * bloom instead of joining the corpus-sized exact shingle set. All
    * integer bit arithmetic on the md5-derived stable hash, so DuckDB
    * reproduces every word bit-for-bit; 32-bit words keep every shift
    * result positive in both engines' signed BIGINTs. The two 14-bit
    * positions come from DISJOINT strides of the 60-bit hash (bits 0-13
    * and 14-27) — a 13-bit stride would share bit 13 between the
    * "independent" hashes and quietly worsen the real FP rate. */
  val qShingleBloom = QueryDef.sql(
    "q_shingle_bloom",
    """WITH t AS (
      |  SELECT doc_id, source, string_split_regex(trim(text), ' +') AS w
      |  FROM documents),
      |ds AS (
      |  SELECT DISTINCT doc_id, source,
      |         unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |                 for i in range(1, len(w)-1)]) AS s
      |  FROM t WHERE len(w) >= 3),
      |train AS (SELECT DISTINCT source, s FROM ds WHERE doc_id % 50 <> 0),
      |probes AS (SELECT DISTINCT s FROM ds WHERE doc_id % 50 = 0),
      |ks AS (SELECT unnest([0, 1]) AS i),
      |tbits AS (
      |  SELECT source,
      |         ((CAST(concat('0x', substr(md5('bf|' || s), 1, 15)) AS BIGINT)
      |           >> (14 * i)) & 16383) AS p
      |  FROM train CROSS JOIN ks),
      |bloom AS (
      |  SELECT source, p >> 5 AS widx,
      |         bit_or(1::BIGINT << CAST(p & 31 AS INT)) AS word
      |  FROM tbits GROUP BY 1, 2),
      |pbits AS (
      |  SELECT s,
      |         ((CAST(concat('0x', substr(md5('bf|' || s), 1, 15)) AS BIGINT)
      |           >> (14 * i)) & 16383) AS p
      |  FROM probes CROSS JOIN ks),
      |hit AS (
      |  SELECT pb.s, src.source,
      |         min(CASE WHEN (bl.word &
      |                        (1::BIGINT << CAST(pb.p & 31 AS INT))) <> 0
      |                  THEN 1 ELSE 0 END) AS maybe
      |  FROM pbits pb
      |  CROSS JOIN (SELECT DISTINCT source FROM train) src
      |  LEFT JOIN bloom bl ON bl.source = src.source AND bl.widx = pb.p >> 5
      |  GROUP BY 1, 2),
      |exact AS (SELECT source, s, 1 AS present FROM train),
      |j AS (
      |  SELECT h.source, h.maybe, coalesce(e.present, 0) AS present
      |  FROM hit h LEFT JOIN exact e ON h.source = e.source AND h.s = e.s)
      |SELECT source,
      |       CAST(count(*) AS BIGINT) AS n_probes,
      |       CAST(sum(maybe) AS BIGINT) AS n_maybe,
      |       CAST(sum(present) AS BIGINT) AS n_present,
      |       CAST(sum(CASE WHEN maybe = 1 AND present = 0 THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_fp,
      |       CASE WHEN count(*) - sum(present) > 0 THEN
      |         floor(sum(CASE WHEN maybe = 1 AND present = 0
      |                        THEN 1 ELSE 0 END) * 10000.0 /
      |               (count(*) - sum(present)) + 0.5) / 10000.0
      |       END AS fp_rate
      |FROM j GROUP BY source ORDER BY source""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import graft.functions.TextFunctions.{shingles, stableHash60, words}
    def positions(c: org.apache.spark.sql.Column) =
      array((0 until 2).map(i =>
        shiftright(stableHash60(concat(lit("bf|"), c)), 14 * i)
          .bitwiseAND(16383L)): _*)
    // shift amount is a per-row column, so the SQL form of shiftleft is
    // required (the Scala signature only takes a literal Int)
    val maskOf = expr("shiftleft(CAST(1 AS BIGINT), CAST(p & 31 AS INT))")
    val ds = Tables
      .documents(s, d)
      .select($"doc_id", $"source", words($"text").as("w"))
      .select($"doc_id", $"source",
        explode(array_distinct(shingles($"w", 3))).as("s"))
    val train = ds.filter($"doc_id" % 50 =!= 0).select($"source", $"s").distinct()
    val probes = ds.filter($"doc_id" % 50 === 0).select($"s").distinct()
    val bloom = train
      .select($"source", explode(positions($"s")).as("p"))
      .groupBy($"source", shiftright($"p", 5).as("widx"))
      .agg(bit_or(maskOf).as("word"))
    // srcs/bloom both descend from `train` — rename columns apart so the
    // probe-side join isn't an ambiguous self-join lineage
    val srcs = train.select($"source".as("psource")).distinct()
    val bloomR = bloom.withColumnRenamed("source", "bsource")
    val hit = probes
      .select($"s", explode(positions($"s")).as("p"))
      .crossJoin(broadcast(srcs))
      .join(bloomR,
        $"bsource" === $"psource" && $"widx" === shiftright($"p", 5),
        "left")
      .select($"psource".as("source"), $"s",
        when($"word".isNotNull && ($"word".bitwiseAND(maskOf) =!= 0), 1)
          .otherwise(0).as("bit"))
      .groupBy($"source", $"s")
      .agg(min($"bit").as("maybe"))
    val exact = train.withColumn("present", lit(1))
    val den = count(lit(1)) - sum($"present")
    val fp = sum(when($"maybe" === 1 && $"present" === 0, 1).otherwise(0))
    hit
      .join(exact, Seq("source", "s"), "left")
      .na.fill(0, Seq("present"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_probes"),
        sum($"maybe").as("n_maybe"),
        sum($"present").as("n_present"),
        fp.as("n_fp"),
        when(den > 0, floor(fp * lit(10000.0) / den + 0.5) / 10000.0)
          .as("fp_rate"))
      .orderBy($"source")
  }

  /** Order-independent table fingerprint: per source, the XOR-fold of
    * each row's stableHash60 content digest plus row count and id
    * bounds. XOR is commutative/associative with no overflow, so the
    * digest is identical under ANY partitioning or row order — the
    * replica/migration check that verifies a 100 TB copy without
    * sorting or shuffling anything but 8-byte partials (a row-wise
    * diff ships the table twice; this ships one long per partition).
    * Companion to `q_corpus_diff` (which localizes differences once
    * this cheap gate says they exist). */
  val qTableFingerprint = QueryDef.sql(
    "q_table_fingerprint",
    """SELECT source,
      |       count(*) AS n_rows,
      |       CAST(min(doc_id) AS BIGINT) AS min_id,
      |       CAST(max(doc_id) AS BIGINT) AS max_id,
      |       bit_xor(CAST(concat('0x',
      |                 substr(md5(doc_id || '|' || lang || '|' || text),
      |                        1, 15)) AS BIGINT)) AS content_xor
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables
      .documents(s, d)
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_rows"),
        min($"doc_id").as("min_id"),
        max($"doc_id").as("max_id"),
        bit_xor(graft.functions.TextFunctions.stableHash60(
          concat($"doc_id".cast("string"), lit("|"), $"lang",
            lit("|"), $"text"))).as("content_xor"))
      .orderBy($"source")
  }

  /** SCD type-2 dimension build + point-in-time join (Kimball's slowly
    * changing dimension, the warehouse pattern behind "what was this
    * user's attribute WHEN the fact happened"): each user's `signup`
    * events form the change log of an attribute (its value column);
    * lead() closes each version's validity interval, and every
    * `purchase` fact joins the version whose [from, to) interval covers
    * its timestamp. Facts before the first version get no match (left
    * join, version columns null) — the honest early-fact semantics.
    *
    * Scale: interval construction is one lag-free window per user;
    * the PIT join is an equi-join on user plus interval predicates —
    * at 100 TB both sides hash-partition on the user key and versions
    * per user are few, so the join never degenerates. (The native
    * [[graft.plans.AsofJoinPlan]] is the merge-join alternative when
    * the dimension is version-dense.) */
  val qScd2Pit = QueryDef.sql(
    "q_scd2_pit",
    """WITH dim AS (
      |  SELECT user_id, value AS attr,
      |         epoch_ns(ts) AS vfrom,
      |         lead(epoch_ns(ts)) OVER (PARTITION BY user_id
      |                                  ORDER BY epoch_ns(ts), event_id)
      |           AS vto,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY epoch_ns(ts), event_id) AS ver
      |  FROM events WHERE event_type = 'signup'),
      |facts AS (
      |  SELECT event_id, user_id, epoch_ns(ts) AS fts
      |  FROM events WHERE event_type = 'purchase')
      |SELECT f.event_id, f.user_id,
      |       CAST(d.ver AS INT) AS attr_version,
      |       round(d.attr, 2) AS attr_value
      |FROM facts f
      |LEFT JOIN dim d
      |  ON d.user_id = f.user_id
      | AND f.fts >= d.vfrom AND (d.vto IS NULL OR f.fts < d.vto)
      |ORDER BY f.event_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    val w = Window.partitionBy($"user_id").orderBy($"ts_ns", $"event_id")
    val dim = ev
      .filter($"event_type" === "signup")
      .select($"user_id".as("d_user"), $"value".as("attr"),
        $"ts_ns".as("vfrom"),
        lead($"ts_ns", 1).over(
          Window.partitionBy($"user_id").orderBy($"ts_ns", $"event_id"))
          .as("vto"),
        row_number().over(w).cast("int").as("ver"))
    ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_ns".as("fts"))
      .join(dim,
        $"user_id" === $"d_user" && $"fts" >= $"vfrom" &&
          ($"vto".isNull || $"fts" < $"vto"),
        "left")
      .select($"event_id", $"user_id", $"ver".as("attr_version"),
        round($"attr", 2).as("attr_value"))
      .orderBy($"event_id")
  }

  /** One-pass column profiler (the Deequ/Glue-crawler-style table audit a
    * warehouse runs before trusting a new 100 TB drop): for every column
    * of `documents` — row count, nulls, exact distinct cardinality,
    * completeness, and min/max rendered as strings. The whole profile is
    * ONE aggregate over one scan (the five exact-distinct measures share
    * it via the standard Expand rewrite); the long-format unpivot then
    * runs on the single result row, so output is O(#columns) regardless
    * of corpus size. */
  val qColumnProfile = QueryDef.sql(
    "q_column_profile",
    """WITH a AS (
      |  SELECT count(*) AS n,
      |         count(doc_id) AS c1, count(DISTINCT doc_id) AS d1,
      |         CAST(min(doc_id) AS VARCHAR) AS mi1, CAST(max(doc_id) AS VARCHAR) AS ma1,
      |         count(text) AS c2, count(DISTINCT text) AS d2,
      |         CAST(min(text) AS VARCHAR) AS mi2, CAST(max(text) AS VARCHAR) AS ma2,
      |         count(lang) AS c3, count(DISTINCT lang) AS d3,
      |         CAST(min(lang) AS VARCHAR) AS mi3, CAST(max(lang) AS VARCHAR) AS ma3,
      |         count(source) AS c4, count(DISTINCT source) AS d4,
      |         CAST(min(source) AS VARCHAR) AS mi4, CAST(max(source) AS VARCHAR) AS ma4,
      |         count(n_chars) AS c5, count(DISTINCT n_chars) AS d5,
      |         CAST(min(n_chars) AS VARCHAR) AS mi5, CAST(max(n_chars) AS VARCHAR) AS ma5
      |  FROM documents)
      |SELECT col_name, n AS n_rows, n - c AS n_nulls, d AS n_distinct,
      |       round(c * 1.0 / n, 4) AS completeness, mi AS min_v, ma AS max_v
      |FROM (
      |  SELECT 'doc_id' AS col_name, n, c1 AS c, d1 AS d, mi1 AS mi, ma1 AS ma FROM a
      |  UNION ALL SELECT 'lang', n, c3, d3, mi3, ma3 FROM a
      |  UNION ALL SELECT 'n_chars', n, c5, d5, mi5, ma5 FROM a
      |  UNION ALL SELECT 'source', n, c4, d4, mi4, ma4 FROM a
      |  UNION ALL SELECT 'text', n, c2, d2, mi2, ma2 FROM a)
      |ORDER BY col_name""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val aggs = count(lit(1)).cast("long").as("n") +:
      cols.flatMap(c => Seq(
        count(col(c)).cast("long").as(s"c_$c"),
        countDistinct(col(c)).cast("long").as(s"d_$c"),
        min(col(c)).cast("string").as(s"mi_$c"),
        max(col(c)).cast("string").as(s"ma_$c")))
    val stackArgs = cols
      .map(c => s"'$c', c_$c, d_$c, mi_$c, ma_$c")
      .mkString(", ")
    Tables
      .documents(s, d)
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr("n",
        s"stack(${cols.size}, $stackArgs) AS (col_name, c, d, mi, ma)")
      .select(
        $"col_name", $"n".as("n_rows"),
        ($"n" - $"c").as("n_nulls"), $"d".as("n_distinct"),
        round($"c" * lit(1.0) / $"n", 4).as("completeness"),
        $"mi".as("min_v"), $"ma".as("max_v"))
      .orderBy($"col_name")
  }

  /** Bloom-filtered semi-join — the runtime-filter pattern hand-built
    * and AUDITED: the build side (customers holding an urgent
    * >450k-price order) is condensed into a 16384-bit / k=2 Bloom
    * filter (a ≤512-word relation, ~2 KiB broadcast), the probe side is
    * screened scan-side by bit tests, and only Bloom survivors would
    * reach the exact verify join. The query emits the audit a planner
    * wants before trusting the filter: probe population, exact members,
    * Bloom pass count, false positives, misses (pinned 0 — Blooms never
    * false-negative), and the realized FP rate against the theoretical
    * (1−e^(−kn/m))^k ≈ 0.1%.
    *
    * Scale (100 TB): this is semi-join pruning without shuffling the
    * probe side — the filter words are an aggregate over the (already
    * filtered, distinct) build keys, the probe scan tests 2 bits per
    * row against the broadcast, and the expensive exact join runs on
    * the surviving sliver only. The same shape Spark's own runtime
    * row-group filtering uses, here as an explicit, measurable plan. */
  val qBloomSemijoin = QueryDef.sql(
    "q_bloom_semijoin",
    """WITH ck AS (
      |  SELECT DISTINCT o_custkey AS k FROM orders
      |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 450000),
      |pos AS (
      |  SELECT ((CAST(concat('0x', substr(md5('bfsj|' || CAST(k AS VARCHAR)), 1, 15))
      |            AS BIGINT) >> (14 * i)) & 16383) AS p
      |  FROM ck CROSS JOIN (SELECT unnest([0, 1]) AS i)),
      |bloom AS (
      |  SELECT p >> 5 AS widx,
      |         bit_or(1::BIGINT << CAST(p & 31 AS INT)) AS word
      |  FROM pos GROUP BY 1),
      |probe AS (
      |  SELECT c_custkey,
      |         (h & 16383) AS p0, ((h >> 14) & 16383) AS p1
      |  FROM (SELECT c_custkey,
      |               CAST(concat('0x', substr(md5('bfsj|' || CAST(c_custkey AS VARCHAR)), 1, 15))
      |                 AS BIGINT) AS h
      |        FROM customer)),
      |flags AS (
      |  SELECT pr.c_custkey,
      |         (coalesce(b0.word & (1::BIGINT << CAST(pr.p0 & 31 AS INT)), 0) <> 0
      |          AND coalesce(b1.word & (1::BIGINT << CAST(pr.p1 & 31 AS INT)), 0) <> 0)
      |           AS maybe,
      |         EXISTS (SELECT 1 FROM ck WHERE ck.k = pr.c_custkey) AS ex
      |  FROM probe pr
      |  LEFT JOIN bloom b0 ON b0.widx = pr.p0 >> 5
      |  LEFT JOIN bloom b1 ON b1.widx = pr.p1 >> 5)
      |SELECT CAST(count(*) AS BIGINT) AS n_probe,
      |       CAST(sum(CASE WHEN ex THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
      |       CAST(sum(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
      |       CAST(sum(CASE WHEN ex AND NOT maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_missed,
      |       CAST(sum(CASE WHEN maybe AND NOT ex THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
      |       round(sum(CASE WHEN maybe AND NOT ex THEN 1 ELSE 0 END) * 1.0 /
      |             greatest(count(*) - sum(CASE WHEN ex THEN 1 ELSE 0 END), 1), 4)
      |         AS fp_rate
      |FROM flags""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import graft.functions.TextFunctions.stableHash60
    val ck = Tables.orders(s, d)
      .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 450000)
      .select($"o_custkey".as("k"))
      .distinct()
    val h = stableHash60(concat(lit("bfsj|"), $"k".cast("string")))
    // positions i=0,1: (h >> 14i) & 16383
    val posn = ck
      .select(h.as("h"))
      .select(explode(array($"h".bitwiseAND(16383),
        expr("(h >> 14) & 16383"))).as("p"))
    val words = posn
      .groupBy(expr("p >> 5").as("widx"))
      .agg(expr("bit_or(shiftleft(1L, cast(p & 31 as int)))").as("word"))
    val hp = stableHash60(concat(lit("bfsj|"), $"c_custkey".cast("string")))
    val probe = Tables.customer(s, d)
      .select($"c_custkey", hp.as("h"))
      .select($"c_custkey",
        $"h".bitwiseAND(16383).as("p0"),
        expr("(h >> 14) & 16383").as("p1"))
    val b0 = words.select($"widx".as("w0"), $"word".as("word0"))
    val b1 = words.select($"widx".as("w1"), $"word".as("word1"))
    val exact = ck.select($"k".as("ex_k"))
    val flags = probe
      .join(broadcast(b0), expr("w0 = (p0 >> 5)"), "left")
      .join(broadcast(b1), expr("w1 = (p1 >> 5)"), "left")
      .join(broadcast(exact), $"ex_k" === $"c_custkey", "left")
      .select(
        (coalesce(expr("word0 & shiftleft(1L, cast(p0 & 31 as int))"),
          lit(0L)) =!= 0L &&
          coalesce(expr("word1 & shiftleft(1L, cast(p1 & 31 as int))"),
            lit(0L)) =!= 0L).as("maybe"),
        $"ex_k".isNotNull.as("ex"))
    flags.agg(
      count(lit(1)).as("n_probe"),
      sum(when($"ex", 1L).otherwise(0L)).as("n_exact"),
      sum(when($"maybe", 1L).otherwise(0L)).as("n_bloom_pass"),
      sum(when($"ex" && !$"maybe", 1L).otherwise(0L)).as("n_missed"),
      sum(when($"maybe" && !$"ex", 1L).otherwise(0L)).as("n_false_pos"))
      .select(
        $"n_probe", $"n_exact", $"n_bloom_pass", $"n_missed",
        $"n_false_pos",
        round($"n_false_pos" * lit(1.0) /
          greatest($"n_probe" - $"n_exact", lit(1L)), 4).as("fp_rate"))
  }

  /** 2-D skyline / Pareto frontier (Börzsönyi et al. 2001, "The Skyline
    * Operator"): the parts no other part dominates (cheaper-or-equal
    * price AND larger-or-equal size, strict in one). In 2-D the skyline
    * reduces to ONE ordered pass: group to per-price max size, then a
    * price group survives iff its max size strictly beats the running
    * max over all strictly cheaper groups; rows survive iff they carry
    * their group's max. Equal (price, size) twins are mutually
    * non-dominating and all kept.
    *
    * Scale (100 TB): the naive NOT EXISTS dominance check is an O(n²)
    * nested loop; this form is one aggregate to the distinct-price
    * relation plus a running MAX computed with the `q_events_gauge`
    * two-phase shape (price-band partitions + broadcast cross-band
    * offsets — max is associative, so band offsets compose exactly like
    * the prefix sums), then a join-back on (price, size). Nothing
    * single-partitions. */
  val qParetoFrontier = QueryDef.sql(
    "q_pareto_frontier",
    """WITH g AS (
      |  SELECT p_retailprice AS price, max(p_size) AS gmax
      |  FROM part GROUP BY 1),
      |r AS (
      |  SELECT price, gmax,
      |         max(gmax) OVER (ORDER BY price
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runprev
      |  FROM g),
      |k AS (SELECT price, gmax FROM r
      |      WHERE runprev IS NULL OR gmax > runprev)
      |SELECT p.p_partkey,
      |       round(p.p_retailprice, 2) AS price,
      |       CAST(p.p_size AS BIGINT) AS size
      |FROM part p
      |JOIN k ON p.p_retailprice = k.price AND p.p_size = k.gmax
      |ORDER BY p.p_partkey""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val part = Tables.part(s, d)
    val g = part
      .groupBy($"p_retailprice".as("price"))
      .agg(max($"p_size").as("gmax"))
      .withColumn("band", floor($"price" / 100).cast("long"))
    // intra-band running max over STRICTLY cheaper prices (per-price
    // groups make the ordering tie-free)
    val intraW = Window
      .partitionBy($"band")
      .orderBy($"price")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bandTot = g.groupBy($"band").agg(max($"gmax").as("bmax"))
    val prior = bandTot.select($"band".as("pband"), $"bmax".as("pmax"))
    val offsets = bandTot
      .join(broadcast(prior), $"pband" < $"band", "left")
      .groupBy($"band")
      .agg(max($"pmax").as("off")) // null when no cheaper band exists
    val keepers = g
      .withColumn("intra", max($"gmax").over(intraW))
      .join(broadcast(offsets), "band")
      .withColumn("runprev", greatest(coalesce($"intra", lit(Int.MinValue)),
        coalesce($"off", lit(Int.MinValue))))
      .filter($"gmax" > $"runprev")
      .select($"price", $"gmax")
    part
      .join(broadcast(keepers),
        $"p_retailprice" === $"price" && $"p_size" === $"gmax")
      .select($"p_partkey",
        round($"p_retailprice", 2).as("price"),
        $"p_size".cast("long").as("size"))
      .orderBy($"p_partkey")
  }

  /** Two-feature OLS by SUFFICIENT STATISTICS — line revenue
    * (extendedprice·(1−discount)) regressed on (extendedprice, discount)
    * with intercept: the ten normal-equation moments (n, Σx₁, Σx₂, Σy,
    * Σx₁², Σx₂², Σx₁x₂, Σx₁y, Σx₂y, Σy²) come from ONE aggregate over
    * one scan (the same mergeable-moment shape as
    * [[graft.plans.CovarianceAgg]]), and the 3×3 solve is Cramer's rule
    * written as plain column arithmetic — no iterative solver, no driver
    * data pull, no ML runtime. The features are near-orthogonal
    * (price ⟂ discount in the fixture), so the normal equations are
    * well-conditioned and both engines' determinant trees agree far
    * inside the rounding. Output: coefficients, R², n.
    *
    * Scale: model-fitting cost == one map-side-combinable aggregate;
    * at 100 TB the ten moments still fit in a closure. */
  val qOlsFit = QueryDef.sql(
    "q_ols_fit",
    """WITH f AS (
      |  SELECT l_extendedprice * (1 - l_discount) AS y,
      |         l_extendedprice AS x1,
      |         l_discount AS x2
      |  FROM lineitem),
      |m AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n,
      |         sum(x1) AS sx1, sum(x2) AS sx2, sum(y) AS sy,
      |         sum(x1 * x1) AS sx11, sum(x2 * x2) AS sx22,
      |         sum(x1 * x2) AS sx12, sum(x1 * y) AS sx1y,
      |         sum(x2 * y) AS sx2y, sum(y * y) AS syy
      |  FROM f),
      |s AS (
      |  SELECT *,
      |         n * (sx11 * sx22 - sx12 * sx12)
      |         - sx1 * (sx1 * sx22 - sx12 * sx2)
      |         + sx2 * (sx1 * sx12 - sx11 * sx2) AS det
      |  FROM m),
      |b AS (
      |  SELECT n, sy, sx1y, sx2y, syy,
      |         (sy  * (sx11 * sx22 - sx12 * sx12)
      |          - sx1 * (sx1y * sx22 - sx12 * sx2y)
      |          + sx2 * (sx1y * sx12 - sx11 * sx2y)) / det AS b0,
      |         (n   * (sx1y * sx22 - sx12 * sx2y)
      |          - sy * (sx1 * sx22 - sx12 * sx2)
      |          + sx2 * (sx1 * sx2y - sx1y * sx2)) / det AS b1,
      |         (n   * (sx11 * sx2y - sx1y * sx12)
      |          - sx1 * (sx1 * sx2y - sx1y * sx2)
      |          + sy * (sx1 * sx12 - sx11 * sx2)) / det AS b2
      |  FROM s)
      |SELECT round(b0, 6) + 0.0 AS b0, round(b1, 6) + 0.0 AS b1,
      |       round(b2, 6) + 0.0 AS b2,
      |       round(1 - (syy - b0 * sy - b1 * sx1y - b2 * sx2y)
      |                 / (syy - sy * sy / n), 6) + 0.0 AS r2,
      |       CAST(n AS BIGINT) AS n
      |FROM b""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val f = Tables.lineitem(s, d)
      .select(
        ($"l_extendedprice" * (lit(1) - $"l_discount")).as("y"),
        $"l_extendedprice".as("x1"),
        $"l_discount".as("x2"))
    val m = f.agg(
      count(lit(1)).cast("double").as("n"),
      sum($"x1").as("sx1"), sum($"x2").as("sx2"), sum($"y").as("sy"),
      sum($"x1" * $"x1").as("sx11"), sum($"x2" * $"x2").as("sx22"),
      sum($"x1" * $"x2").as("sx12"), sum($"x1" * $"y").as("sx1y"),
      sum($"x2" * $"y").as("sx2y"), sum($"y" * $"y").as("syy"))
    val withDet = m.withColumn("det",
      $"n" * ($"sx11" * $"sx22" - $"sx12" * $"sx12")
        - $"sx1" * ($"sx1" * $"sx22" - $"sx12" * $"sx2")
        + $"sx2" * ($"sx1" * $"sx12" - $"sx11" * $"sx2"))
    val b = withDet.select(
      $"n", $"sy", $"sx1y", $"sx2y", $"syy",
      (($"sy" * ($"sx11" * $"sx22" - $"sx12" * $"sx12")
        - $"sx1" * ($"sx1y" * $"sx22" - $"sx12" * $"sx2y")
        + $"sx2" * ($"sx1y" * $"sx12" - $"sx11" * $"sx2y")) / $"det").as("b0"),
      (($"n" * ($"sx1y" * $"sx22" - $"sx12" * $"sx2y")
        - $"sy" * ($"sx1" * $"sx22" - $"sx12" * $"sx2")
        + $"sx2" * ($"sx1" * $"sx2y" - $"sx1y" * $"sx2")) / $"det").as("b1"),
      (($"n" * ($"sx11" * $"sx2y" - $"sx1y" * $"sx12")
        - $"sx1" * ($"sx1" * $"sx2y" - $"sx1y" * $"sx2")
        + $"sy" * ($"sx1" * $"sx12" - $"sx11" * $"sx2")) / $"det").as("b2"))
    b.select(
      (round($"b0", 6) + 0.0).as("b0"), (round($"b1", 6) + 0.0).as("b1"),
      (round($"b2", 6) + 0.0).as("b2"),
      (round(lit(1) - ($"syy" - $"b0" * $"sy" - $"b1" * $"sx1y"
        - $"b2" * $"sx2y") / ($"syy" - $"sy" * $"sy" / $"n"), 6) + 0.0).as("r2"),
      $"n".cast("long").as("n"))
  }

  /** χ² independence audit of lang × source (Pearson) — the corpus-
    * balance check before stratified splits trust the two labels as
    * independent dimensions: observed cell counts vs the
    * rowTotal·colTotal/n expectation over the COMPLETE label grid
    * (zero cells contribute their full expectation), plus Cramér's V
    * effect size. One count-shuffle to O(langs·sources) cells; totals
    * broadcast. */
  val qChiSquare = QueryDef.sql(
    "q_chi_square",
    """WITH o AS (SELECT lang, source, CAST(count(*) AS DOUBLE) AS obs
      |           FROM documents GROUP BY 1, 2),
      |rt AS (SELECT lang, sum(obs) AS rtot FROM o GROUP BY 1),
      |ct AS (SELECT source, sum(obs) AS ctot FROM o GROUP BY 1),
      |n AS (SELECT sum(obs) AS n FROM o),
      |grid AS (
      |  SELECT rt.lang, ct.source, rt.rtot, ct.ctot,
      |         coalesce(o.obs, 0) AS obs,
      |         rt.rtot * ct.ctot / (SELECT n FROM n) AS exp
      |  FROM rt CROSS JOIN ct
      |  LEFT JOIN o ON o.lang = rt.lang AND o.source = ct.source)
      |SELECT round(sum((obs - exp) * (obs - exp) / exp), 4) AS chi2,
      |       CAST((count(DISTINCT lang) - 1)
      |            * (count(DISTINCT source) - 1) AS BIGINT) AS dof,
      |       round(sqrt(sum((obs - exp) * (obs - exp) / exp)
      |                  / ((SELECT n FROM n)
      |                     * least(count(DISTINCT lang) - 1,
      |                             count(DISTINCT source) - 1))), 4)
      |         AS cramers_v,
      |       CAST((SELECT n FROM n) AS BIGINT) AS n
      |FROM grid""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val o = Tables.documents(s, d)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).cast("double").as("obs"))
    val rt = o.groupBy($"lang").agg(sum($"obs").as("rtot"))
    val ct = o.groupBy($"source").agg(sum($"obs").as("ctot"))
    val n = o.agg(sum($"obs").as("n"))
    val grid = rt
      .crossJoin(broadcast(ct))
      .join(o, Seq("lang", "source"), "left")
      .crossJoin(broadcast(n))
      .select($"lang", $"source",
        coalesce($"obs", lit(0.0)).as("obs"),
        ($"rtot" * $"ctot" / $"n").as("exp"),
        $"n")
    grid.agg(
      round(sum(($"obs" - $"exp") * ($"obs" - $"exp") / $"exp"), 4)
        .as("chi2"),
      ((countDistinct($"lang") - 1) * (countDistinct($"source") - 1))
        .cast("long").as("dof"),
      round(sqrt(sum(($"obs" - $"exp") * ($"obs" - $"exp") / $"exp") /
        (first($"n") * least(countDistinct($"lang") - 1,
          countDistinct($"source") - 1))), 4).as("cramers_v"),
      first($"n").cast("long").as("n"))
  }

  def defs: Seq[QueryDef] =
    Seq(qSetOpsAll, qArrayAgg, qArgMax, qApproxDistinct, qSaltedHistogram,
      qPivot, qWindowNtile, qGroupingSets, qWindowRangeFrame, qMapFuncs,
      qTokenCms, qShingleBloom, qTableFingerprint, qScd2Pit, qColumnProfile,
      qBloomSemijoin, qParetoFrontier, qOlsFit, qChiSquare, qHllDistinct,
      qBenford, qPoissonBootstrap, qConformal, qSpearman, qJoinSizeEst,
      qWinsorized, qSrmCheck)
}
