package graft

import graft.operators.{Corpus, Curation, Extras, Relational, TextOps}
import org.apache.spark.sql.functions._

/** Laws for the audit/maintenance batch: bloom-filtered semi-join,
  * column profiler, t-closeness, incremental MV maintenance, charset
  * audit, and distribution window functions.
  */
class AuditOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bloom semijoin: no false negatives, pass superset of exact, exact is exact") {
    val r = Extras.qBloomSemijoin.fn(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].head()
    val (nProbe, nExact, nPass, nMissed, nFp, fpRate) = r
    assert(nMissed === 0L, "a Bloom filter must never miss a member")
    assert(nPass >= nExact && nPass === nExact + nFp)
    assert(nProbe === Tables.customer(spark, sf).count())
    val exact = Tables.customer(spark, sf)
      .join(
        Tables.orders(spark, sf)
          .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 450000)
          .select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_semi")
      .count()
    assert(nExact === exact)
    assert(fpRate >= 0.0 && fpRate <= 1.0)
  }

  test("column profile matches direct per-column recomputation") {
    val rows = Extras.qColumnProfile.fn(spark, sf)
      .select($"col_name", $"n_rows", $"n_nulls", $"n_distinct")
      .as[(String, Long, Long, Long)]
      .collect()
      .map(r => r._1 -> r)
      .toMap
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    assert(rows.keySet === Set("doc_id", "text", "lang", "source", "n_chars"))
    rows.values.foreach { case (_, nr, _, _) => assert(nr === n) }
    Seq("doc_id", "lang", "source").foreach { c =>
      val (_, _, nulls, dist) = rows(c)
      assert(nulls === docs.filter(col(c).isNull).count(), s"nulls($c)")
      assert(dist === docs.select(col(c)).na.drop().distinct().count(), s"distinct($c)")
    }
  }

  test("t-closeness: groups partition the corpus and distances are in [0,1]") {
    val rows = Curation.qTCloseness.fn(spark, sf)
      .select($"n", $"tvd", $"leaky")
      .as[(Long, Double, Boolean)]
      .collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._1).sum === Tables.documents(spark, sf).count())
    rows.foreach { case (_, tvd, leaky) =>
      assert(tvd >= 0.0 && tvd <= 1.0)
      assert(leaky === (tvd > 0.2))
    }
  }

  test("mv maintenance: incremental view equals recompute on every source") {
    val rows = Corpus.qMvMaintain.fn(spark, sf)
      .select($"source", $"n_docs", $"sum_chars", $"consistent")
      .as[(String, Long, Long, Boolean)]
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._4), "every source must maintain consistently")
    // cross-check one source's doc count against the derived v2 snapshot
    val docs = Tables.documents(spark, sf)
    val v2n = docs.filter($"doc_id" % 17 =!= 3).count() +
      docs.filter($"doc_id" % 19 === 6).count()
    assert(rows.map(_._2).sum === v2n)
  }

  test("charset audit: counts decompose and the fixture text is clean ASCII") {
    val rows = TextOps.qCharsetAudit.fn(spark, sf)
      .select($"n_chars_measured", $"n_ascii", $"n_ctrl", $"n_repl",
        $"ascii_share", $"clean")
      .as[(Long, Long, Long, Long, Double, Boolean)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nc, na, nctrl, nrepl, share, clean) =>
      assert(na + nctrl <= nc)
      assert(nrepl <= nc - na - nctrl + nrepl) // replacement chars are non-ascii
      assert(share >= 0.0 && share <= 1.0)
      if (clean) assert(nctrl === 0L && nrepl === 0L && share >= 0.95)
    }
    // crafted rows exercise every counter class
    val crafted = Seq(
      (1L, "plain ascii text"),
      (2L, "tab\tand\nnewline ok"),
      (3L, "bad\u0003ctrl"),
      (4L, "repl � char"),
      (5L, "café au lait"))
      .toDF("doc_id", "text")
    import org.apache.spark.sql.Row
    val c = crafted
      .select(
        $"doc_id",
        (length($"text") -
          length(regexp_replace($"text", "[\\x09\\x0A\\x0D\\x20-\\x7E]", "")))
          .cast("long").as("n_ascii"),
        length(regexp_replace($"text",
          "[^\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")).cast("long")
          .as("n_ctrl"),
        (length($"text") - length(regexp_replace($"text", "�", "")))
          .cast("long").as("n_repl"))
      .orderBy($"doc_id")
      .collect()
    assert(c(0) === Row(1L, 16L, 0L, 0L))
    assert(c(1) === Row(2L, 18L, 0L, 0L)) // tab/newline count as ascii
    assert(c(2) === Row(3L, 7L, 1L, 0L)) // the \u0003 is a control char
    assert(c(3) === Row(4L, 10L, 0L, 1L))
    assert(c(4) === Row(5L, 11L, 0L, 0L)) // é is non-ascii, not ctrl/repl
  }

  test("distribution window: pr/cd laws per event type") {
    val rows = Relational.qWindowDistribution.fn(spark, sf)
      .select($"event_type", $"pr", $"cd")
      .as[(String, Double, Double)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, pr, cd) =>
      assert(pr >= 0.0 && pr <= 1.0)
      assert(cd > 0.0 && cd <= 1.0)
    }
    rows.groupBy(_._1).foreach { case (t, rs) =>
      assert(rs.map(_._2).min === 0.0, s"min percent_rank in $t")
      assert(rs.map(_._3).max === 1.0, s"max cume_dist in $t")
    }
  }
}
