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

  test("bm25 retrieval matches a plain-Scala scorer") {
    val top = TextOps.qBm25Retrieval.fn(spark, sf)
      .select($"doc_id", $"n_terms", $"bm25", $"rank")
      .as[(Long, Long, Double, Int)]
      .collect()
    assert(top.length === 10)
    assert(top.map(_._4).toSeq === (1 to 10))
    // rank order follows (rounded score desc, doc_id)
    top.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 > b._3 || (a._3 == b._3 && a._1 < b._1))
    }
    // third engine: score every doc in plain Scala, same formula
    val terms = Seq("hash", "join", "stream")
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) => id -> t.trim.split(" +").toSeq }
    val n = toks.length.toDouble
    val avgdl = toks.map(_._2.length).sum / n
    val dfm = terms.map(t => t -> toks.count(_._2.contains(t)).toDouble).toMap
    val scored = toks.flatMap { case (id, ws) =>
      val s = terms.map { t =>
        val tf = ws.count(_ == t).toDouble
        if (tf == 0) 0.0
        else math.log(1 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5)) * tf * 2.2 /
          (tf + 1.2 * (0.25 + 0.75 * ws.length / avgdl))
      }.sum
      if (s > 0) Some(id -> (math.rint(s * 1e4) / 1e4)) else None
    }
    val want = scored.sortBy { case (id, s) => (-s, id) }.take(10)
    assert(top.map(r => (r._1, r._3)).toSeq === want.toSeq)
  }

  test("seasonal profile: full grid, day census, and count conservation") {
    val rows = graft.operators.Events.qSeasonalProfile.fn(spark, sf)
      .select($"event_type", $"hod", $"n_days", $"mean_n", $"n_anomalous")
      .as[(String, Long, Long, Double, Long)]
      .collect()
    val ev = Tables.events(spark, sf)
    val nDays = ev.select(date_trunc("day", $"ts")).distinct().count()
    val types = ev.select($"event_type").distinct().as[String].collect().toSet
    assert(rows.map(_._1).toSet === types)
    rows.groupBy(_._1).foreach { case (t, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (0L until 24L), s"hods of $t")
      rs.foreach { r => assert(r._3 === nDays); assert(r._5 <= r._3) }
      // zeros-completed grid conserves the event count: Σ mean·days = n(type)
      val total = rs.map(r => r._4 * r._3).sum
      val nt = ev.filter($"event_type" === t).count().toDouble
      assert(math.abs(total - nt) < 0.1, s"conservation for $t: $total vs $nt")
    }
  }

  test("interval concurrency matches a plain-Scala sweep line") {
    val rows = graft.operators.Temporal.qIntervalConcurrency.fn(spark, sf)
      .select($"month", $"peak_open", $"n_starts", $"n_ends")
      .as[(String, Long, Long, Long)]
      .collect()
    assert(rows.nonEmpty)
    // starts and ends balance over the whole series
    assert(rows.map(_._3).sum === rows.map(_._4).sum)
    // third engine: brute-force sweep over the collected intervals
    val oe = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderkey", $"o_orderdate")
      .agg(max($"l_shipdate").as("en"))
      .select(
        // NTZ-safe epoch seconds: NTZ→timestamp is exact under the UTC session tz
        $"o_orderdate".cast("timestamp").cast("long").as("st"),
        $"en".cast("timestamp").cast("long").as("en"))
      .as[(Long, Long)].collect()
    assert(rows.map(_._3).sum === oe.length)
    val sweep = (oe.map(i => (i._1, 1)) ++ oe.map(i => (i._2, -1)))
      .sortBy(e => (e._1, e._2))
    var lvl = 0L
    val peaks = collection.mutable.Map[String, Long]()
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM")
      .withZone(java.time.ZoneOffset.UTC)
    sweep.foreach { case (ts, d) =>
      lvl += d
      val mon = fmt.format(java.time.Instant.ofEpochSecond(ts))
      peaks(mon) = math.max(peaks.getOrElse(mon, Long.MinValue), lvl)
    }
    assert(lvl === 0L)
    rows.foreach { case (mon, peak, _, _) =>
      assert(peaks(mon) === peak, s"peak for $mon")
    }
  }

  test("triangle count matches brute force over the strong-edge graph") {
    val rows = graft.operators.GraphOps.qTriangleCount.fn(spark, sf)
      .select($"nation", $"strong_degree", $"n_triangles", $"clustering")
      .as[(String, Long, Long, Double)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, deg, tri, cc) =>
      assert(cc >= 0.0 && cc <= 1.0)
      // a node's triangles are bounded by its pairs of strong neighbors
      assert(tri <= deg * (deg - 1) / 2)
    }
    // recompute the undirected strong graph + triangles in plain Scala
    val e = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .join(Tables.supplier(spark, sf), $"l_suppkey" === $"s_suppkey")
      .groupBy($"c_nationkey".as("src"), $"s_nationkey".as("dst"))
      .agg(count(lit(1)).as("w"))
      .as[(Long, Long, Long)].collect()
    val mw = e.map(_._3).sum.toDouble / e.length
    val und = e.filter(x => x._3 > mw && x._1 != x._2)
      .map(x => (math.min(x._1, x._2), math.max(x._1, x._2))).toSet
    val nodes = und.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val triOf = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      a <- nodes; b <- nodes if a < b && und((a, b))
      c <- nodes if b < c && und((b, c)) && und((a, c))
    } { triOf(a) += 1; triOf(b) += 1; triOf(c) += 1 }
    val nationName = Tables.nation(spark, sf)
      .select($"n_nationkey", $"n_name").as[(Long, String)].collect().toMap
    val want = nodes.map(n => nationName(n) ->
      (und.count(p => p._1 == n || p._2 == n).toLong, triOf(n))).toMap
    rows.foreach { case (nat, deg, tri, _) =>
      assert(want(nat) === ((deg, tri)), s"node $nat")
    }
    assert(rows.length === want.size)
  }

  test("pareto frontier equals brute-force dominance over the collected parts") {
    val sky = Extras.qParetoFrontier.fn(spark, sf)
      .select($"p_partkey", $"size")
      .as[(Long, Long)].collect().toMap
    val parts = Tables.part(spark, sf)
      .select($"p_partkey", $"p_retailprice", $"p_size".cast("long"))
      .as[(Long, Double, Long)].collect()
    val want = parts.filter { case (_, pr, sz) =>
      !parts.exists { case (_, pr2, sz2) =>
        (pr2 < pr && sz2 >= sz) || (pr2 <= pr && sz2 > sz)
      }
    }.map(p => p._1 -> p._3).toMap
    assert(sky === want)
    assert(sky.nonEmpty)
    // frontier law: paying more must buy size — sorted by price, sizes rise
    val fr = parts.filter(p => sky.contains(p._1))
      .sortBy(p => (p._2, p._3)).map(_._3).toSeq
    fr.sliding(2).foreach {
      case Seq(a, b) => assert(a <= b)
      case _ =>
    }
  }

  test("ols fit matches a plain-Scala normal-equations solve") {
    val r = Extras.qOlsFit.fn(spark, sf)
      .as[(Double, Double, Double, Double, Long)].head()
    val rows = Tables.lineitem(spark, sf)
      .select(($"l_extendedprice" * (lit(1) - $"l_discount")).as("y"),
        $"l_extendedprice".as("x1"), $"l_discount".as("x2"))
      .as[(Double, Double, Double)].collect()
    val n = rows.length.toDouble
    def s(f: ((Double, Double, Double)) => Double) = rows.map(f).sum
    val (sx1, sx2, sy) = (s(_._2), s(_._3), s(_._1))
    val (sx11, sx22, sx12) = (s(r => r._2 * r._2), s(r => r._3 * r._3), s(r => r._2 * r._3))
    val (sx1y, sx2y, syy) = (s(r => r._2 * r._1), s(r => r._3 * r._1), s(r => r._1 * r._1))
    val det = n * (sx11 * sx22 - sx12 * sx12) -
      sx1 * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx12 - sx11 * sx2)
    val b0 = (sy * (sx11 * sx22 - sx12 * sx12) -
      sx1 * (sx1y * sx22 - sx12 * sx2y) + sx2 * (sx1y * sx12 - sx11 * sx2y)) / det
    val b1 = (n * (sx1y * sx22 - sx12 * sx2y) -
      sy * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx2y - sx1y * sx2)) / det
    val b2 = (n * (sx11 * sx2y - sx1y * sx12) -
      sx1 * (sx1 * sx2y - sx1y * sx2) + sy * (sx1 * sx12 - sx11 * sx2)) / det
    assert(math.abs(r._1 - b0) < 1e-4, s"b0 ${r._1} vs $b0")
    assert(math.abs(r._2 - b1) < 1e-6, s"b1 ${r._2} vs $b1")
    assert(math.abs(r._3 - b2) < 1e-2, s"b2 ${r._3} vs $b2")
    assert(r._4 >= 0.0 && r._4 <= 1.0)
    assert(r._4 > 0.9, "revenue is strongly explained by price")
    assert(r._5 === rows.length.toLong)
  }

  test("chi-square audit matches a plain-Scala recomputation") {
    val r = Extras.qChiSquare.fn(spark, sf)
      .as[(Double, Long, Double, Long)].head()
    val counts = Tables.documents(spark, sf)
      .groupBy($"lang", $"source").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
    val langs = counts.map(_._1).distinct
    val sources = counts.map(_._2).distinct
    val n = counts.map(_._3).sum.toDouble
    val obs = counts.map(c => (c._1, c._2) -> c._3.toDouble).toMap
    val rt = langs.map(l => l -> counts.filter(_._1 == l).map(_._3).sum.toDouble).toMap
    val ct = sources.map(s2 => s2 -> counts.filter(_._2 == s2).map(_._3).sum.toDouble).toMap
    val chi2 = (for (l <- langs; s2 <- sources) yield {
      val e = rt(l) * ct(s2) / n
      val o = obs.getOrElse((l, s2), 0.0)
      (o - e) * (o - e) / e
    }).sum
    assert(math.abs(r._1 - math.rint(chi2 * 1e4) / 1e4) <= 1e-3, s"chi2 ${r._1} vs $chi2")
    assert(r._2 === (langs.length - 1).toLong * (sources.length - 1))
    assert(r._3 >= 0.0 && r._3 <= 1.0)
    assert(r._4 === n.toLong)
  }

  test("span corruption: ~15% rate, one bounded span per block, deterministic") {
    val rows = TextOps.qSpanCorruption.fn(spark, sf)
      .select($"doc_id", $"n_tokens", $"n_corrupted", $"n_spans", $"corrupt_rate")
      .as[(Long, Long, Long, Long, Double)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nt, nc, ns, rate) =>
      assert(nc <= nt)
      assert(ns <= nt / 20 + 1, "at most one span per 20-token block")
      assert(nc <= ns * 3, "spans are at most 3 tokens")
      assert(rate >= 0.0 && rate <= 0.2 + 3.0 / math.max(nt, 1L))
    }
    // corpus-wide realized rate tracks the 3/20 design point
    val corpus = rows.map(_._3).sum.toDouble / rows.map(_._2).sum
    assert(corpus > 0.10 && corpus < 0.18, s"corpus rate $corpus")
    // pure hash arithmetic → replay-identical
    val again = TextOps.qSpanCorruption.fn(spark, sf)
      .select($"doc_id", $"n_tokens", $"n_corrupted", $"n_spans", $"corrupt_rate")
      .as[(Long, Long, Long, Long, Double)]
      .collect()
    assert(rows.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("curriculum order: a permutation with bands in easy-to-hard position blocks") {
    val rows = Corpus.qCurriculumOrder.fn(spark, sf)
      .select($"doc_id", $"band", $"pos")
      .as[(Long, Long, Long)]
      .collect()
    val n = Tables.documents(spark, sf).count()
    assert(rows.length === n)
    assert(rows.map(_._3).sorted.toSeq === (1L to n), "pos is a permutation")
    // every band occupies a contiguous position block, in band order
    val byBand = rows.groupBy(_._2).toSeq.sortBy(_._1)
    byBand.sliding(2).foreach {
      case Seq((_, lo), (_, hi)) =>
        assert(lo.map(_._3).max < hi.map(_._3).min, "bands must not interleave")
      case _ =>
    }
    // quartile banding: no band holds more than ~40% of the corpus
    byBand.foreach { case (b, rs) =>
      assert(rs.length < 0.4 * n, s"band $b size ${rs.length}")
    }
  }

  test("rfm segments: score monotonicity and tertile coverage") {
    val rows = graft.operators.Events.qRfmSegments.fn(spark, sf)
      .select($"user_id", $"recency_days", $"freq", $"monetary",
        $"r_score", $"f_score", $"m_score", $"segment")
      .as[(Long, Double, Long, Double, Int, Int, Int, String)]
      .collect()
    val purchasers = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id").distinct().count()
    assert(rows.length === purchasers)
    rows.foreach { r =>
      assert(r._5 >= 1 && r._5 <= 3 && r._6 >= 1 && r._6 <= 3 && r._7 >= 1 && r._7 <= 3)
      assert(r._8 === s"${r._5}${r._6}${r._7}")
    }
    // monotone banding: more monetary value never lowers the m score,
    // more recency (staler) never raises the r score
    val byMon = rows.sortBy(_._4)
    byMon.sliding(2).foreach {
      case Array(a, b) => assert(a._7 <= b._7, s"m_score order ${a._1} ${b._1}")
      case _ =>
    }
    val byRec = rows.sortBy(_._2)
    byRec.sliding(2).foreach {
      case Array(a, b) => assert(a._5 >= b._5, s"r_score order ${a._1} ${b._1}")
      case _ =>
    }
    // tertiles: no score value may swallow the population
    Seq(rows.map(_._5), rows.map(_._6), rows.map(_._7)).foreach { scores =>
      scores.distinct.foreach { v =>
        assert(scores.count(_ == v) < 0.7 * rows.length, s"score $v degenerate")
      }
    }
  }

  test("market basket: rule metrics are internally consistent") {
    val rows = graft.operators.Relational.qMarketBasket.fn(spark, sf)
      .select($"b1", $"b2", $"n12", $"support", $"confidence", $"lift")
      .as[(String, String, Long, Double, Double, Double)]
      .collect()
    assert(rows.nonEmpty)
    val b = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), $"l_partkey" === $"p_partkey")
      .select($"l_orderkey".as("ok"), $"p_brand".as("brand"))
      .distinct()
    val nOrders = b.select($"ok").distinct().count()
    val nb = b.groupBy($"brand").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    rows.foreach { case (b1, b2, n12, sup, conf, lift) =>
      assert(b1 < b2, "pairs are canonical")
      assert(n12 <= math.min(nb(b1), nb(b2)))
      assert(math.abs(sup - math.rint(n12.toDouble / nOrders * 1e4) / 1e4) <= 1e-9)
      assert(conf >= sup - 1e-9, "confidence >= support (nb1 <= n_orders)")
      assert(lift > 0.0)
    }
    // spot-verify one pair's raw co-occurrence count
    val (b1, b2, n12, _, _, _) = rows.head
    val direct = b.as("x")
      .join(b.as("y"), $"x.ok" === $"y.ok")
      .filter($"x.brand" === b1 && $"y.brand" === b2)
      .count()
    assert(direct === n12)
  }

  test("ab test: arms partition users, verdict follows the rounded statistic") {
    val r = graft.operators.Events.qAbTest.fn(spark, sf)
      .as[(Long, Double, Long, Double, Double, Boolean)].head()
    val users = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(r._1 + r._3 === users, "hash arms must partition the users")
    assert(r._1 > 0 && r._3 > 0, "parity split must populate both arms")
    assert(r._2 >= 0.0 && r._4 >= 0.0)
    assert(r._6 === (math.abs(r._5) > 1.96))
    // null split (same population): the difference should not be extreme
    assert(math.abs(r._5) < 10.0, s"t=${r._5} implausible for a null split")
  }

  test("kaplan-meier: monotone survival, shrinking risk set, full census") {
    val rows = graft.operators.Events.qKaplanMeier.fn(spark, sf)
      .select($"t", $"at_risk", $"deaths", $"censored", $"survival")
      .as[(Long, Long, Long, Long, Double)]
      .collect()
      .sortBy(_._1)
    assert(rows.nonEmpty)
    val users = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(rows.map(r => r._3 + r._4).sum === users, "every user dies or censors")
    assert(rows.head._2 === users, "everyone is at risk at the first lifetime")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 > b._2, "risk set strictly shrinks across lifetimes")
        assert(a._5 >= b._5 - 1e-9, "survival is non-increasing")
      case _ =>
    }
    rows.foreach { r =>
      assert(r._5 >= 0.0 && r._5 <= 1.0)
      assert(r._3 + r._4 <= r._2, "exits bounded by the risk set")
    }
    // at_risk(t) recomputed: users whose lifetime >= t
    val lifetimes = Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(datediff(max(date_trunc("day", $"ts")),
        min(date_trunc("day", $"ts"))).cast("long").as("lt"))
      .as[(Long, Long)].collect().map(_._2)
    rows.foreach { r =>
      assert(r._2 === lifetimes.count(_ >= r._1).toLong, s"at_risk(${r._1})")
    }
  }

  test("native session windows agree with the manual lag/cumsum sessionization") {
    val native = graft.operators.Events.qSessionWindowNative.fn(spark, sf)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"), sum($"n_events").as("n_events"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val manual = graft.operators.Events.qSessionize.fn(spark, sf)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(native.keySet === manual.keySet)
    // event totals must agree exactly; session counts may differ ONLY at
    // exact-gap boundaries (builtin closes at >= gap, manual at > gap)
    native.foreach { case (u, (ns, ne)) =>
      assert(ne === manual(u)._2, s"event total for user $u")
      assert(ns >= manual(u)._1, s"builtin can only split more, user $u")
    }
  }

  test("weighted median matches a plain-Scala computation and sits in range") {
    val rows = Corpus.qWeightedMedian.fn(spark, sf)
      .select($"source", $"wmedian_len")
      .as[(String, Long)].collect().toMap
    val docs = Tables.documents(spark, sf)
      .select($"source", $"n_chars".cast("long"),
        size(graft.functions.TextFunctions.words($"text")).cast("long"))
      .as[(String, Long, Long)].collect()
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val sorted = ds.sortBy(_._2)
      val tw = sorted.map(_._3).sum
      var cw = 0L
      val want = sorted.find { d => cw += d._3; cw * 2 >= tw }.get._2
      assert(rows(src) === want, s"weighted median for $src")
      assert(rows(src) >= sorted.head._2 && rows(src) <= sorted.last._2)
    }
  }

  test("gini of source token shares matches plain Scala and its bounds") {
    val r = Corpus.qGiniSources.fn(spark, sf)
      .as[(Long, Double, Double)].head()
    val toks = Tables.documents(spark, sf)
      .select($"source", size(graft.functions.TextFunctions.words($"text"))
        .cast("double"))
      .as[(String, Double)].collect()
      .groupBy(_._1).map { case (_, xs) => xs.map(_._2).sum }.toSeq
    val n = toks.length.toDouble
    val tot = toks.sum
    val sd = (for (a <- toks; b <- toks) yield math.abs(a - b)).sum
    val gini = sd / (2 * n * tot)
    assert(r._1 === toks.length.toLong)
    assert(math.abs(r._2 - math.rint(gini * 1e4) / 1e4) <= 1e-3)
    assert(r._2 >= 0.0 && r._2 <= 1.0 - 1.0 / n + 1e-9, "Gini bounds")
    assert(r._3 >= 1.0 / n - 1e-9 && r._3 <= 1.0)
  }

  test("c-tf-idf terms match a plain-Scala recomputation") {
    val rows = Corpus.qCtfidfTerms.fn(spark, sf)
      .select($"source", $"term", $"ctfidf", $"rnk")
      .as[(String, String, Double, Int)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._4).sorted.toSeq === (1 to rs.length))
      assert(rs.length <= 5)
    }
    // third engine
    val docs = Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect()
    val tf = docs
      .flatMap { case (src, t) => t.trim.split(" +").map(w => (src, w)) }
      .groupBy(identity).map { case ((src, w), xs) => (src, w, xs.length.toDouble) }
      .toSeq
    val ctot = tf.groupBy(_._1).map { case (s0, xs) => s0 -> xs.map(_._3).sum }
    val avgCls = ctot.values.sum / ctot.size
    val nAll = tf.groupBy(_._2).map { case (w, xs) => w -> xs.map(_._3).sum }
    val want = tf
      .map { case (s0, w, n) =>
        (s0, w, math.rint(n / ctot(s0) * math.log(1 + avgCls / nAll(w)) * 1e6) / 1e6)
      }
      .groupBy(_._1)
      .flatMap { case (s0, xs) =>
        xs.sortBy(x => (-x._3, x._2)).take(5).zipWithIndex
          .map { case ((_, w, c), i) => (s0, w, c, i + 1) }
      }
      .toSet
    assert(rows.map(r => (r._1, r._2, r._3, r._4)).toSet === want)
  }

  test("dp release: calibrated noise, replay-deterministic, cells complete") {
    val rows = Curation.qDpRelease.fn(spark, sf)
      .select($"lang", $"true_n", $"released_n", $"noise", $"epsilon")
      .as[(String, Long, Double, Double, Double)].collect()
    val langs = Tables.documents(spark, sf)
      .select($"lang").distinct().as[String].collect().toSet
    assert(rows.map(_._1).toSet === langs)
    rows.foreach { r =>
      assert(r._5 === 1.0)
      // release = true + noise under the output rounding
      assert(math.abs(r._3 - (r._2 + r._4)) <= 0.011, s"${r._1}")
      // Laplace(1) tail: |noise| beyond 14 ~ e^-14 — a hash-uniform can't
      // land there with ~meaningful probability; bound guards the CDF math
      assert(math.abs(r._4) < 14.0, s"noise ${r._4} implausible")
    }
    val again = Curation.qDpRelease.fn(spark, sf)
      .select($"lang", $"released_n").as[(String, Double)].collect().toMap
    rows.foreach(r => assert(again(r._1) === r._3, "replay-deterministic"))
  }

  test("langid metrics: derived consistently from the confusion cells") {
    val metrics = TextOps.qLangidMetrics.fn(spark, sf)
      .select($"lang", $"n_true", $"tp", $"precision", $"recall", $"f1")
      .as[(String, Long, Long, Double, Double, Double)].collect()
    val cells = TextOps.qTextLangid.fn(spark, sf)
      .select($"lang", $"predicted", $"n")
      .as[(String, String, Long)].collect()
    metrics.foreach { case (c, nTrue, tp, prec, rec, f1) =>
      val trues = cells.filter(_._1 == c).map(_._3).sum
      val preds = cells.filter(_._2 == c).map(_._3).sum
      val diag = cells.filter(x => x._1 == c && x._2 == c).map(_._3).sum
      assert(nTrue === trues && tp === diag, s"class $c")
      assert(prec === math.rint(diag.toDouble / math.max(preds, 1) * 1e4) / 1e4)
      assert(rec === math.rint(diag.toDouble / math.max(trues, 1) * 1e4) / 1e4)
      assert(f1 >= 0.0 && f1 <= 1.0)
      assert(tp <= nTrue)
    }
    assert(metrics.map(_._2).sum === Tables.documents(spark, sf).count())
  }

  test("knn classifier: census complete, accuracy in bounds, exact recount for one query") {
    val rows = graft.operators.Similarity.qKnnClassify.fn(spark, sf)
      .select($"label", $"n_queries", $"n_correct", $"accuracy")
      .as[(Int, Long, Long, Double)].collect()
    val held = Tables.embeddings(spark, sf)
      .filter($"vec_id" % 10 === 0).count()
    assert(rows.map(_._2).sum === held, "every held-out vector classified")
    rows.foreach { r =>
      assert(r._3 <= r._2)
      assert(r._4 === math.rint(r._3.toDouble / r._2 * 1e4) / 1e4)
    }
    // chance floor: with ~uniform labels, majority-of-5 beats 1/|labels|
    val nLabels = Tables.embeddings(spark, sf)
      .select($"label").distinct().count().toDouble
    val overall = rows.map(_._3).sum.toDouble / rows.map(_._2).sum
    assert(overall > 1.0 / nLabels * 0.5,
      s"overall accuracy $overall implausibly below chance")
  }

  test("cusum changepoint matches a plain-Scala bridge walk") {
    val rows = graft.operators.Events.qCusumChangepoint.fn(spark, sf)
      .select($"event_type", $"cp_day", $"peak_cusum", $"norm_peak", $"shifted")
      .as[(String, String, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf)
      .groupBy($"event_type",
        date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).cast("double").as("n"))
      .as[(String, String, Double)].collect()
    rows.foreach { case (tpe, cpDay, peak, normPeak, shifted) =>
      val series = daily.filter(_._1 == tpe).sortBy(_._2)
      val mean = series.map(_._3).sum / series.length
      var c = 0.0
      val walk = series.map { d => c += d._3 - mean; (d._2, math.rint(math.abs(c) * 1e6) / 1e6) }
      val want = walk.maxBy { case (day, v) => (v, day) }
      assert(want._1 === cpDay, s"cp day for $tpe")
      assert(math.abs(peak - math.rint(want._2 * 1e2) / 1e2) <= 0.011, s"peak for $tpe")
      // the walk returns to ~0 at the end (bridge property)
      assert(math.abs(c) < 1e-6, s"cusum of deviations must telescope to 0")
      assert(normPeak >= 0.0)
      assert(shifted === (normPeak > 1.36))
    }
  }

  test("acf matches a plain-Scala computation and stays in [-1, 1]") {
    val rows = graft.operators.Events.qAcf.fn(spark, sf)
      .select($"event_type", $"lag", $"rho")
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r._3 >= -1.0 - 1e-9 && r._3 <= 1.0 + 1e-9))
    val daily = Tables.events(spark, sf)
      .groupBy($"event_type",
        date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).cast("double").as("n"))
      .as[(String, String, Double)].collect()
    rows.groupBy(_._1).foreach { case (tpe, rs) =>
      val xs = daily.filter(_._1 == tpe).sortBy(_._2).map(_._3)
      val m = xs.sum / xs.length
      val ss = xs.map(x => (x - m) * (x - m)).sum
      rs.foreach { case (_, k, rho) =>
        val num = (0 until xs.length - k.toInt)
          .map(i => (xs(i) - m) * (xs(i + k.toInt) - m)).sum
        val want = math.rint(num / ss * 1e4) / 1e4
        assert(math.abs(rho - want) <= 1e-3, s"acf($tpe, $k)")
      }
    }
  }

  test("mann-kendall: plain-Scala S/tau/slope parity and flag law") {
    val rows = graft.operators.Events.qTrendMk.fn(spark, sf)
      .select($"event_type", $"n_days", $"s_stat", $"tau", $"theil_sen",
        $"z", $"trending")
      .as[(String, Long, Long, Double, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf)
      .groupBy($"event_type",
        date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).cast("double").as("n"))
      .as[(String, String, Double)].collect()
    rows.foreach { case (tpe, nDays, sStat, tau, slope, z, trending) =>
      val xs = daily.filter(_._1 == tpe).sortBy(_._2).map(_._3)
      assert(nDays === xs.length)
      val pairs = for {
        i <- xs.indices; j <- (i + 1) until xs.length
      } yield (math.signum(xs(j) - xs(i)), (xs(j) - xs(i)) / (j - i))
      assert(sStat === pairs.map(_._1.toLong).sum)
      val nn = xs.length.toDouble
      assert(math.abs(tau - sStat / (nn * (nn - 1) / 2.0)) <= 1e-3)
      // Theil-Sen: interpolated median of pairwise slopes
      val sl = pairs.map(_._2).sorted
      val med =
        if (sl.length % 2 == 1) sl(sl.length / 2)
        else (sl(sl.length / 2 - 1) + sl(sl.length / 2)) / 2.0
      assert(math.abs(slope - med) <= 1e-3, s"theil_sen($tpe)")
      assert(trending === (math.abs(z) > 1.96))
      assert(tau >= -1.0 && tau <= 1.0)
    }
  }

  test("hll estimate is within the 3-sigma error band of m=256") {
    val rows = Extras.qHllDistinct.fn(spark, sf)
      .select($"exact_parts", $"n_filled", $"hll_est", $"rel_err")
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (exact, filled, est, relErr) =>
      assert(filled >= 1 && filled <= 256)
      assert(est > 0)
      // standard error 1.04/sqrt(256) = 6.5%; 3 sigma ≈ 20%
      assert(relErr <= 0.20, s"exact=$exact est=$est relErr=$relErr")
      assert(math.abs(relErr - math.abs(est - exact) / exact) <= 1e-3)
    }
  }

  test("benford: shares sum to 1, law is the exact log10 shape") {
    val rows = Extras.qBenford.fn(spark, sf)
      .select($"digit", $"n", $"share", $"benford", $"chi2_term")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(rows.map(_._1).toSet.subsetOf((1L to 9L).toSet))
    assert(math.abs(rows.map(_._3).sum - 1.0) <= 2e-3)
    assert(math.abs(rows.map(_._4).sum - 1.0) <= 2e-3)
    rows.foreach { case (d, n, _, law, chi2) =>
      assert(n > 0)
      assert(math.abs(law - math.log10(1.0 + 1.0 / d)) <= 1e-4)
      assert(chi2 >= 0.0)
    }
  }

  test("bfs: seed at 0 hops, every edge relaxed (|d(u)-d(v)| <= 1)") {
    val hops = graft.operators.GraphOps.qGraphBfs.fn(spark, sf)
      .select($"nation", $"hops").as[(String, Long)].collect().toMap
    assert(hops.values.count(_ == 0L) === 1, "exactly one seed")
    assert(hops.values.forall(h => h >= 0 && (h <= hops.size || h == 99L)))
    // recompute the strong-edge set and check the relaxation fixpoint
    val e = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .join(Tables.supplier(spark, sf), $"l_suppkey" === $"s_suppkey")
      .groupBy($"c_nationkey".as("src"), $"s_nationkey".as("dst"))
      .agg(count(lit(1)).as("w"))
    val mw = e.agg(avg($"w")).as[Double].head()
    val name = Tables.nation(spark, sf)
      .select($"n_nationkey", $"n_name").as[(Long, String)].collect().toMap
    val und = e.filter($"w" > mw && $"src" =!= $"dst")
      .select(least($"src", $"dst"), greatest($"src", $"dst"))
      .distinct().as[(Long, Long)].collect()
    und.foreach { case (a, b) =>
      val (da, db) = (hops(name(a)), hops(name(b)))
      if (da < 99 || db < 99)
        assert(math.abs(da - db) <= 1, s"edge ($a,$b): $da vs $db")
    }
  }

  test("rrf fusion: scores recompose from the rank sentinels") {
    val rows = TextOps.qRrfFusion.fn(spark, sf)
      .select($"doc_id", $"lex_rnk", $"vec_rnk", $"rrf", $"rank")
      .as[(Long, Long, Long, Double, Int)].collect()
    assert(rows.length === 10)
    assert(rows.map(_._5).sorted.toSeq === (1 to 10))
    rows.foreach { case (_, lex, vec, rrf, _) =>
      assert(lex >= 0 && lex <= 20 && vec >= 0 && vec <= 20)
      assert(lex > 0 || vec > 0, "a fused doc must appear in some list")
      val want = (if (lex > 0) 1.0 / (60 + lex) else 0.0) +
        (if (vec > 0) 1.0 / (60 + vec) else 0.0)
      assert(math.abs(rrf - want) <= 1e-5)
    }
    // ranks strictly follow the fused score (doc_id tiebreak)
    val sorted = rows.sortBy(_._5)
    sorted.sliding(2).foreach {
      case Array((id1, _, _, s1, _), (id2, _, _, s2, _)) =>
        assert(s1 > s2 || (s1 == s2 && id1 < id2))
      case _ =>
    }
  }

  test("source jsd: symmetric-bounded and equal to a plain-Scala rebuild") {
    val rows = Curation.qSourceJsd.fn(spark, sf)
      .select($"src_a", $"src_b", $"jsd", $"jsd_bits")
      .as[(String, String, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, jsd, bits) =>
      assert(a < b, "unordered pairs emitted once, a < b")
      assert(jsd >= 0.0 && jsd <= math.log(2.0) + 1e-9)
      assert(math.abs(bits - math.rint(jsd / math.log(2.0) * 1e4) / 1e4) <= 1e-9)
    }
    // plain-Scala rebuild of the smoothed bucket distributions
    import graft.functions.TextFunctions.stableHash60
    val toks = Tables.documents(spark, sf)
      .select($"source", explode(split(trim($"text"), " +")).as("tok"))
      .select($"source",
        (stableHash60(concat(lit("ds|"), $"tok")) % 1024).as("b"))
      .groupBy($"source", $"b").agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)].collect()
    val bySrc = toks.groupBy(_._1).map { case (src, rs) =>
      val ns = rs.map(_._3).sum.toDouble
      val cs = rs.map(r => r._2 -> r._3.toDouble).toMap
      src -> ((b: Long) => (cs.getOrElse(b, 0.0) + 1.0) / (ns + 1024.0))
    }
    rows.foreach { case (a, b, jsd, _) =>
      val (pa, pb) = (bySrc(a), bySrc(b))
      val want = (0L until 1024L).map { k =>
        val (p, q) = (pa(k), pb(k))
        p * math.log(2 * p / (p + q)) + q * math.log(2 * q / (p + q))
      }.sum * 0.5
      assert(math.abs(jsd - want) <= 1e-3, s"jsd($a,$b)")
    }
  }

  test("stl: seasonal components sum to zero, strength bounded") {
    val rows = graft.operators.Events.qStlSeasonal.fn(spark, sf)
      .select($"event_type", $"dow", $"seasonal", $"seasonal_strength")
      .as[(String, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (tpe, rs) =>
      assert(rs.map(_._2).toSet === (0L to 6L).toSet, s"dows($tpe)")
      // re-centered seasonal: unweighted mean over the 7 dow cells is 0
      assert(math.abs(rs.map(_._3).sum / 7.0) <= 1e-3, s"center($tpe)")
      rs.foreach(r => assert(r._4 >= 0.0 && r._4 <= 1.0))
    }
  }

  test("ks: D equals the plain-Scala ECDF sup-difference") {
    val r = graft.operators.Events.qKsTest.fn(spark, sf)
      .select($"n1", $"n2", $"d_stat", $"d_crit", $"reject")
      .as[(Long, Long, Double, Double, Boolean)].head()
    val (n1, n2, d, crit, reject) = r
    val vals = Tables.events(spark, sf)
      .filter($"event_type".isin("click", "view"))
      .select($"event_type", $"value").as[(String, Double)].collect()
    val x1 = vals.filter(_._1 == "click").map(_._2).sorted
    val x2 = vals.filter(_._1 == "view").map(_._2).sorted
    assert(n1 === x1.length && n2 === x2.length)
    val pool = (x1 ++ x2).distinct
    val want = pool.map { x =>
      math.abs(x1.count(_ <= x).toDouble / x1.length -
        x2.count(_ <= x).toDouble / x2.length)
    }.max
    assert(math.abs(d - want) <= 1e-5)
    assert(math.abs(crit -
      1.358 * math.sqrt((n1 + n2).toDouble / (n1.toDouble * n2))) <= 1e-5)
    assert(reject === (d > crit))
  }

  test("seq mining: rank/support laws and pattern shape") {
    val rows = graft.operators.Events.qSeqMining.fn(spark, sf)
      .select($"pattern", $"len", $"n_occ", $"n_sess", $"support", $"rank")
      .as[(String, Int, Long, Long, Double, Int)].collect()
    assert(rows.length === 15)
    assert(rows.map(_._6).sorted.toSeq === (1 to 15))
    rows.foreach { case (pat, len, nOcc, nSess, support, _) =>
      assert(pat.split(">").length === len)
      assert(len === 2 || len === 3)
      assert(nOcc >= nSess && nSess >= 1)
      assert(support > 0.0 && support <= 1.0)
    }
    // ranked by session support desc, pattern tiebreak
    rows.sortBy(_._6).sliding(2).foreach {
      case Array(a, b) =>
        assert(a._4 > b._4 || (a._4 == b._4 && a._1 < b._1))
      case _ =>
    }
  }

  test("lpa: labels partition the graph; sizes are consistent") {
    val rows = graft.operators.GraphOps.qLpaCommunities.fn(spark, sf)
      .select($"nation", $"community", $"comm_size")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length === rows.length,
      "each nation exactly once")
    rows.groupBy(_._2).foreach { case (_, members) =>
      assert(members.map(_._3).distinct.toSeq === Seq(members.length.toLong))
    }
  }

  test("assortativity: bounded and edge count matches the strong graph") {
    val (nEdges, r) = graft.operators.GraphOps.qAssortativity.fn(spark, sf)
      .as[(Long, Double)].head()
    assert(r >= -1.0 && r <= 1.0)
    val e = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .join(Tables.supplier(spark, sf), $"l_suppkey" === $"s_suppkey")
      .groupBy($"c_nationkey".as("src"), $"s_nationkey".as("dst"))
      .agg(count(lit(1)).as("w"))
    val mw = e.agg(avg($"w")).as[Double].head()
    val und = e.filter($"w" > mw && $"src" =!= $"dst")
      .select(least($"src", $"dst"), greatest($"src", $"dst"))
      .distinct().count()
    assert(nEdges === und)
  }

  test("knn outliers: scores match a plain-Scala 5th-NN recomputation") {
    val rows = graft.operators.Similarity.qKnnOutliers.fn(spark, sf)
      .select($"qid", $"knn_dist", $"rank").as[(Long, Double, Int)].collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_._3).sorted.toSeq === (1 to rows.length))
    rows.foreach(r => assert(r._2 >= 0.0 && r._2 <= 2.0))
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    rows.foreach { case (qid, dist, _) =>
      val qv = vecs.find(_._1 == qid).get._2
      val sims = vecs.filter(_._1 != qid).map { case (_, v) => cos(qv, v) }
        .sorted(Ordering[Double].reverse)
      val want = math.rint((1.0 - sims(4)) * 1e4) / 1e4
      assert(math.abs(dist - want) <= 1e-3, s"knn_dist($qid)")
    }
  }

  test("ndcg: gains follow the formula, ndcg monotone and bounded") {
    val rows = TextOps.qNdcg.fn(spark, sf)
      .select($"doc_id", $"rank", $"rel", $"gain", $"ndcg_at_rank")
      .as[(Long, Int, Long, Double, Double)].collect().sortBy(_._2)
    assert(rows.length === 10)
    rows.foreach { case (_, rank, rel, gain, ndcg) =>
      val want = (math.pow(2.0, rel) - 1) / (math.log(rank + 1) / math.log(2))
      assert(math.abs(gain - want) <= 1e-3, s"gain@$rank")
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9, s"ndcg@$rank=$ndcg")
      assert(rel >= 0 && rel <= 3)
    }
    // cumulative: non-decreasing in rank
    rows.map(_._5).sliding(2).foreach {
      case Array(a, b) => assert(b >= a - 1e-9)
      case _ =>
    }
  }

  test("poisson bootstrap: CI brackets the mean, resample count exact") {
    val r = Extras.qPoissonBootstrap.fn(spark, sf)
      .select($"n_resamples", $"mean", $"boot_mean", $"ci_lo", $"ci_hi")
      .as[(Long, Double, Double, Double, Double)].head()
    val (b, mean, bootMean, lo, hi) = r
    assert(b === 32L)
    assert(lo <= hi)
    assert(lo <= bootMean && bootMean <= hi)
    // Poisson(1) bootstrap of a ~1500-row table: the true mean sits
    // inside (or within a hair of) the 95% interval
    assert(mean >= lo - (hi - lo) && mean <= hi + (hi - lo))
    val trueMean = Tables.orders(spark, sf)
      .agg(avg($"o_totalprice")).as[Double].head()
    assert(math.abs(mean - math.rint(trueMean * 1e4) / 1e4) <= 1e-6)
  }

  test("heaps law: points monotone, fit matches plain-Scala OLS") {
    val rows = TextOps.qHeapsLaw.fn(spark, sf)
      .select($"decile", $"n_tokens", $"vocab", $"beta", $"k_coef")
      .as[(Int, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.length === 10)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._2 >= a._2 && b._3 >= a._3, "prefix growth is monotone")
      case _ =>
    }
    val beta = rows.head._4
    assert(rows.forall(_._4 === beta), "one shared fit")
    val xs = rows.map(r => math.log(r._2.toDouble))
    val ys = rows.map(r => math.log(r._3.toDouble))
    val (mx, my) = (xs.sum / 10, ys.sum / 10)
    val want = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
      xs.map(x => (x - mx) * (x - mx)).sum
    assert(math.abs(beta - want) <= 1e-3)
    // the tiny sf0.001 fixture saturates its closed vocabulary in the
    // first decile (beta == 0); natural corpora land in (0, 1)
    assert(beta >= 0.0 && beta < 1.0)
  }

  test("hill tail: H and alpha reciprocal, matches top-k recomputation") {
    val (k, fk, h, alpha) = TextOps.qHillTail.fn(spark, sf)
      .as[(Long, Long, Double, Double)].head()
    assert(k >= 1L && k <= 99L)
    assert(math.abs(alpha - math.rint(1.0 / h * 1e4) / 1e4) <= 2e-4)
    val freqs = Tables.documents(spark, sf)
      .select(explode(split(trim($"text"), " +")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("f"))
      .orderBy($"f".desc, $"w").limit(100)
      .select($"f").as[Long].collect()
    assert(k === freqs.length - 1L)
    assert(fk === freqs.last)
    val want = freqs.init.map(f => math.log(f.toDouble / freqs.last)).sum /
      (freqs.length - 1)
    assert(math.abs(h - want) <= 1e-3)
  }

  test("markov stationary: pi is a distribution matching plain-Scala iteration") {
    val rows = graft.operators.Events.qMarkovStationary.fn(spark, sf)
      .select($"event_type", $"pi", $"empirical", $"drift")
      .as[(String, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._2).sum - 1.0) <= 1e-4, "pi sums to 1")
    assert(math.abs(rows.map(_._3).sum - 1.0) <= 1e-4, "empirical sums to 1")
    rows.foreach { case (_, pi, emp, drift) =>
      assert(pi >= 0.0 && emp >= 0.0)
      assert(math.abs(drift - math.rint((pi - emp) * 1e6) / 1e6) <= 2e-6)
    }
    // plain-Scala power iteration over the same closed transition matrix
    val pairs = Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts_ns", $"event_id")
      .as[(Long, String, Long, Long)].collect()
      .groupBy(_._1).toSeq.flatMap { case (_, evs) =>
        evs.sortBy(e => (e._3, e._4)).map(_._2).sliding(2).collect {
          case Array(a, b) => (a, b)
        }
      }
    val srcs = pairs.map(_._1).toSet
    val closed = pairs.filter(p => srcs.contains(p._2))
    val counts = closed.groupBy(identity).map { case (k, v) => k -> v.size }
    val rowTot = counts.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val states = rowTot.keys.toSeq.sorted
    var pi = states.map(_ -> 1.0 / states.size).toMap
    (0 until graft.operators.Events.MarkovRounds).foreach { _ =>
      pi = states.map { b =>
        b -> states.map { a =>
          pi(a) * counts.getOrElse((a, b), 0).toDouble / rowTot(a)
        }.sum
      }.toMap
    }
    rows.foreach { case (t, got, _, _) =>
      assert(math.abs(got - pi(t)) <= 1e-4, s"pi($t)")
    }
  }

  test("funnel time: converted counts match the funnel, median <= p90") {
    val rows = graft.operators.Events.qFunnelTime.fn(spark, sf)
      .select($"step", $"n_converted", $"median_min", $"p90_min")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.keySet === Set("view>click", "click>purchase"))
    rows.values.foreach { case (_, n, med, p90) =>
      assert(n > 0)
      assert(med > 0.0 && med <= p90)
    }
    val funnel = graft.operators.Events.qFunnel.fn(spark, sf)
      .select($"clicked", $"purchased").as[(Long, Long)].head()
    assert(rows("view>click")._2 === funnel._1)
    assert(rows("click>purchase")._2 === funnel._2)
  }

  test("sq sweep: error shrinks with bits and respects the 2^-b bound") {
    val rows = graft.operators.Quantization.qSqSweep.fn(spark, sf)
      .select($"bits", $"rmse", $"rel_err").as[(Int, Double, Double)]
      .collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(2, 4, 6, 8))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._2 < a._2 && b._3 < a._3, s"error monotone: $a vs $b")
      case _ =>
    }
    rows.foreach { case (bits, _, relErr) =>
      val levels = (1 << bits) - 1
      assert(relErr <= 1.0 / (2.0 * levels) + 1e-9,
        s"uniform quantizer bound at $bits bits")
    }
  }

  test("psi drift: non-negative, level thresholds consistent") {
    val rows = graft.operators.Events.qPsiDrift.fn(spark, sf)
      .select($"event_type", $"psi", $"drift_level")
      .as[(String, Double, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, psi, lvl) =>
      assert(psi >= 0.0, "PSI is a sum of non-negative KL-type terms")
      val want = if (psi > 0.2) "major"
        else if (psi > 0.1) "moderate" else "stable"
      assert(lvl === want)
    }
    // same generator drives both halves of the fixture window: stable
    assert(rows.count(_._3 == "stable") >= rows.length / 2)
  }

  test("cuped: theta/variances match plain-Scala; reduction = rho^2") {
    val r = graft.operators.Events.qCuped.fn(spark, sf)
      .select($"n_users", $"theta", $"var_y", $"var_adj", $"var_reduction")
      .as[(Long, Double, Double, Double, Double)].head()
    val (n, theta, varY, varAdj, red) = r
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"ts_ns", $"value")
      .as[(Long, Long, Double)].collect()
    val lo = ev.map(_._2).min
    val hi = ev.map(_._2).max
    val perUser = ev.groupBy(_._1).map { case (_, es) =>
      (es.filter(e => e._2 * 2 < lo + hi).map(_._3).sum,
        es.filter(e => e._2 * 2 >= lo + hi).map(_._3).sum)
    }.toSeq
    assert(n === perUser.length)
    val mx = perUser.map(_._1).sum / n
    val my = perUser.map(_._2).sum / n
    val cxy = perUser.map(p => (p._1 - mx) * (p._2 - my)).sum / n
    val vx = perUser.map(p => (p._1 - mx) * (p._1 - mx)).sum / n
    val vy = perUser.map(p => (p._2 - my) * (p._2 - my)).sum / n
    assert(math.abs(theta - cxy / vx) <= 1e-3)
    assert(math.abs(varY - vy) <= math.abs(vy) * 1e-4 + 1e-3)
    // CUPED law: var_adj = var_y(1 - rho^2), i.e. reduction = rho^2
    val rho2 = cxy * cxy / (vx * vy)
    assert(math.abs(red - rho2) <= 1e-3)
    assert(varAdj <= varY + 1e-9)
  }

  test("conformal: folds partition, coverage near nominal 90%") {
    val r = Extras.qConformal.fn(spark, sf)
      .select($"n_train", $"n_cal", $"n_test", $"beta1", $"qhat",
        $"coverage")
      .as[(Long, Long, Long, Double, Double, Double)].head()
    val (nTrain, nCal, nTest, b1, qhat, cov) = r
    val total = Tables.lineitem(spark, sf).count()
    assert(nTrain + nCal + nTest === total,
      "folds 0-1 train, 2 cal, 3 test partition the table")
    assert(nTrain > nCal && nTrain > nTest)
    // the fixture draws price and quantity independently, so the fit is
    // weak — irrelevant: conformal coverage is model-agnostic
    assert(!b1.isNaN)
    assert(qhat > 0)
    // split-conformal guarantee: coverage within a few points of 90%
    assert(cov >= 0.85 && cov <= 0.95, s"coverage=$cov")
  }

  test("media segments: census laws against a plain-Scala rerun") {
    val rows = graft.operators.Multimodal.qMediaSegments.fn(spark, sf)
      .select($"doc_id", $"n_windows", $"n_active", $"n_segments",
        $"longest_run")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nw, na, ns, lr) =>
      assert(na <= nw && lr <= na)
      assert(ns <= na, "each segment has >= 1 active window")
      if (na > 0) assert(ns >= 1 && lr >= 1)
      // mean threshold: strictly-above can never cover everything
      assert(na < nw || nw <= 1)
    }
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    rows.take(10).foreach { case (id, nw, na, ns, lr) =>
      val bytes = docs(id).getBytes("UTF-8")
      val wins = bytes.grouped(16).map(_.map(_ & 0xff).sum.toLong).toArray
      assert(nw === wins.length)
      val me = wins.sum.toDouble / wins.length
      val active = wins.map(_ > me)
      assert(na === active.count(identity))
      val runs = active.foldLeft(List.empty[Int]) {
        case (acc, true) if acc.nonEmpty && acc.head > 0 =>
          (acc.head + 1) :: acc.tail
        case (acc, true) => 1 :: acc
        case (acc, false) if acc.nonEmpty && acc.head > 0 => 0 :: acc
        case (acc, false) => acc
      }.filter(_ > 0)
      assert(ns === runs.length, s"segments($id)")
      assert(lr === (if (runs.isEmpty) 0 else runs.max), s"longest($id)")
    }
  }

  test("spearman: equals Pearson over plain-Scala tie-averaged ranks") {
    val (n, sp, pe) = Extras.qSpearman.fn(spark, sf)
      .as[(Long, Double, Double)].head()
    val li = Tables.lineitem(spark, sf)
      .select($"l_quantity", $"l_extendedprice")
      .as[(Double, Double)].collect()
    assert(n === li.length)
    def ranks(vs: Array[Double]): Map[Double, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val less = sorted.count(_ < v)
        val m = sorted.count(_ == v)
        v -> (less + (m + 1) / 2.0)
      }.toMap
    }
    val rx = ranks(li.map(_._1))
    val ry = ranks(li.map(_._2))
    def corr(xs: Array[Double], ys: Array[Double]): Double = {
      val (mx, my) = (xs.sum / xs.length, ys.sum / ys.length)
      val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
      cov / math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum *
        ys.map(b => (b - my) * (b - my)).sum)
    }
    val wantSp = corr(li.map(p => rx(p._1)), li.map(p => ry(p._2)))
    assert(math.abs(sp - wantSp) <= 1e-3, s"spearman $sp vs $wantSp")
    assert(sp >= -1.0 && sp <= 1.0 && pe >= -1.0 && pe <= 1.0)
  }

  test("embed corr pairs: bounded, ranked by |corr|, matches direct corr") {
    val rows = graft.operators.Spectral.qEmbedCorrPairs.fn(spark, sf)
      .select($"i", $"j", $"corr", $"rank").as[(Int, Int, Double, Int)]
      .collect().sortBy(_._4)
    assert(rows.length === 10)
    rows.foreach { case (i, j, r, _) =>
      assert(i < j && i >= 0 && j < 64)
      assert(r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9)
    }
    rows.map(r => math.abs(r._3)).sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-9)
      case _ =>
    }
    // spot-check the top pair against a direct two-column correlation
    val (ti, tj, tr, _) = rows.head
    val direct = Tables.embeddings(spark, sf)
      .select(element_at($"embedding", ti + 1).cast("double").as("x"),
        element_at($"embedding", tj + 1).cast("double").as("y"))
      .agg(corr($"x", $"y")).as[Double].head()
    assert(math.abs(tr - direct) <= 1e-3)
  }

  test("join size est: per-key identity exact, bucket estimate inflates") {
    val r = Extras.qJoinSizeEst.fn(spark, sf)
      .select($"est_bucketed", $"est_per_key", $"exact_rows", $"inflation")
      .as[(Long, Long, Long, Double)].head()
    val (est, perKey, exact, infl) = r
    assert(perKey === exact,
      "sum over key histograms IS the exact join cardinality")
    assert(est >= exact, "hash-bucket collisions only ever add")
    assert(infl >= 1.0)
    assert(exact === Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .count())
  }

  test("decay score: bounded by plain sum, exact on a recomputed user") {
    val rows = graft.operators.Events.qDecayScore.fn(spark, sf)
      .select($"user_id", $"n_events", $"decayed_score", $"plain_sum",
        $"recency_ratio")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, dec, plain, ratio) =>
      assert(n > 0)
      assert(dec <= plain + 1e-6, "decay only shrinks")
      assert(ratio > 0.0 && ratio <= 1.0 + 1e-9)
    }
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"ts_ns", $"value")
      .as[(Long, Long, Double)].collect()
    val tRef = ev.map(_._2).max
    val uid = rows.head._1
    val want = ev.filter(_._1 == uid)
      .map(e => e._3 * math.exp(-0.1 * (tRef - e._2) / 86400e9)).sum
    assert(math.abs(rows.head._3 - want) <= 1e-3)
  }

  test("naive bayes: learned classifier beats chance on held-out docs") {
    val rows = graft.operators.Scoring.qNaiveBayes.fn(spark, sf)
      .select($"true_lang", $"n_test", $"n_correct", $"accuracy")
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, c, acc) =>
      assert(c <= n)
      assert(math.abs(acc - math.rint(c.toDouble / n * 1e4) / 1e4) <= 1e-9)
    }
    val total = rows.map(_._2).sum
    val correct = rows.map(_._3).sum
    val langs = rows.length
    // overall accuracy must beat the 1/|langs| chance floor
    assert(correct.toDouble / total > 1.0 / langs,
      s"accuracy ${correct.toDouble / total} vs chance ${1.0 / langs}")
  }

  test("skipgram cooc: weights decompose as n1 + n2/2 over distances") {
    val rows = TextOps.qSkipgramCooc.fn(spark, sf)
      .select($"wa", $"wb", $"n", $"weight", $"rank")
      .as[(String, String, Long, Double, Int)].collect()
    assert(rows.length === 15)
    assert(rows.map(_._5).sorted.toSeq === (1 to 15))
    // recompute the top pair from raw token positions
    val (wa, wb, n, weight, _) = rows.minBy(_._5)
    val docs = Tables.documents(spark, sf)
      .select($"text").as[String].collect()
    var n1 = 0L
    var n2 = 0L
    docs.foreach { t =>
      val ws = t.trim.split(" +")
      ws.indices.foreach { i =>
        if (ws(i) == wa) {
          if (i + 1 < ws.length && ws(i + 1) == wb) n1 += 1
          if (i + 2 < ws.length && ws(i + 2) == wb) n2 += 1
        }
      }
    }
    assert(n === n1 + n2)
    assert(math.abs(weight - math.rint((n1 + n2 / 2.0) * 10) / 10) <= 1e-9)
  }

  test("bm25 prf: valid ranking, stage-1 flags match base retrieval") {
    val rows = TextOps.qBm25Prf.fn(spark, sf)
      .select($"doc_id", $"bm25_prf", $"rank", $"in_stage1")
      .as[(Long, Double, Int, Boolean)].collect().sortBy(_._3)
    assert(rows.length === 10)
    assert(rows.map(_._3).toSeq === (1 to 10))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      case _ =>
    }
    // stage-1 membership flags must agree with the base BM25 top-10
    val base = TextOps.qBm25Retrieval.fn(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    rows.foreach { case (id, _, _, flag) =>
      assert(flag === base.contains(id), s"in_stage1($id)")
    }
    // expansion terms carry weight: scores exceed pure base-term BM25
    assert(rows.exists(_._4), "some stage-1 doc survives re-ranking")
  }

  test("winsorized: clamped moments shrink, census matches band") {
    val rows = Extras.qWinsorized.fn(spark, sf)
      .select($"pri", $"n", $"mean_raw", $"mean_wins", $"sd_raw",
        $"sd_wins", $"n_clamped")
      .as[(String, Long, Double, Double, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, _, _, sdRaw, sdWins, nClamped) =>
      assert(sdWins <= sdRaw + 1e-9, "winsorizing never inflates spread")
      assert(nClamped <= n / 5 + 2, "~10% of a group sits outside p05/p95")
      assert(nClamped >= 1, "both tails clamp on a continuous column")
    }
  }

  test("srm: hash split balances, chi2 below the trigger on clean data") {
    val r = Extras.qSrmCheck.fn(spark, sf)
      .select($"n_control", $"n_treat", $"chi2", $"srm_triggered")
      .as[(Long, Long, Double, Boolean)].head()
    val (c, t, chi2, trig) = r
    assert(c + t === Tables.events(spark, sf)
      .select($"user_id").distinct().count())
    assert(chi2 >= 0.0)
    assert(trig === (chi2 > 3.841))
    assert(!trig, "a clean deterministic hash split must pass the gate")
  }

  test("user streaks: laws + plain-Scala island recount on a user") {
    val rows = graft.operators.Events.qUserStreaks.fn(spark, sf)
      .select($"user_id", $"n_active_days", $"longest_streak",
        $"n_streaks", $"current_streak")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, days, longest, streaks, current) =>
      assert(longest <= days && current <= longest)
      assert(streaks >= 1 && days >= streaks,
        "every streak holds at least one day")
    }
    val ev = Tables.events(spark, sf)
      .select($"user_id",
        datediff(date_trunc("day", $"ts").cast("date"), lit("1970-01-01"))
          .cast("long").as("day"))
      .distinct().as[(Long, Long)].collect()
    val lastDay = ev.map(_._2).max
    val uid = rows.head._1
    val ds = ev.filter(_._1 == uid).map(_._2).sorted
    val runs = ds.foldLeft(List.empty[(Long, Long)]) { // (start, end)
      case ((s0, e0) :: tail, d) if d == e0 + 1 => (s0, d) :: tail
      case (acc, d) => (d, d) :: acc
    }
    val lens = runs.map { case (s0, e0) => e0 - s0 + 1 }
    assert(rows.head._2 === ds.length)
    assert(rows.head._3 === lens.max)
    assert(rows.head._4 === runs.length)
    assert(rows.head._5 ===
      runs.find(_._2 == lastDay).map(r => r._2 - r._1 + 1).getOrElse(0L))
  }

  test("kcore: fixpoint property — every core member keeps k core partners") {
    val rows = graft.operators.GraphOps.qKcore.fn(spark, sf)
      .select($"nation", $"in_core", $"core_degree")
      .as[(String, Boolean, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, inCore, deg) =>
      if (inCore) assert(deg >= graft.operators.GraphOps.KCoreK,
        "a surviving node has >= k partners inside the core")
      else assert(deg === 0L, "peeled nodes report zero core degree")
    }
    // the 2-core of a graph with any cycle is non-empty on this fixture
    assert(rows.exists(_._2), "strong-trade graph retains a 2-core")
  }

  test("drift panel: rows recompose exactly from the three screens") {
    val panel = graft.operators.Events.qDriftPanel.fn(spark, sf)
      .select($"event_type", $"psi", $"drift_level", $"mk_z", $"trending",
        $"cusum_peak", $"shifted", $"any_alarm")
      .as[(String, Double, String, Double, Boolean, Double, Boolean,
        Boolean)].collect().map(r => r._1 -> r).toMap
    assert(panel.nonEmpty)
    val psi = graft.operators.Events.qPsiDrift.fn(spark, sf)
      .select($"event_type", $"psi", $"drift_level")
      .as[(String, Double, String)].collect().map(r => r._1 -> r).toMap
    val mk = graft.operators.Events.qTrendMk.fn(spark, sf)
      .select($"event_type", $"z", $"trending")
      .as[(String, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    panel.foreach { case (tpe, (_, p, lvl, z, tr, _, sh, alarm)) =>
      assert(p === psi(tpe)._2 && lvl === psi(tpe)._3)
      assert(z === mk(tpe)._2 && tr === mk(tpe)._3)
      assert(alarm === (lvl != "stable" || tr || sh))
    }
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
