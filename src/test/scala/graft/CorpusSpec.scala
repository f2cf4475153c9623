package graft

import graft.operators.{Corpus, CorpusOps, Dedup, TextOps}
import org.apache.spark.sql.functions._

/** Semantics of the corpus-curation operators: connected-components
  * fixpoint correctness, sampling determinism and stratum bounds, TF-IDF
  * ranking invariants, repetition-band consistency.
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: transitive chain collapses to one min label") {
    // 1-2, 2-3, 3-4 (a chain: only transitivity links 1 and 4) plus an
    // isolated pair 10-11 — two components, labels = component minima
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L))
      .toDF("d1", "d2")
    val got = Dedup
      .connectedComponents(edges)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: star graph and self-contained triangle") {
    val edges = Seq((5L, 1L), (5L, 2L), (5L, 3L), // star centered on 5
      (20L, 21L), (21L, 22L), (20L, 22L)) // triangle (cycle safety)
      .toDF("d1", "d2")
    val got = Dedup
      .connectedComponents(edges)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got(5L) === 1L && got(1L) === 1L && got(2L) === 1L && got(3L) === 1L)
    assert(got(20L) === 20L && got(21L) === 20L && got(22L) === 20L)
  }

  test("connectedComponents: a 500-hop chain converges (pointer jumping)") {
    // a path graph 0-1-2-...-500: neighbor-only min propagation needs
    // ~500 rounds (> the 64-round guard — exactly how the 10x scale
    // probe failed on a long-chain LSH component); the label(label(n))
    // shortcut must collapse it in ~log2(500) ≈ 9 rounds. Shuffled edge
    // order proves order-independence.
    val rnd = new scala.util.Random(7)
    val edges = rnd.shuffle((0L until 500L).map(i => (i, i + 1L)).toList)
      .toDF("d1", "d2")
    val got = Dedup.connectedComponents(edges)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got.size === 501)
    assert(got.values.forall(_ === 0L), "every chain node must label to 0")
  }

  test("connectedComponents: a plateau path (interleaved low ids) converges") {
    // the r9 probe's defect class: a path whose LOW ids are scattered
    // along the interior — 0, 600, 1, 601, 2, 602, … — so every low id
    // is a LOCAL-MIN plateau whose label is itself. The r7-era
    // member-level label(label(n)) shortcut was a no-op on plateaus and
    // the global min crawled between them hop-by-hop (the 10x scale
    // probe measured a 1-19-changes/round trickle still going at round
    // 64, tripping the convergence guard on a graph of only ~11k
    // edges). The star-level hook + full compression must collapse it
    // inside the 64-round guard — this test simply completing IS the
    // assertion, plus the exact min-labelling. A second component in
    // the same edge list proves no cross-component leakage while stars
    // contract.
    val ids = (0 until 600).flatMap(i => Seq(i.toLong, (600 + i).toLong))
    val path = ids.sliding(2).map { case Seq(a, b) => (a, b) }.toList
    val isle = List((5000L, 5001L), (5001L, 5002L))
    val rnd = new scala.util.Random(11)
    val edges = rnd.shuffle(path ++ isle).toDF("d1", "d2")
    val got = Dedup.connectedComponents(edges)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got.size === 1203)
    ids.foreach(i => assert(got(i) === 0L, s"node $i must label to 0"))
    Seq(5000L, 5001L, 5002L).foreach(i => assert(got(i) === 5000L))
  }

  test("cdcDedupStats: an insertion dirties only its own chunk; fixed-width shifts everything") {
    // 200 deterministic pseudo-words; insert ONE word a third of the way in
    val ws = (0 until 200).map(i => s"tok$i")
    val base = ws.mkString(" ")
    val edited = (ws.take(70) ++ Seq("INSERTED") ++ ws.drop(70)).mkString(" ")
    val df = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val chunks = CorpusOps.cdcChunks(df, "doc_id", "text")
      .select($"doc_id", $"chunk_text").as[(Long, String)].collect()
    val a = chunks.filter(_._1 == 1L).map(_._2).toSeq
    val b = chunks.filter(_._1 == 2L).map(_._2).toSeq
    // CDC re-synchronizes at the next content boundary: every chunk except
    // the one containing the insertion is byte-identical across versions
    val diffA = a.diff(b)
    val diffB = b.diff(a)
    info(s"cdc: ${a.size} chunks, ${diffA.size}/${diffB.size} differ after insert")
    assert(a.size > 5, "fixture must split into several chunks")
    assert(diffA.size <= 1 && diffB.size <= 1,
      s"insertion must dirty at most one chunk: $diffA / $diffB")
    // the fixed-width strawman: 10-word chunks shift at every later
    // position, so most of the document re-chunks after one insertion
    def fixed(text: String): Seq[String] =
      text.split(" ").grouped(10).map(_.mkString(" ")).toSeq
    val fDiff = fixed(base).diff(fixed(edited))
    assert(fDiff.size > fixed(base).size / 2,
      s"fixed-width chunking must shift most chunks (got ${fDiff.size})")
  }

  test("q_dedup_groups: labels are idempotent group minima covering all docs") {
    val groups = Dedup.qDedupGroups.fn(spark, sf).cache()
    val nDocs = Tables.documents(spark, sf).count()
    assert(groups.count() === nDocs)
    // every group_id is a member of its own group (canonical exists)
    val bad = groups
      .select($"group_id").distinct().as("g")
      .join(groups.select($"doc_id").as("d"), $"g.group_id" === $"d.doc_id",
        "left_anti")
      .count()
    assert(bad === 0L, "a group label must itself be a document in the group")
    // group minimum really is the label
    val minViolation = groups
      .groupBy($"group_id")
      .agg(min($"doc_id").as("mn"))
      .filter($"mn" =!= $"group_id")
      .count()
    assert(minViolation === 0L)
    groups.unpersist()
  }

  test("stratified sampling is deterministic and rate-plausible") {
    val a = Corpus.qSampleStratified.fn(spark, sf).collect()
    val b = Corpus.qSampleStratified.fn(spark, sf).collect()
    assert(a.toSeq === b.toSeq, "hash sampling must be reproducible")
    // realized rate within a loose binomial bound of the target permille
    a.foreach { r =>
      val permille = r.getAs[Int]("permille").toDouble
      val realized = r.getAs[Double]("realized_rate") * 1000
      val n = r.getAs[Long]("n_total").toDouble
      val tol = 4 * math.sqrt(permille * (1000 - permille) / n) + 1e-6
      assert(math.abs(realized - permille) <= tol,
        s"lang ${r.getString(0)}: realized $realized vs target $permille ± $tol")
    }
  }

  test("per-stratum k-sampling: at most k rows per stratum, ranks 1..k") {
    val rows = Corpus.qSamplePerStratumK.fn(spark, sf).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, rs) =>
      assert(rs.length <= 20, s"$lang overflows k")
      assert(rs.map(_.getAs[Int]("rn")).sorted.toSeq === (1 to rs.length),
        s"$lang ranks must be dense from 1")
    }
    // deterministic across runs
    val again = Corpus.qSamplePerStratumK.fn(spark, sf).collect()
    assert(rows.toSeq === again.toSeq)
  }

  test("tfidf: per-doc ranks dense, scores non-increasing, df consistent") {
    val rows = Corpus.qTfidfTopTerms.fn(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq === (1 to rs.length))
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y },
        s"doc $doc scores must be non-increasing in rank")
    }
  }

  test("repetition band agrees with the emitted fractions") {
    val rows = Corpus.qTextRepetition.fn(spark, sf).collect()
    rows.foreach { r =>
      val dup = r.getAs[Double]("dup_word_frac")
      val big = r.getAs[Double]("top_bigram_frac")
      val band = r.getAs[String]("band")
      assert(dup >= 0.0 && dup <= 1.0)
      assert(big >= 0.0)
      val expect = if (dup > 0.85 || big > 0.5) "repetitive" else "ok"
      assert(band === expect, s"doc ${r.getLong(0)}")
    }
  }

  test("mix weights: shares sum to ~1 and epochs = ceil(weight)") {
    val rows = Corpus.qMixSources.fn(spark, sf).collect()
    val shareSum = rows.map(_.getAs[Double]("natural_share")).sum
    assert(math.abs(shareSum - 1.0) < 0.01)
    rows.foreach { r =>
      val wgt = r.getAs[Double]("weight")
      val epochs = r.getAs[Int]("epochs")
      // epochs = ceil(true weight) but wgt is rounded to 4 decimals, so
      // accept the ceiling of anything within the rounding half-width
      assert(epochs >= 1 &&
        (epochs === math.ceil(wgt - 5e-5).toInt ||
          epochs === math.ceil(wgt + 5e-5).toInt))
    }
  }

  test("CorpusOps works on a user DataFrame with arbitrary column names") {
    import graft.operators.CorpusOps
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon", "web"),
      (101L, "alpha beta gamma delta epsilon", "web"), // dup of 100
      (102L, "zeta eta theta iota kappa lambda", "books"),
      (103L, "mu mu mu mu mu mu mu mu", "web"), // repetitive
      (104L, "nu xi omicron pi rho sigma tau", "books"))
      .toDF("item_id", "body", "origin")
    // dedup groups: 100/101 share a group labelled by the min id
    val groups = CorpusOps
      .dedupGroups(corpus, "item_id", "body")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(groups(100L) === 100L && groups(101L) === 100L)
    assert(groups(102L) === 102L && groups(104L) === 104L)
    // repetition metrics flag the all-same-word doc
    val rep = CorpusOps
      .repetitionMetrics(corpus, "item_id", "body")
      .collect()
      .map(r => r.getLong(0) -> r.getAs[String]("band"))
      .toMap
    assert(rep(103L) === "repetitive")
    assert(rep(102L) === "ok")
    // stratified sample keeps every row at 1000 permille, none at 0
    assert(CorpusOps.stratifiedSample(corpus, "item_id", "origin",
      Seq("web" -> 1000, "books" -> 1000)).count() === 5)
    assert(CorpusOps.stratifiedSample(corpus, "item_id", "origin",
      Seq("web" -> 0, "books" -> 0), defaultPermille = 0).count() === 0)
    // per-stratum sample bounds each origin at k and keeps schema
    val sampled = CorpusOps.perStratumSample(corpus, "item_id", "origin", 1)
    assert(sampled.columns.toSeq === Seq("item_id", "body", "origin"))
    assert(sampled.count() === 2) // one per origin
    // OOV against a 3-word vocabulary: ratios well-formed
    CorpusOps.oovStats(corpus, "item_id", "body", 3).collect().foreach { r =>
      assert(r.getAs[Double]("oov_ratio") >= 0.0 &&
        r.getAs[Double]("oov_ratio") <= 1.0)
    }
  }

  test("CorpusOps rejects input columns using the reserved prefix") {
    import graft.operators.CorpusOps
    val bad = Seq((1L, "a b c", "x"))
      .toDF("item_id", "body", CorpusOps.ReservedPrefix + "w")
    val e = intercept[IllegalArgumentException] {
      CorpusOps.repetitionMetrics(bad, "item_id", "body")
    }
    assert(e.getMessage.contains(CorpusOps.ReservedPrefix))
  }

  test("vocab OOV: ratios in [0,1]; corpus-wide OOV mass excludes top-V words") {
    val rows = Corpus.qVocabOov.fn(spark, sf).collect()
    rows.foreach { r =>
      val ratio = r.getAs[Double]("oov_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_tokens"))
    }
  }

  test("dataset split: disjoint, exhaustive, and stable under corpus growth") {
    val docs = Tables.documents(spark, sf)
    val split = CorpusOps.datasetSplit(docs, "doc_id")
    // exhaustive: every row lands in exactly one split (column is total)
    assert(split.count() === docs.count())
    assert(split.filter($"split".isin("train", "val", "test")).count()
      === docs.count())
    // deterministic under re-evaluation and different partitioning
    val a = split.select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val b = CorpusOps
      .datasetSplit(docs.repartition(7), "doc_id")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(a === b)
    // STABLE under growth: the assignment of a document is a pure
    // function of its id — restricting the corpus must not move anyone
    val subset = CorpusOps
      .datasetSplit(docs.filter($"doc_id" < 100), "doc_id")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    subset.foreach { case (id, sp) => assert(a(id) === sp) }
    // permilles must sum to 1000
    val e = intercept[IllegalArgumentException] {
      CorpusOps.datasetSplit(docs, "doc_id", Seq("train" -> 900, "val" -> 50))
    }
    assert(e.getMessage.contains("sum to 1000"))
  }

  test("training order is a replay-stable per-epoch permutation") {
    val docs = Tables.documents(spark, sf)
    val a = CorpusOps.trainingOrder(docs, "doc_id")
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    // total function: every doc gets exactly one coordinate
    assert(a.length === docs.count())
    // positions within each shard are dense 1..|shard|
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length),
        s"shard $shard positions not dense")
    }
    // replay-identical with the same salt
    val b = CorpusOps.trainingOrder(docs, "doc_id")
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    // a different salt is a genuinely different permutation
    val c = CorpusOps.trainingOrder(docs, "doc_id", salt = "epoch2")
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(a.toSeq !== c.toSeq, "epoch salt must reshuffle")
    // and the doc's neighbors change: ordering is not id-correlated
    val firstShardOrder = a.filter(_._2 == a.head._2).sortBy(_._3).map(_._1)
    assert(firstShardOrder.toSeq !== firstShardOrder.sorted.toSeq,
      "hash order must not degenerate to id order")
  }

  test("vocab coverage: monotone in n_vocab, bounded by 1, counts consistent") {
    val rows = Corpus.qVocabCoverage.fn(spark, sf)
      .orderBy($"n_vocab").collect()
    assert(rows.map(_.getAs[Int]("n_vocab")).toSeq === Seq(10, 100, 1000))
    val totalTokens = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.words($"text")).as("w"))
      .count()
    var prevCovered = 0L
    var prevCoverage = 0.0
    rows.foreach { r =>
      val covered = r.getAs[Long]("covered_tokens")
      val coverage = r.getAs[Double]("coverage")
      // a bigger vocabulary can only cover more tokens
      assert(covered >= prevCovered && coverage >= prevCoverage)
      assert(covered <= totalTokens)
      assert(coverage > 0.0 && coverage <= 1.0)
      prevCovered = covered; prevCoverage = coverage
    }
    // the top-10 slice must not already saturate (Zipf head < full corpus)
    assert(rows.head.getAs[Double]("coverage") < 1.0)
  }

  test("mix budget plan: allocations sum to the budget and clip correctly") {
    val rows = Corpus.qMixBudget.fn(spark, sf).collect()
    val budget = Corpus.MixBudgetTokens
    val allocSum = rows.map(_.getAs[Long]("alloc_tokens")).sum
    // per-source rounding moves the total by at most |sources|/2 tokens
    assert(math.abs(allocSum - budget) <= rows.length,
      s"allocations sum to $allocSum, budget $budget")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val alloc = r.getAs[Long]("alloc_tokens")
      val epochs = r.getAs[Double]("epochs")
      val rate = r.getAs[Double]("clipped_rate")
      val deficit = r.getAs[Long]("deficit_tokens")
      assert(n > 0 && alloc > 0)
      assert(math.abs(epochs - alloc.toDouble / n) < 1e-3)
      assert(rate <= 1.0 + 1e-9 && rate > 0.0)
      assert(math.abs(rate - math.min(1.0, epochs)) < 1e-3)
      assert(deficit === math.max(0L, alloc - n))
      // the clip and the deficit must agree on which regime we're in
      assert((deficit > 0) === (epochs > 1.0))
    }
    // temperature flattening: smaller sources get proportionally MORE
    // than their natural share, so epochs ordering inverts size ordering
    val bySize = rows.sortBy(_.getAs[Long]("n_tokens"))
    assert(bySize.head.getAs[Double]("epochs")
      >= bySize.last.getAs[Double]("epochs") - 1e-9)
  }

  test("repeat plan realizes the mix-budget allocation per source") {
    val plan = Corpus.qRepeatPlan.fn(spark, sf).collect()
    val docTokens = Tables.documents(spark, sf)
      .select($"doc_id", $"source",
        size(graft.functions.TextFunctions.words($"text")).cast("long")
          .as("n"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val budget = Corpus.qMixBudget.fn(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("alloc_tokens"), r.getAs[Long]("n_tokens"))).toMap
    assert(plan.length === docTokens.size, "plan must be total")
    plan.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val reps = rows.map(_.getAs[Long]("n_repeats"))
      // within a source every doc repeats whole or whole+1 times
      assert(reps.max - reps.min <= 1, s"$src repeat spread")
      // realized draw concentrates on the allocation: the fractional
      // epoch is a ~Binomial(n_docs, frac) doc choice, so allow 4 sigma
      // of the heaviest doc times sqrt(n)
      val realized = rows.map { r =>
        r.getAs[Long]("n_repeats") *
          docTokens(r.getAs[Long]("doc_id"))._2
      }.sum
      val (alloc, _) = budget(src)
      val maxDoc = rows.map(r => docTokens(r.getAs[Long]("doc_id"))._2).max
      val tol = 4 * maxDoc * math.sqrt(rows.length.toDouble) + maxDoc
      assert(math.abs(realized - alloc) <= tol,
        s"$src realized $realized vs alloc $alloc (tol $tol)")
    }
    // deterministic across runs
    val again = Corpus.qRepeatPlan.fn(spark, sf).collect()
    assert(plan.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("batch padding buckets partition the corpus with correct waste math") {
    val rows = TextOps.qBatchPadding.fn(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total,
      "buckets must partition the corpus")
    rows.foreach { r =>
      val bucket = r.getAs[Long]("bucket")
      val padTo = r.getAs[Long]("pad_to")
      assert(padTo === (bucket + 1) * 16)
      // every doc in the band fits under its ceiling and above its floor
      assert(r.getAs[Long]("min_tokens") >= bucket * 16)
      assert(r.getAs[Long]("max_tokens") < padTo)
      assert(r.getAs[Long]("pad_tokens")
        === padTo * r.getAs[Long]("n_docs") - r.getAs[Long]("total_tokens"))
      val fill = r.getAs[Double]("fill_frac")
      assert(fill > 0.0 && fill <= 1.0)
    }
  }

  test("pack efficiency is consistent with the pack layout it reports on") {
    val docs = Tables.documents(spark, sf)
    val layout = CorpusOps.packLayout(docs, "doc_id", "text", "lang")
      .select($"lang", $"n_tokens", $"bin", $"span_bins")
      .as[(String, Int, Int, Int)].collect().groupBy(_._1)
    val eff = CorpusOps.packEfficiency(docs, "doc_id", "text", "lang")
      .collect()
    assert(eff.map(_.getAs[String]("lang")).toSet === layout.keySet)
    eff.foreach { r =>
      val shard = layout(r.getAs[String]("lang"))
      val capacity = r.getAs[Long]("capacity")
      val total = r.getAs[Long]("total_tokens")
      assert(r.getAs[Long]("n_docs") === shard.length)
      assert(total === shard.map(_._2.toLong).sum)
      assert(capacity === r.getAs[Long]("bins_used") * 512)
      assert(total <= capacity)
      val fill = r.getAs[Double]("fill_ratio")
      assert(fill > 0.0 && fill <= 1.0)
      assert(r.getAs[Long]("straddle_docs") === shard.count(_._4 > 1))
      assert(r.getAs[Long]("boundary_crossings")
        === shard.map(_._4 - 1L).sum)
      // bins_used covers the last touched bin exactly
      assert(r.getAs[Long]("bins_used")
        === shard.map(x => x._3 + x._4 - 1).max + 1)
    }
  }

  test("source report: conservation, share sums to 1, percentile order") {
    val got = Corpus.qSourceReport.fn(spark, sf)
      .as[(String, Long, Long, Long, Double, Double, Double, Double)]
      .collect()
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, sf)
    assert(got.map(_._2).sum === docs.count(), "doc counts must conserve")
    val totTok = docs
      .select(size(graft.functions.TextFunctions.words($"text")).as("n"))
      .agg(sum($"n")).as[Long].collect().head
    assert(got.map(_._3).sum === totTok, "token counts must conserve")
    // shares sum to ~1 (each share rounded to 4 places)
    val shareSum = got.map(_._8).sum
    assert(math.abs(shareSum - 1.0) < got.length * 1e-4 + 1e-9,
      s"tok_share sums to $shareSum")
    got.foreach { case (src, nDocs, nTok, nLangs, mean, p50, p95, share) =>
      assert(nDocs > 0 && nTok >= 0 && nLangs >= 1)
      assert(p50 <= p95 + 1e-9, s"$src p50 $p50 above p95 $p95")
      assert(mean > 0 && share >= 0.0 && share <= 1.0)
    }
  }
}
