package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-parameterized corpus-curation operators — the library surface
  * behind the oracle-gated `Corpus`/`Dedup` queries, usable on ANY
  * DataFrame (a user's own corpus table, not just the test fixtures).
  * Exposed to users via `graft.api.GraftEngine.corpus`.
  *
  * Column contract: operators may add result columns with the documented
  * names (`group_id`, `n_words`, `dup_word_frac`, `top_bigram_frac`,
  * `band`, `n_tokens`, `n_oov`, `oov_ratio`) and internally use working
  * columns prefixed `__graft_` — input DataFrames must not already carry
  * that prefix (checked, clear error) so user column names can never
  * collide with the implementation's join keys.
  *
  * Everything is deterministic by construction: sampling decisions are
  * pure per-row hash predicates, near-dup candidates come from fixed
  * MinHash permutations, and group labels are an order-independent min
  * fixpoint — the properties that make a 100 TB curation run auditable
  * and exactly reproducible.
  */
object CorpusOps {

  /** Reserved internal column prefix (see column contract above). */
  val ReservedPrefix = "__graft_"

  private def checkReserved(df: DataFrame): Unit = {
    val clash = df.columns.filter(_.startsWith(ReservedPrefix))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} use the reserved " +
        s"'$ReservedPrefix' prefix")
  }

  /** Per-stratum permille rate as a column (shared by the library filter
    * and the oracle-gated q_sample_stratified aggregate). */
  def rateColumn(stratum: Column, permille: Seq[(String, Int)],
      defaultPermille: Int): Column =
    permille
      .foldLeft(when(lit(false), 0)) { case (acc, (s, p)) =>
        acc.when(stratum === s, p)
      }
      .otherwise(defaultPermille)

  /** The salted per-row sampling hash in [0, 1000) — a pure function of
    * the id, identical in DuckDB as
    * `CAST('0x'||substr(md5('salt|'||id),1,15) AS BIGINT) % 1000`. */
  def sampleHash(id: Column, salt: String): Column =
    pmod(stableHash60(concat(lit(salt + "|"), id.cast("string"))), lit(1000))

  /** The deterministic keep-predicate behind stratified sampling:
    * sampleHash(id) < rate(stratum). */
  def keepPredicate(id: Column, stratum: Column,
      permille: Seq[(String, Int)], defaultPermille: Int,
      salt: String): Column =
    sampleHash(id, salt) < rateColumn(stratum, permille, defaultPermille)

  /** Deterministic stratified sample: keeps each row iff its hash falls
    * under its stratum's permille rate. Narrow (no shuffle, no RNG
    * state) — the same rows survive on every engine at any parallelism. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      permille: Seq[(String, Int)], defaultPermille: Int = 1000,
      salt: String = "smp"): DataFrame =
    df.filter(
      keepPredicate(col(idCol), col(stratumCol), permille, defaultPermille,
        salt))

  /** First k rows per stratum by stable-hash rank (the deterministic
    * analog of per-group reservoir sampling). The window partitions by
    * the stratum, so strata rank in parallel. Preserves the input schema.
    */
  def perStratumSample(df: DataFrame, idCol: String, stratumCol: String,
      k: Int, salt: String = "res"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    checkReserved(df)
    val rn = ReservedPrefix + "rn"
    val h = stableHash60(concat(lit(salt + "|"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(stratumCol)).orderBy(h, col(idCol))
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k)
      .drop(rn)
  }

  /** MinHash-LSH near-duplicate candidate pairs over a text column:
    * 3-word shingles → 16 fixed permutations → 4×4 banding → equi-join on
    * (band, band key). Returns (d1, d2) with d1 < d2. The equi-join on
    * band keys replaces the all-pairs product — cost is Σ|bucket|² per
    * band, never |corpus|². */
  def minhashCandidates(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val ds = df
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("w"))
      .select($"doc_id", explode(array_distinct(shingles($"w", 3))).as("s"))
    val hashed = ds.select($"doc_id", minhashBase($"s").as("h"))
    val sigCols =
      MinhashPerms.indices.map(i => min(minhashPerm($"h", i)).as(s"sig_$i"))
    val sigs = hashed.groupBy($"doc_id").agg(sigCols.head, sigCols.tail: _*)
    // Each side carries ALL four band keys so the join output can be
    // deduped by a FILTER instead of a distinct: a pair collides at
    // band j iff the keys agree there, and keeping only the row where
    // every earlier band differs emits each candidate pair exactly
    // once. The prior distinct() EXCHANGED the banded join's output —
    // harmless on a decorrelated corpus, data-quadratic inside
    // duplicate cliques, the class the r11 pHash/sampled-cap probes
    // measured as ENOSPC at x1000 (SCALE.md "pHash's third decade").
    // The filter form never shuffles a candidate row; the pair set is
    // identical, so the oracle's DISTINCT-based CTE is untouched.
    val bands = sigs
      .select(
        $"doc_id",
        array((0 until 4).map { bnd =>
          concat_ws("-", (0 until 4).map(r => col(s"sig_${bnd * 4 + r}")): _*)
        }: _*).as("bkeys"))
      .select($"doc_id", $"bkeys",
        posexplode($"bkeys").as(Seq("band", "bkey")))
    val firstBand = (0 until 4).map { j =>
      ($"a.band" === j) && (0 until j)
        .map(i => element_at($"a.bkeys", i + 1) =!=
          element_at($"b.bkeys", i + 1))
        .foldLeft(lit(true))(_ && _)
    }.reduce(_ || _)
    bands
      .as("a")
      .join(
        bands.as("b"),
        $"a.band" === $"b.band" && $"a.bkey" === $"b.bkey" &&
          $"a.doc_id" < $"b.doc_id")
      .filter(firstBand)
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
  }

  /** Dedup-group labels for every row: connected components over the
    * MinHash-LSH candidate graph ([[Dedup.connectedComponents]] — min-label
    * propagation, converges in graph-diameter rounds). Returns the input
    * id column plus `group_id` (the minimum reachable id; singletons keep
    * their own). */
  def dedupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    checkReserved(df)
    val node = ReservedPrefix + "node"
    val label = ReservedPrefix + "label"
    val labels = Dedup
      .connectedComponents(minhashCandidates(df, idCol, textCol))
      .withColumnRenamed("node", node)
      .withColumnRenamed("label", label)
    df.select(col(idCol))
      .join(labels, col(idCol) === col(node), "left")
      .select(col(idCol),
        least(coalesce(col(label), col(idCol)), col(idCol)).as("group_id"))
  }

  /** Dedup-group size histogram — the audit a dedup pipeline publishes
    * before committing the drop decision: per near-dup group SIZE, the
    * group/document counts and that band's corpus share (size 1 = unique
    * docs; the tail is what dedup removes). [[dedupGroups]] plus two
    * aggregate-sized rollups; the 1-row corpus total broadcasts back, so
    * there is no global window and no second corpus scan. */
  def dedupGroupStats(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val tot = ReservedPrefix + "tot"
    val sizes = dedupGroups(df, idCol, textCol)
      .groupBy(col("group_id"))
      .agg(count(lit(1)).as("group_size"))
    sizes
      .groupBy(col("group_size"))
      .agg(count(lit(1)).as("n_groups"))
      .crossJoin(broadcast(df.agg(count(lit(1)).as(tot))))
      .select(
        col("group_size"),
        col("n_groups"),
        (col("group_size") * col("n_groups")).as("n_docs"),
        (floor(col("group_size") * col("n_groups") * lit(10000.0) /
          col(tot) + lit(0.5)) / 10000.0).as("doc_share"))
  }

  /** Source-overlap (containment) matrix — for every ordered pair of
    * values of `groupCol` (A, B): |A ∩ B| / |A| over distinct 3-gram
    * shingle vocabularies (Broder 1997). The distinct (group, shingle)
    * stream is hash-partitioned once on the shingle and self-joined
    * there (ReusedExchange); each shingle contributes ≤ |groups|² pair
    * rows, so output is bounded by the shingle vocabulary, never the
    * corpus. */
  def sourceOverlap(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    checkReserved(df)
    val sCol = ReservedPrefix + "s"
    val w = ReservedPrefix + "w"
    val ss = df
      .select(col(groupCol), words(col(textCol)).as(w))
      .select(col(groupCol),
        explode(array_distinct(shingles(col(w), 3))).as(sCol))
      .distinct()
      .repartition(col(sCol))
    val cnt = ss.groupBy(col(groupCol)).agg(count(lit(1)).as("n_a"))
    ss.select(col(groupCol).as("src_a"), col(sCol))
      .join(ss.select(col(groupCol).as("src_b"), col(sCol)), sCol)
      .filter(col("src_a") =!= col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(cnt.withColumnRenamed(groupCol, "src_a")), "src_a")
      .select(
        col("src_a"), col("src_b"), col("n_a"), col("n_common"),
        (floor(col("n_common") * lit(10000.0) / col("n_a") + lit(0.5)) /
          10000.0).as("containment"))
  }

  /** Canonical-document selection per dedup group — the step after
    * [[dedupGroups]] in a real pipeline: which duplicate do we KEEP?
    * The canonical member is the one maximizing `scoreCol` (ties break
    * to the smallest id, so the choice is total and deterministic).
    * Returns every input row with `group_id`, `canonical_doc`, a `keep`
    * flag, and `n_members`.
    *
    * Scale shape: two hash aggregates and two joins, all keyed on
    * `group_id` — the exchange is planted once and reused. The
    * max-score/min-id selection is expressed as aggregate + join-back
    * (not `max_by` over a struct) so the exact same arithmetic runs on
    * any ANSI engine. */
  def canonicalPerGroup(df: DataFrame, idCol: String, textCol: String,
      scoreCol: String): DataFrame = {
    checkReserved(df)
    val mx = ReservedPrefix + "mx"
    val scored = dedupGroups(df, idCol, textCol)
      .join(df.select(col(idCol), col(scoreCol)), Seq(idCol))
    val stat = scored
      .groupBy(col("group_id"))
      .agg(max(col(scoreCol)).as(mx), count(lit(1)).as("n_members"))
    val canon = scored
      .join(stat.select(col("group_id"), col(mx)), Seq("group_id"))
      .filter(col(scoreCol) === col(mx))
      .groupBy(col("group_id"))
      .agg(min(col(idCol)).as("canonical_doc"))
    scored
      .join(canon, Seq("group_id"))
      .join(stat.select(col("group_id"), col("n_members")), Seq("group_id"))
      .select(col(idCol), col("group_id"), col("canonical_doc"),
        (col(idCol) === col("canonical_doc")).as("keep"), col("n_members"))
  }

  /** Context-window packing layout (q_pack_sequences): per shard, a
    * running token prefix-sum assigns each document a (bin, offset,
    * span_bins) coordinate in a stream of fixed `binTokens` windows.
    * The window partitions by the shard column, so shards pack in
    * parallel — the deterministic scalable alternative to a global
    * sequential packer. */
  def packLayout(df: DataFrame, idCol: String, textCol: String,
      shardCol: String, binTokens: Int = 512): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    checkReserved(df)
    val w = Window
      .partitionBy(col(shardCol))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(shardCol),
        size(words(col(textCol))).as("n_tokens"))
      .withColumn("start_tok",
        (sum(col("n_tokens")).over(w) - col("n_tokens")).cast("long"))
      .select(
        col(idCol), col(shardCol), col("n_tokens"),
        expr(s"start_tok div $binTokens").cast("int").as("bin"),
        (col("start_tok") % binTokens).cast("int").as("offset"),
        (expr(s"(start_tok + n_tokens - 1) div $binTokens")
          - expr(s"start_tok div $binTokens") + 1).cast("int")
          .as("span_bins"))
  }

  /** Packing-efficiency report over [[packLayout]]: per shard, the bins
    * used, fill ratio against capacity, and how many documents straddle
    * a window boundary (the rows a training loader must split across
    * contexts). One |shards|-row aggregate over the layout — the
    * measurement a pipeline watches to pick its context length. The
    * fill ratio uses the tie-safe floor(x·10⁴+0.5) rounding. */
  def packEfficiency(df: DataFrame, idCol: String, textCol: String,
      shardCol: String, binTokens: Int = 512): DataFrame = {
    val lastBin = expr(s"(start_tok + n_tokens - 1) div $binTokens")
    val firstBin = expr(s"start_tok div $binTokens")
    val layout = df.select(col(idCol), col(shardCol),
        size(words(col(textCol))).as("n_tokens"))
      .withColumn("start_tok", {
        import org.apache.spark.sql.expressions.Window
        val w = Window
          .partitionBy(col(shardCol))
          .orderBy(col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        (sum(col("n_tokens")).over(w) - col("n_tokens")).cast("long")
      })
    val bins = (max(lastBin) + 1).cast("long")
    layout
      .groupBy(col(shardCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("total_tokens"),
        bins.as("bins_used"),
        (bins * binTokens).as("capacity"),
        (floor(sum(col("n_tokens")) * lit(10000.0) /
          (bins * binTokens) + lit(0.5)) / 10000.0).as("fill_ratio"),
        count(when(lastBin > firstBin, 1)).as("straddle_docs"),
        sum(lastBin - firstBin).cast("long").as("boundary_crossings"))
  }

  /** The small stopword set the Gopher rule-filter requires documents to
    * draw from (Rae et al. 2021 use a similar ~8-word list; natural text
    * nearly always contains ≥2 of these, machine gibberish rarely). */
  val GopherStopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")

  /** Gopher-style composite quality rules (Rae et al. 2021 §A1.1, C4
    * family): per document, five independent pass/fail rules and their
    * conjunction —
    *  - `r_len`: word count within [minWords, maxWords];
    *  - `r_wordlen`: mean word length within [3, 10] characters;
    *  - `r_symbols`: symbol-to-word ratio below 10%;
    *  - `r_stopwords`: at least 2 distinct [[GopherStopwords]] present;
    *  - `r_repetition`: distinct-word fraction at least 40%.
    * Every rule is evaluated in INTEGER arithmetic (e.g. mean word
    * length ∈ [3,10] as `3·n ≤ Σlen ≤ 10·n`), so no float boundary can
    * flip a verdict between engines. Pure per-row projection — scoring
    * fuses into the scan's codegen span, no shuffle, no model table. */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 25, maxWords: Int = 1000): DataFrame = {
    checkReserved(df)
    val w = ReservedPrefix + "w"
    val stopArr = array(GopherStopwords.map(lit): _*)
    val withW = df.select(col(idCol), col(textCol),
      words(col(textCol)).as(w))
    val n = size(col(w))
    val sl = aggregate(transform(col(w), x => length(x)), lit(0),
      (acc, x) => acc + x)
    val sym = size(expr(
      s"regexp_extract_all($textCol, '[^\\\\w\\\\s]', 0)"))
    val nstop = size(filter(array_distinct(col(w)),
      x => array_contains(stopArr, x)))
    val nd = size(array_distinct(col(w)))
    val rLen = n.between(minWords, maxWords)
    val rWordlen = sl >= n * 3 && sl <= n * 10
    val rSymbols = sym * 10 < n
    val rStopwords = nstop >= 2
    val rRepetition = nd * 5 >= n * 2
    withW.select(
      col(idCol),
      rLen.as("r_len"),
      rWordlen.as("r_wordlen"),
      rSymbols.as("r_symbols"),
      rStopwords.as("r_stopwords"),
      rRepetition.as("r_repetition"),
      (rLen && rWordlen && rSymbols && rStopwords && rRepetition)
        .as("pass"))
  }

  /** Winnowing fingerprint sketch (Schleimer, Wilkerson, Aiken 2003):
    * 3-word shingle hashes, sliding window of `windowSize` positions,
    * each window selecting its minimum (hash, position) pair (leftmost
    * tie-break), distinct selections = the sketch. Returns
    * (idCol, sel_pos, h). Documents winnow in parallel — the window
    * partitions by the id; positions cap at 2²⁰ words per document
    * (the packed-key construction). */
  def winnowSketch(df: DataFrame, idCol: String, textCol: String,
      windowSize: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    checkReserved(df)
    val sh = df
      .select(col(idCol), words(col(textCol)).as("w"))
      .filter(size(col("w")) >= 3)
      .select(col(idCol), (size(col("w")) - 2).cast("long").as("n_sh"),
        posexplode(shingles(col("w"), 3)).as(Seq("pos0", "sgl")))
      .select(col(idCol), col("n_sh"),
        (col("pos0") + 1).cast("long").as("pos"),
        (pmod(stableHash60(col("sgl")), lit(1099511627776L)) * 1048576L
          + col("pos0") + 1).as("k"))
    val w = Window
      .partitionBy(col(idCol))
      .orderBy(col("pos"))
      .rowsBetween(Window.currentRow, windowSize - 1)
    sh.withColumn("mk", min(col("k")).over(w))
      .filter(col("pos") <= col("n_sh") - (windowSize - 1))
      .select(col(idCol), expr("mk div 1048576").as("h"),
        (col("mk") % 1048576L).as("sel_pos"))
      .distinct()
      .select(col(idCol), col("sel_pos"), col("h"))
  }

  /** Gopher-style repetition metrics per row: word count, duplicate-word
    * fraction (1 − type-token ratio) and the token share of the single
    * most-repeated bigram, with a banded verdict on ROUNDED margins (an
    * ulp of engine difference can never flip a boundary document). */
  def repetitionMetrics(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    checkReserved(df)
    val w = ReservedPrefix + "w"
    val b = ReservedPrefix + "b"
    val c = ReservedPrefix + "c"
    val mx = ReservedPrefix + "mx"
    val bdoc = ReservedPrefix + "bdoc"
    val wC = col(w)
    val t = df.select(col(idCol), words(col(textCol)).as(w))
    val bgMax = t
      .select(col(idCol), explode(shingles(wC, 2)).as(b))
      .groupBy(col(idCol), col(b))
      .agg(count(lit(1)).as(c))
      .groupBy(col(idCol))
      .agg(max(col(c)).as(mx))
      .withColumnRenamed(idCol, bdoc)
    val dupFrac =
      round(lit(1.0) - size(array_distinct(wC)) * lit(1.0) / size(wC), 4)
    val bigramFrac = round(coalesce(col(mx), lit(0L)) * lit(2.0) / size(wC), 4)
    t.join(bgMax, col(idCol) === col(bdoc), "left")
      .select(
        col(idCol),
        size(wC).as("n_words"),
        dupFrac.as("dup_word_frac"),
        bigramFrac.as("top_bigram_frac"),
        when(dupFrac > 0.85 || bigramFrac > 0.5, "repetitive")
          .otherwise("ok")
          .as("band"))
  }

  /** Hashed linear quality score per row (the fastText-style recipe
    * behind q_quality_classifier): token t carries hash-derived weight
    * (stable_hash60("qw|"+t) % 2001 − 1000)/1000, the logit is the
    * token-mean, the score its logistic squash, `keep` the ≥0.5 gate.
    * No model table exists — scoring is a single narrow pass plus one
    * per-row aggregate. Returns (idCol, n_tokens, logit, score, keep). */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    checkReserved(df)
    val tokCol = ReservedPrefix + "token"
    val n = ReservedPrefix + "n"
    val zsum = ReservedPrefix + "zsum"
    val weight =
      stableHash60(concat(lit("qw|"), col(tokCol))) % 2001L - 1000L
    val logit = floor(col(zsum) * lit(10.0) / col(n) + 0.5) / 10000.0
    val score = lit(1.0) / (lit(1.0) + exp(-(col(zsum) / (lit(1000.0) * col(n)))))
    df.select(col(idCol), explode(words(col(textCol))).as(tokCol))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as(n), sum(weight).as(zsum))
      .select(
        col(idCol),
        col(n).cast("int").as("n_tokens"),
        logit.as("logit"),
        round(score, 4).as("score"),
        when(score >= 0.5, 1).otherwise(0).cast("int").as("keep"))
  }

  /** DSIR-style hashed importance weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): unigram
    * bag-of-words models for the target slice and the raw corpus over
    * `buckets` hashed feature buckets; each document scores the
    * length-normalized log importance
    * avg_t [ln p_target(b(t)) − ln p_raw(b(t))] with add-1 smoothing,
    * and the top-k by (rounded score, id) are flagged `selected` — the
    * deterministic stand-in for DSIR's Gumbel-top-k resample.
    *
    * Scale (100 TB): both feature models live in ONE `buckets`-row table
    * (raw + target counts in the same aggregate — a single count-shuffle,
    * not two), which BROADCASTs back into the token stream; totals are an
    * aggregate over that table, not a second corpus pass. The per-doc
    * aggregate shuffles once on the id; selection is ORDER BY + LIMIT
    * (per-partition heaps, no global sort) and the k-row winner set
    * broadcasts into the flag join. No corpus-sized state anywhere.
    * Returns (idCol, n_tokens, log_importance, selected). */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 1024, topK: Int = 100,
      salt: String = "ds"): DataFrame = {
    checkReserved(df)
    val tok = ReservedPrefix + "token"
    val b = ReservedPrefix + "b"
    val tgt = ReservedPrefix + "tgt"
    val lw = ReservedPrefix + "lw"
    val selId = ReservedPrefix + "sel_id"
    val hb = df
      .select(col(idCol), isTarget.as(tgt),
        explode(words(col(textCol))).as(tok))
      .select(col(idCol), col(tgt),
        (stableHash60(concat(lit(salt + "|"), col(tok))) %
          buckets.toLong).as(b))
    // one bucket table carries BOTH models: cr = raw count, ct = target
    val bkt = hb
      .groupBy(col(b))
      .agg(
        count(lit(1)).as("cr"),
        sum(when(col(tgt), 1L).otherwise(0L)).as("ct"))
    val tot = bkt.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val w = bkt
      .crossJoin(broadcast(tot))
      .select(col(b),
        (log((col("ct") + 1.0) / (col("nt") + buckets.toDouble)) -
          log((col("cr") + 1.0) / (col("nr") + buckets.toDouble))).as(lw))
    val perDoc = hb
      .join(broadcast(w), b)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        // + 0.0: a doc whose buckets balance target vs raw has avg(lw)
        // ±1e-17 by summation order; DuckDB's round() keeps the sign
        // (−0.0) while Spark emits +0.0 — the registry-wide signed-zero
        // fence (caught live at sf0.1 by check_oracle's signbit gate)
        (round(avg(col(lw)), 4) + lit(0.0)).as("log_importance"))
    val top = perDoc
      .orderBy(col("log_importance").desc, col(idCol))
      .limit(topK)
      .select(col(idCol).as(selId))
    perDoc
      .join(broadcast(top), col(idCol) === col(selId), "left")
      .select(col(idCol), col("n_tokens"), col("log_importance"),
        when(col(selId).isNotNull, 1).otherwise(0).cast("int").as("selected"))
  }

  /** Per-group distribution drift: KL(group ‖ corpus) over `buckets`
    * hashed unigram buckets with add-1 smoothing — the corpus-audit pass
    * that catches a source whose token distribution has drifted from the
    * mix (a scraper gone wrong, a mislabeled dump) before it trains.
    * KL is summed over the FULL bucket domain (unseen buckets contribute
    * their smoothed mass), so the score is a true divergence, not a
    * seen-bucket approximation.
    *
    * Scale (100 TB): the ONLY corpus-scale operation is the one
    * count-shuffle to the (group, bucket) table; group totals and the
    * corpus model derive from that table (≤ |groups|·B rows), the
    * B-row domain is generated — never scanned — and every subsequent
    * join is broadcast. Returns (groupCol, n_tokens, n_buckets,
    * kl_to_corpus). */
  def sourceDivergence(df: DataFrame, groupCol: String, textCol: String,
      buckets: Int = 1024, salt: String = "ds"): DataFrame = {
    checkReserved(df)
    val s = df.sparkSession
    val tok = ReservedPrefix + "token"
    val b = ReservedPrefix + "b"
    val sb = df
      .select(col(groupCol), explode(words(col(textCol))).as(tok))
      .select(col(groupCol),
        (stableHash60(concat(lit(salt + "|"), col(tok))) %
          buckets.toLong).as(b))
      .groupBy(col(groupCol), col(b))
      .agg(count(lit(1)).as("c"))
    // everything below is ≤ |groups|·B rows — derived, not re-scanned
    val stot = sb.groupBy(col(groupCol)).agg(sum(col("c")).as("ns"))
    val cb = sb.groupBy(col(b)).agg(sum(col("c")).as("cbn"))
    val tot = cb.agg(sum(col("cbn")).as("n"))
    val dom = stot.crossJoin(
      broadcast(s.range(buckets).toDF(b)))
    dom
      .join(broadcast(sb), Seq(groupCol, b), "left")
      .join(broadcast(cb), Seq(b), "left")
      .crossJoin(broadcast(tot))
      .select(col(groupCol), col("ns"), col("c"),
        ((coalesce(col("c"), lit(0L)) + 1.0) /
          (col("ns") + buckets.toDouble)).as("q"),
        ((coalesce(col("cbn"), lit(0L)) + 1.0) /
          (col("n") + buckets.toDouble)).as("p"))
      .groupBy(col(groupCol))
      .agg(
        first(col("ns")).as("n_tokens"),
        count(col("c")).as("n_buckets"),
        (round(sum(col("q") * log(col("q") / col("p"))), 4) + 0.0)
          .as("kl_to_corpus"))
  }

  /** Pairwise Jensen-Shannon divergence between the groups' hashed-
    * unigram distributions — the SYMMETRIC, bounded ([0, ln 2]) partner
    * of [[sourceDivergence]]'s KL-to-corpus: for every unordered group
    * pair, JSD(P,Q) = ½ Σ p·ln(2p/(p+q)) + ½ Σ q·ln(2q/(p+q)) over the
    * same add-one-smoothed `buckets`-bucket token distributions (same
    * salt, so the two reports share hashing). The mixing/contamination
    * audit reads this as a distance matrix: near-0 pairs are the same
    * distribution crawled twice, near-ln 2 pairs are disjoint registers.
    *
    * Scale: one corpus-scale token count-shuffle to |groups|·buckets
    * rows; the pair join runs on that aggregate keyed by bucket —
    * ≤ |groups|²·buckets/2 rows, corpus-independent. */
  def sourceJsd(df: DataFrame, groupCol: String, textCol: String,
      buckets: Int = 1024, salt: String = "ds"): DataFrame = {
    checkReserved(df)
    val s = df.sparkSession
    val tok = ReservedPrefix + "token"
    val b = ReservedPrefix + "b"
    val sb = df
      .select(col(groupCol), explode(words(col(textCol))).as(tok))
      .select(col(groupCol),
        (stableHash60(concat(lit(salt + "|"), col(tok))) %
          buckets.toLong).as(b))
      .groupBy(col(groupCol), col(b))
      .agg(count(lit(1)).as("c"))
    val stot = sb.groupBy(col(groupCol)).agg(sum(col("c")).as("ns"))
    // smoothed distribution on the FULL bucket domain per group —
    // |groups|·buckets rows, all derived from the one token shuffle
    val dom = stot
      .crossJoin(broadcast(s.range(buckets).toDF(b)))
      .join(broadcast(sb), Seq(groupCol, b), "left")
      .select(col(groupCol), col(b),
        ((coalesce(col("c"), lit(0L)) + 1.0) /
          (col("ns") + buckets.toDouble)).as("p"))
    val right = dom.select(col(groupCol).as("src_b"), col(b),
      col("p").as("q"))
    dom
      .select(col(groupCol).as("src_a"), col(b), col("p"))
      .join(right, Seq(b))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg((round(
        (sum(col("p") * log(lit(2.0) * col("p") / (col("p") + col("q")))) +
          sum(col("q") * log(lit(2.0) * col("q") / (col("p") + col("q")))))
          * 0.5, 4) + 0.0).as("jsd"))
      .select(col("src_a"), col("src_b"), col("jsd"),
        round(col("jsd") / math.log(2.0), 4).as("jsd_bits"))
  }

  /** Deterministic training-order shuffle: every row gets a (shard, pos)
    * coordinate from a salted hash permutation — the reproducible "global
    * shuffle" a training run needs (change the salt per epoch for a fresh
    * permutation, replay the same salt to recover byte-identical order).
    * One shuffle on the shard key; each shard orders its own n/nShards
    * slice in parallel (no global sort, no single-partition window).
    * Returns (idCol, shard, pos). */
  def trainingOrder(df: DataFrame, idCol: String, nShards: Int = 16,
      salt: String = "ord"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    checkReserved(df)
    val h = ReservedPrefix + "h"
    val w = Window.partitionBy(col("shard")).orderBy(col(h), col(idCol))
    df.select(col(idCol),
        stableHash60(concat(lit(salt + "|"), col(idCol).cast("string"))).as(h))
      .withColumn("shard", pmod(col(h), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Overlapping sliding-window retrieval chunks (q_rag_chunks): windows
    * of `size` words every `stride`, tail chunks kept. Narrow — each
    * task chunks its own split. Returns (idCol, chunk_idx, start_word,
    * n_chunk_words, chunk_text). */
  def ragChunks(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 8, stride: Int = 4): DataFrame = {
    checkReserved(df)
    val w = ReservedPrefix + "w"
    val x = ReservedPrefix + "x"
    df.select(col(idCol), words(col(textCol)).as(w))
      .select(col(idCol),
        explode(
          transform(
            sequence(lit(1), size(col(w)), lit(stride)),
            i => struct(i.as("start"), slice(col(w), i, lit(chunkSize)).as("cw"))))
          .as(x))
      .select(
        col(idCol),
        ((col(s"$x.start") - 1) / stride).cast("int").as("chunk_idx"),
        col(s"$x.start").cast("int").as("start_word"),
        size(col(s"$x.cw")).as("n_chunk_words"),
        array_join(col(s"$x.cw"), " ").as("chunk_text"))
  }

  /** Global 1..n rank over an already-bounded relation WITHOUT a
    * single-partition window. Spark 4's `EliminateWindowPartitions` folds
    * a literal partition key away, so the old `partitionBy(lit(0))` trick
    * neither silences nor bounds WindowExec's all-to-one funnel anymore.
    * Instead: broadcast self-join counting strictly-smaller keys — O(n²)
    * comparisons but fully partition-parallel and exchange-free on the
    * probe side. Only for post-limit / aggregate-sized relations
    * (n ≲ 10⁴). `orderKey` must be a TOTAL order (tie-broken), or equal
    * keys collapse onto the same rank. */
  private[graft] def boundedRank(df: DataFrame, orderKey: Column,
      rn: String): DataFrame = {
    val k1 = ReservedPrefix + "k1"
    val k2 = ReservedPrefix + "k2"
    val withKey = df.withColumn(k1, orderKey)
    val keys = withKey.select(col(k1))
    val ranks = keys
      .join(broadcast(keys.select(col(k1).as(k2))), col(k2) < col(k1), "left")
      .groupBy(col(k1))
      .agg((count(col(k2)) + 1).cast("int").as(rn))
    withKey.join(broadcast(ranks), Seq(k1)).drop(k1)
  }

  /** Deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis, q_weighted_sample): row i gets key
    * −ln(u_i)/w_i from a hash-derived uniform; the k smallest keys win,
    * so probability scales with the weight column. ORDER BY key LIMIT k
    * lowers to per-partition heaps — no global sort — and the final
    * 1..k rank runs over the k surviving rows via [[boundedRank]].
    * Returns (rn, idCol, weight, sample_key) ranked 1..k. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "ws"): DataFrame = {
    checkReserved(df)
    val w = ReservedPrefix + "w"
    val key = ReservedPrefix + "k"
    val u = (stableHash60(concat(lit(salt + "|"), col(idCol).cast("string")))
      % 1000000L + lit(0.5)) / lit(1000000.0)
    val winners = df
      .select(col(idCol), greatest(col(weightCol), lit(1L)).as(w),
        round(-log(u) / greatest(col(weightCol), lit(1L)), 8).as(key))
      .orderBy(col(key), col(idCol))
      .limit(k)
    boundedRank(winners, struct(col(key), col(idCol)), "rn")
      .select(col("rn"), col(idCol), col(w).cast("long").as("weight"),
        col(key).as("sample_key"))
  }

  /** Substring (span-level) dedup statistics (q_substring_dedup): every
    * overlapping spanK-token window is hashed; windows whose hash occurs
    * ≥2 times corpus-wide are duplicated spans, and per row the merged-
    * interval token coverage is computed with a running-max window. Only
    * (id, pos, hash64) ever shuffles. Returns (idCol, n_windows,
    * n_dup_windows, dup_tokens, dup_token_frac). */
  def spanDedupStats(df: DataFrame, idCol: String, textCol: String,
      spanK: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    checkReserved(df)
    val w = ReservedPrefix + "w"
    val nw = ReservedPrefix + "nw"
    val p0 = ReservedPrefix + "p0"
    val sp = ReservedPrefix + "sp"
    val pos = ReservedPrefix + "pos"
    val h = ReservedPrefix + "h"
    val isDup = ReservedPrefix + "dup"
    val prevEnd = ReservedPrefix + "prev"
    val wins = df
      .select(col(idCol), words(col(textCol)).as(w))
      .filter(size(col(w)) >= spanK)
      .select(col(idCol), size(col(w)).as(nw),
        posexplode(shingles(col(w), spanK)).as(Seq(p0, sp)))
      .select(col(idCol), col(nw), (col(p0) + 1).as(pos),
        stableHash60(col(sp)).as(h))
    val wCnt = Window.partitionBy(col(h))
    val wCov = Window.partitionBy(col(idCol)).orderBy(col(pos))
      .rowsBetween(Window.unboundedPreceding, -1)
    val contribution = when(col(isDup) === 1,
      greatest(
        lit(0),
        col(pos) + lit(spanK - 1) -
          greatest(coalesce(col(prevEnd), lit(0)), col(pos) - 1)))
      .otherwise(0)
    wins
      .withColumn(isDup,
        when(count(lit(1)).over(wCnt) >= 2, 1).otherwise(0))
      .withColumn(prevEnd,
        max(when(col(isDup) === 1, col(pos) + lit(spanK - 1))).over(wCov))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_windows"),
        sum(col(isDup)).as("n_dup_windows"),
        sum(contribution).as("dup_tokens"),
        round(sum(contribution) * lit(1.0) / first(col(nw)), 4)
          .as("dup_token_frac"))
  }

  /** Deterministic dataset split (train/val/test): each row's salted
    * per-id hash in [0, 1000) falls into one of the cumulative permille
    * bands — a pure per-row predicate, so the split is disjoint,
    * exhaustive, reproducible on any engine at any parallelism, and
    * STABLE under corpus growth (a new document never moves an old one
    * between splits, unlike ntile/row_number splits). Narrow — no
    * shuffle. `splits` are (name, permille) with permilles summing to
    * 1000. Adds a `split` column. */
  def datasetSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Int)] = Seq("train" -> 980, "val" -> 10,
        "test" -> 10),
      salt: String = "spl"): DataFrame = {
    checkReserved(df)
    require(splits.map(_._2).sum == 1000,
      s"split permilles must sum to 1000: $splits")
    val h = sampleHash(col(idCol), salt)
    val cumulative = splits.scanLeft(("", 0)) { case ((_, acc), (n, p)) =>
      (n, acc + p)
    }.tail
    val expr = cumulative.init.foldLeft(when(lit(false), "")) {
      case (acc, (name, cum)) => acc.when(h < cum, name)
    }.otherwise(cumulative.last._1)
    df.withColumn("split", expr)
  }

  /** Content-defined chunking dedup statistics (q_cdc_dedup): gear-hash
    * chunking at word granularity — a chunk boundary falls after any word
    * whose stable hash ≡ 0 mod `divisor` (mean chunk ≈ divisor words), so
    * boundaries depend only on local content and an edit re-synchronizes
    * at the next boundary instead of shifting every later chunk (the LBFS
    * / FastCDC property fixed-width chunking lacks; spec-asserted).
    * Returns per row: (idCol, n_chunks, n_dup_chunks, chars_saved) where
    * a dup chunk is any whose text already occurred (by (id, chunk-pos)
    * order) anywhere in the corpus. The boundary decision is a pure
    * projection; the chunk-assembly window is per-document; the only
    * corpus-wide exchange ranks one row per CHUNK (~1/divisor of the
    * token stream). */
  /** Content-defined chunk decomposition (the unit [[cdcDedupStats]]
    * ranks): per row, the (chunk index, chunk text) list under gear-hash
    * word boundaries (boundary after any word with stable hash ≡ 0 mod
    * `divisor`). Returns (idCol, chunk_idx, chunk_text). Boundary
    * decisions are a pure projection; assembly is a per-document window. */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      divisor: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    checkReserved(df)
    val pos = ReservedPrefix + "pos"
    val word = ReservedPrefix + "word"
    val cut = ReservedPrefix + "cut"
    val wRun = Window.partitionBy(col(idCol)).orderBy(col(pos))
      .rowsBetween(Window.unboundedPreceding, -1)
    df
      .select(col(idCol), posexplode(words(col(textCol))).as(Seq(pos, word)))
      .withColumn(cut,
        when(stableHash60(col(word)) % divisor === 0, 1L).otherwise(0L))
      .withColumn("chunk_idx", coalesce(sum(col(cut)).over(wRun), lit(0L)))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(
        // collect in document order: (pos, word) structs sort by pos
        array_join(
          transform(array_sort(collect_list(struct(col(pos), col(word)))),
            x => x.getField(word)),
          " ").as("chunk_text"))
  }

  def cdcDedupStats(df: DataFrame, idCol: String, textCol: String,
      divisor: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val occ = ReservedPrefix + "occ"
    val wOcc = Window.partitionBy(md5(col("chunk_text")))
      .orderBy(col(idCol), col("chunk_idx"))
    cdcChunks(df, idCol, textCol, divisor)
      .withColumn(occ, row_number().over(wOcc))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col(occ) > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(when(col(occ) > 1, length(col("chunk_text"))).otherwise(0L))
          .as("chars_saved"))
  }

  /** Out-of-vocabulary statistics per row against the corpus's own top-V
    * vocabulary (count-desc, word-asc tie-break). The V-row vocabulary
    * broadcasts to the token stream; the only shuffles are the wordcount
    * and the per-doc reduce. */
  def oovStats(df: DataFrame, idCol: String, textCol: String,
      topV: Int): DataFrame = {
    checkReserved(df)
    val word = ReservedPrefix + "word"
    val vword = ReservedPrefix + "vword"
    val cnt = ReservedPrefix + "c"
    val tok = df.select(col(idCol), explode(words(col(textCol))).as(word))
    val vocab = tok
      .groupBy(col(word))
      .agg(count(lit(1)).as(cnt))
      .orderBy(col(cnt).desc, col(word))
      .limit(topV)
      .select(col(word).as(vword))
    tok
      .join(broadcast(vocab), col(word) === col(vword), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when(col(vword).isNull, 1)).as("n_oov"))
      .select(
        col(idCol), col("n_tokens"), col("n_oov"),
        round(col("n_oov") * lit(1.0) / col("n_tokens"), 4).as("oov_ratio"))
  }
}
