package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between raw ingest and tokenized-example writing: deterministic
  * stratified sampling, per-stratum fixed-k sampling, source-mixing
  * weights, vocabulary-coverage (OOV) measurement, TF-IDF keyword
  * extraction, and Gopher-style repetition filtering.
  *
  * Scale notes (100 TB):
  *  - sampling decisions are pure per-row hash predicates (no shuffle, no
  *    driver state, reproducible across re-runs and engines — the property
  *    an auditable data pipeline needs);
  *  - per-stratum k-sampling windows partition by the stratum key, so
  *    strata parallelize across the cluster;
  *  - mixing weights aggregate to |sources| rows before any wide op;
  *  - OOV/TF-IDF join token streams against a small top-V vocabulary /
  *    document-frequency relation — broadcast, never shuffled-by-token.
  */
object Corpus {

  /** Per-language sampling rates in permille (en is downsampled hardest,
    * the usual rebalancing move when one language dominates a crawl). */
  val SampleRates: Seq[(String, Int)] =
    Seq("en" -> 300, "fr" -> 800, "es" -> 700, "de" -> 900, "zh" -> 500)

  private[operators] val rateSql =
    SampleRates.map { case (l, p) => s"WHEN '$l' THEN $p" }.mkString(" ")

  /** Deterministic stratified sampling: keep a document iff
    * stableHash60('smp|' || doc_id) mod 1000 < rate(lang). The decision is
    * a pure function of the row — no RNG state, no seed plumbing — so the
    * same document is kept in every re-run, on every engine, at any
    * parallelism. Emits per-language totals plus an id-sum checksum so the
    * oracle verifies the exact membership, not just the counts. */
  val qSampleStratified = QueryDef.sql(
    "q_sample_stratified",
    s"""WITH t AS (
       |  SELECT lang, doc_id,
       |         CASE lang $rateSql ELSE 1000 END AS permille,
       |         CAST(concat('0x', substr(md5('smp|' || doc_id), 1, 15))
       |              AS BIGINT) % 1000 AS h
       |  FROM documents)
       |SELECT lang,
       |       CAST(any_value(permille) AS INT)             AS permille,
       |       count(*)                                     AS n_total,
       |       count(*) FILTER (WHERE h < permille)         AS n_sampled,
       |       CAST(coalesce(sum(doc_id) FILTER (WHERE h < permille), 0)
       |            AS BIGINT)                              AS id_checksum,
       |       round(count(*) FILTER (WHERE h < permille) * 1.0 / count(*), 4)
       |                                                    AS realized_rate
       |FROM t GROUP BY lang
       |ORDER BY lang""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    // the SAME rate/hash builders the library filter
    // (CorpusOps.stratifiedSample) composes — gate and API cannot drift
    val permille = CorpusOps.rateColumn($"lang", SampleRates, 1000)
    val h = CorpusOps.sampleHash($"doc_id", "smp")
    Tables
      .documents(s, d)
      .select($"lang", $"doc_id", permille.as("permille"), h.as("h"))
      .groupBy($"lang")
      .agg(
        first($"permille").as("permille"),
        count(lit(1)).as("n_total"),
        count(when($"h" < $"permille", 1)).as("n_sampled"),
        coalesce(sum(when($"h" < $"permille", $"doc_id")), lit(0L))
          .as("id_checksum"),
        round(count(when($"h" < $"permille", 1)) * lit(1.0) / count(lit(1)), 4)
          .as("realized_rate"))
      .orderBy($"lang")
  }

  /** Fixed-k-per-stratum sampling (the deterministic analog of per-group
    * reservoir sampling): rank documents inside each language by a stable
    * hash and keep the first k. The window partitions by the stratum key,
    * so every stratum ranks in parallel — no global sort, no single-task
    * funnel. */
  val qSamplePerStratumK = QueryDef.sql(
    "q_sample_per_stratum_k",
    """WITH t AS (
      |  SELECT doc_id, lang,
      |         row_number() OVER (
      |           PARTITION BY lang
      |           ORDER BY CAST(concat('0x', substr(md5('res|' || doc_id), 1, 15))
      |                    AS BIGINT), doc_id) AS rn
      |  FROM documents)
      |SELECT doc_id, lang, CAST(rn AS INT) AS rn
      |FROM t WHERE rn <= 20
      |ORDER BY lang, rn""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val h = stableHash60(concat(lit("res|"), $"doc_id".cast("string")))
    val w = Window.partitionBy($"lang").orderBy(h, $"doc_id")
    Tables
      .documents(s, d)
      .select($"doc_id", $"lang", row_number().over(w).as("rn"))
      .filter($"rn" <= 20)
      .orderBy($"lang", $"rn")
  }

  /** Source-mixing weights: given a uniform target share over sources,
    * derive each source's natural token share, its up/down-weighting
    * factor, and the epochs + within-epoch sampling rate that realize the
    * factor (the standard "repeat small high-quality sources, subsample
    * the crawl" recipe). Aggregates to |sources| rows before the only
    * wide op, so the weight table is driver-broadcastable at any corpus
    * size. */
  val qMixSources = QueryDef.sql(
    "q_mix_sources",
    """WITH per_src AS (
      |  SELECT source,
      |         count(*) AS n_docs,
      |         CAST(sum(len(string_split_regex(trim(text), ' +'))) AS BIGINT)
      |           AS n_tokens
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |               count(*) AS n_sources FROM per_src)
      |SELECT source, n_docs, n_tokens,
      |       round(n_tokens * 1.0 / total_tokens, 4)  AS natural_share,
      |       round(1.0 / n_sources, 4)                AS target_share,
      |       round(total_tokens * 1.0 / (n_sources * n_tokens), 4) AS weight,
      |       CAST(ceil(total_tokens * 1.0 / (n_sources * n_tokens)) AS INT)
      |                                                AS epochs
      |FROM per_src CROSS JOIN tot
      |ORDER BY source""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val perSrc = Tables
      .documents(s, d)
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(words($"text")).cast("long")).as("n_tokens"))
    val tot = perSrc.agg(
      sum($"n_tokens").as("total_tokens"),
      count(lit(1)).as("n_sources"))
    val weight = $"total_tokens" * lit(1.0) / ($"n_sources" * $"n_tokens")
    perSrc
      .crossJoin(broadcast(tot))
      .select(
        $"source", $"n_docs", $"n_tokens",
        round($"n_tokens" * lit(1.0) / $"total_tokens", 4).as("natural_share"),
        round(lit(1.0) / $"n_sources", 4).as("target_share"),
        round(weight, 4).as("weight"),
        ceil(weight).cast("int").as("epochs"))
      .orderBy($"source")
  }

  /** Vocabulary size for OOV measurement (top-V corpus words). */
  val VocabTopV = 30

  /** Vocabulary coverage: build the top-V corpus vocabulary (count-desc,
    * word-asc tie-break — fully deterministic), then measure each
    * document's out-of-vocabulary token count and ratio. The vocabulary
    * is V rows → broadcast to the token stream; the only shuffles are the
    * wordcount and the per-doc reduce. */
  val qVocabOov = QueryDef.sql(
    "q_vocab_oov",
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS word
       |  FROM documents),
       |vocab AS (
       |  SELECT word FROM (
       |    SELECT word, count(*) AS c FROM tok GROUP BY word
       |    ORDER BY c DESC, word LIMIT $VocabTopV)),
       |per_doc AS (
       |  SELECT doc_id,
       |         count(*) AS n_tokens,
       |         count(*) FILTER (WHERE word NOT IN (SELECT word FROM vocab))
       |           AS n_oov
       |  FROM tok GROUP BY doc_id)
       |SELECT doc_id,
       |       CAST(n_tokens AS BIGINT) AS n_tokens,
       |       CAST(n_oov AS BIGINT)    AS n_oov,
       |       round(n_oov * 1.0 / n_tokens, 4) AS oov_ratio
       |FROM per_doc
       |ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    CorpusOps
      .oovStats(Tables.documents(s, d), "doc_id", "text", VocabTopV)
      .orderBy($"doc_id")
  }

  /** TF-IDF keyword extraction: term frequency per (doc, word) × a
    * rational idf (N+1)/(df+1) — kept log-free so both engines compute
    * bit-identical doubles from exact integer ratios — then the top 3
    * terms per document (score desc, word asc). df is corpus-wide; the
    * emitted docs are capped at id < 100 to bound the gate's output, but
    * nothing in the plan depends on the cap. The df relation is one row
    * per vocab word → broadcast side of the token join at scale. */
  val qTfidfTopTerms = QueryDef.sql(
    "q_tfidf_top_terms",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS word
      |  FROM documents),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      |scored AS (
      |  SELECT tf.doc_id, tf.word,
      |         tf.tf * ((n.n_docs + 1.0) / (df.df + 1.0)) AS score
      |  FROM tf JOIN df ON tf.word = df.word CROSS JOIN n
      |  WHERE tf.doc_id < 100),
      |ranked AS (
      |  SELECT doc_id, word, score,
      |         row_number() OVER (PARTITION BY doc_id
      |                            ORDER BY score DESC, word) AS rnk
      |  FROM scored)
      |SELECT doc_id, CAST(rnk AS INT) AS rnk, word, round(score, 4) AS score
      |FROM ranked WHERE rnk <= 3
      |ORDER BY doc_id, rnk""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val tok = Tables
      .documents(s, d)
      .select($"doc_id", explode(words($"text")).as("word"))
    val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    val tf = tok
      .groupBy($"doc_id", $"word")
      .agg(count(lit(1)).as("tf"))
      .filter($"doc_id" < 100)
    val df = tok
      .groupBy($"word")
      .agg(countDistinct($"doc_id").as("df"))
      .withColumnRenamed("word", "dfword")
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"word")
    tf.join(broadcast(df), $"word" === $"dfword")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        $"tf" * (($"n_docs" + lit(1.0)) / ($"df" + lit(1.0))))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3)
      .select($"doc_id", $"rnk", $"word", round($"score", 4).as("score"))
      .orderBy($"doc_id", $"rnk")
  }

  /** Gopher-style repetition quality: duplicate-word fraction (1 − TTR)
    * and the token share of the single most-repeated bigram. Both are
    * per-document narrow computations until the tiny per-doc max reduce;
    * the band thresholds compare the ROUNDED fractions so an ulp of
    * engine difference can never flip a boundary document. */
  val qTextRepetition = QueryDef.sql(
    "q_text_repetition",
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id,
      |         unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS b
      |  FROM t WHERE len(w) >= 2),
      |bgmax AS (
      |  SELECT doc_id, max(c) AS mx FROM (
      |    SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2)
      |  GROUP BY doc_id)
      |SELECT t.doc_id,
      |       CAST(len(w) AS INT) AS n_words,
      |       round(1.0 - len(list_distinct(w)) * 1.0 / len(w), 4)
      |         AS dup_word_frac,
      |       round(coalesce(mx, 0) * 2.0 / len(w), 4) AS top_bigram_frac,
      |       CASE WHEN round(1.0 - len(list_distinct(w)) * 1.0 / len(w), 4) > 0.85
      |              OR round(coalesce(mx, 0) * 2.0 / len(w), 4) > 0.5
      |            THEN 'repetitive' ELSE 'ok' END AS band
      |FROM t LEFT JOIN bgmax ON t.doc_id = bgmax.doc_id
      |ORDER BY t.doc_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    CorpusOps
      .repetitionMetrics(Tables.documents(s, d), "doc_id", "text")
      .orderBy($"doc_id")
  }

  /** Weighted sample size. */
  val WeightedK = 50

  /** Deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis via exponential keys): document i gets key
    * -ln(u_i)/w_i with u_i a hash-derived uniform in (0,1) and weight
    * w_i = n_chars; the [[WeightedK]] smallest keys are the sample, so
    * longer documents are proportionally likelier — the "sample by token
    * mass, not by document count" selector a training mix needs. Like the
    * stratified sampler, the key is a pure function of the row: no RNG
    * state, the same sample on every engine at any parallelism, and at
    * 100 TB the top-k is a per-partition heap + tiny final merge (TakeOrdered),
    * never a global sort. Ranking compares the ROUNDED key (doc_id
    * tie-break) so an ulp of libm ln() difference cannot flip membership. */
  val qWeightedSample = QueryDef.sql(
    "q_weighted_sample",
    s"""WITH t AS (
       |  SELECT doc_id, greatest(n_chars, 1) AS w,
       |         (CAST(concat('0x', substr(md5('ws|' || doc_id), 1, 15))
       |               AS BIGINT) % 1000000 + 0.5) / 1000000.0 AS u
       |  FROM documents),
       |keyed AS (
       |  SELECT doc_id, w, round(-ln(u) / w, 8) AS k FROM t),
       |ranked AS (
       |  SELECT doc_id, w, k,
       |         row_number() OVER (ORDER BY k, doc_id) AS rn
       |  FROM keyed)
       |SELECT CAST(rn AS INT) AS rn, doc_id,
       |       CAST(w AS BIGINT) AS weight, k AS sample_key
       |FROM ranked WHERE rn <= $WeightedK
       |ORDER BY rn""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    // the SAME column-parameterized sampler the library exposes
    // (CorpusOps.weightedSample) — gate and API cannot drift
    CorpusOps
      .weightedSample(Tables.documents(s, d), "doc_id", "n_chars", WeightedK)
      .orderBy($"rn")
  }

  /** Temperature exponent for smoothed source mixing (the mBERT/XLM-R
    * recipe: sample source i ∝ p_i^α — α < 1 up-weights small sources
    * without flattening to uniform). */
  val MixAlpha = 0.3

  /** Temperature-scaled source mixing: each source's natural token share
    * p_i is smoothed to q_i = p_i^α / Σ p_j^α, and the boost q_i/p_i is
    * the per-source duplication (or subsampling) factor that realizes
    * the mix. Complements [[qMixSources]]' uniform-target weights with
    * the standard smoothed-multinomial curriculum. The whole computation
    * happens on the |sources|-row aggregate — one map-side-combined
    * wordcount shuffle, then arithmetic on a relation small enough to
    * broadcast at any corpus size. */
  val qTemperatureMix = QueryDef.sql(
    "q_temperature_mix",
    s"""WITH per_src AS (
       |  SELECT source,
       |         CAST(sum(len(string_split_regex(trim(text), ' +'))) AS BIGINT)
       |           AS n_tokens
       |  FROM documents GROUP BY source),
       |shares AS (
       |  SELECT source, n_tokens,
       |         n_tokens * 1.0 / sum(n_tokens) OVER () AS p,
       |         pow(n_tokens * 1.0 / sum(n_tokens) OVER (), $MixAlpha) AS pw
       |  FROM per_src)
       |SELECT source, n_tokens,
       |       round(p, 4) AS natural_share,
       |       round(pw / sum(pw) OVER (), 4) AS smoothed_share,
       |       round((pw / sum(pw) OVER ()) / p, 4) AS boost
       |FROM shares ORDER BY source""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    // the global sums are 1-row aggregates cross-joined (broadcast) back
    // onto the |sources|-row relation — no empty-partition window (Spark
    // 4's EliminateWindowPartitions folds a literal partition key away,
    // so the old partitionBy(lit(0)) form funneled through WindowExec's
    // single-partition path). The per-source wordcount subtree is
    // IDENTICAL in both branches, so its shuffle deduplicates via
    // ReusedExchange — still one corpus scan.
    val tot = ReservedTot
    val perSrc = Tables
      .documents(s, d)
      .groupBy($"source")
      .agg(sum(size(words($"text")).cast("long")).as("n_tokens"))
    val shares = perSrc
      .crossJoin(broadcast(perSrc.agg(sum($"n_tokens").as(tot))))
      .withColumn("p", $"n_tokens" * lit(1.0) / col(tot))
      .withColumn("pw", pow($"p", MixAlpha))
    shares
      .crossJoin(broadcast(shares.agg(sum($"pw").as(tot + "pw"))))
      .select(
        $"source", $"n_tokens",
        round($"p", 4).as("natural_share"),
        round($"pw" / col(tot + "pw"), 4).as("smoothed_share"),
        round(($"pw" / col(tot + "pw")) / $"p", 4).as("boost"))
      .orderBy($"source")
  }

  /** Token budget for the mix planner — the size of the training run the
    * allocation is solved for. */
  val MixBudgetTokens = 100000L

  /** Temperature-mix BUDGET PLANNER: turns the smoothed shares of
    * [[qTemperatureMix]] into the concrete per-source plan for a
    * [[MixBudgetTokens]]-token run — allocated tokens, the epoch factor
    * (allocation / available; > 1 means the source must repeat), the
    * single-epoch-clipped sampling rate, and the token deficit the clip
    * leaves unfilled. This is the number a pipeline actually configures
    * its samplers with. Same dataflow as the mix: one wordcount
    * aggregate, two broadcast 1-row totals, |sources| rows end to end. */
  val qMixBudget = QueryDef.sql(
    "q_mix_budget",
    s"""WITH per_src AS (
       |  SELECT source,
       |         CAST(sum(len(string_split_regex(trim(text), ' +'))) AS BIGINT)
       |           AS n_tokens
       |  FROM documents GROUP BY source),
       |shares AS (
       |  SELECT source, n_tokens,
       |         pow(n_tokens * 1.0 / sum(n_tokens) OVER (), $MixAlpha) AS pw
       |  FROM per_src),
       |alloc AS (
       |  SELECT source, n_tokens,
       |         pw / sum(pw) OVER () * $MixBudgetTokens AS a
       |  FROM shares)
       |SELECT source, n_tokens,
       |       CAST(floor(a + 0.5) AS BIGINT)            AS alloc_tokens,
       |       round(a / n_tokens, 4)                    AS epochs,
       |       round(least(1.0, a / n_tokens), 4)        AS clipped_rate,
       |       CAST(greatest(0, floor(a + 0.5) - n_tokens) AS BIGINT)
       |         AS deficit_tokens
       |FROM alloc ORDER BY source""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val tot = ReservedTot
    val perSrc = Tables
      .documents(s, d)
      .groupBy($"source")
      .agg(sum(size(words($"text")).cast("long")).as("n_tokens"))
    val shares = perSrc
      .crossJoin(broadcast(perSrc.agg(sum($"n_tokens").as(tot))))
      .withColumn("pw", pow($"n_tokens" * lit(1.0) / col(tot), MixAlpha))
    shares
      .crossJoin(broadcast(shares.agg(sum($"pw").as(tot + "pw"))))
      .withColumn("a",
        $"pw" / col(tot + "pw") * lit(MixBudgetTokens.toDouble))
      .select(
        $"source", $"n_tokens",
        floor($"a" + 0.5).cast("long").as("alloc_tokens"),
        round($"a" / $"n_tokens", 4).as("epochs"),
        round(least(lit(1.0), $"a" / $"n_tokens"), 4).as("clipped_rate"),
        greatest(lit(0L), floor($"a" + 0.5).cast("long") - $"n_tokens")
          .as("deficit_tokens"))
      .orderBy($"source")
  }

  /** Per-document REPEAT PLAN realizing the [[qMixBudget]] allocation:
    * a source whose allocation is e = alloc/available epochs repeats
    * every document floor(e) times, plus one more for the hash-selected
    * fraction frac(e) of its documents — deterministic oversampling
    * whose expected token draw equals the allocation exactly. The
    * fraction is fixed as an integer permille on the tie-safe
    * floor(x·1000+0.5) margin, and document selection is the same
    * salted md5 predicate as stratified sampling (salt "rep").
    *
    * Scale shape: the |sources|-row plan table broadcasts onto the
    * corpus scan; the repeat decision is pure per-row arithmetic —
    * no shuffle anywhere, output in corpus row order. */
  val qRepeatPlan = QueryDef.sql(
    "q_repeat_plan",
    s"""WITH per_src AS (
       |  SELECT source,
       |         CAST(sum(len(string_split_regex(trim(text), ' +'))) AS BIGINT)
       |           AS n_tokens
       |  FROM documents GROUP BY source),
       |shares AS (
       |  SELECT source, n_tokens,
       |         pow(n_tokens * 1.0 / sum(n_tokens) OVER (), $MixAlpha) AS pw
       |  FROM per_src),
       |alloc AS (
       |  SELECT source, n_tokens,
       |         pw / sum(pw) OVER () * $MixBudgetTokens AS a
       |  FROM shares),
       |plan AS (
       |  SELECT source,
       |         CAST(floor(a / n_tokens) AS BIGINT) AS whole,
       |         CAST(floor((a / n_tokens - floor(a / n_tokens)) * 1000
       |              + 0.5) AS BIGINT) AS frac_pm
       |  FROM alloc)
       |SELECT d.doc_id, d.source,
       |       CAST(p.whole +
       |            CASE WHEN CAST(concat('0x',
       |                   substr(md5('rep|' || d.doc_id), 1, 15)) AS BIGINT)
       |                 % 1000 < p.frac_pm
       |                 THEN 1 ELSE 0 END AS BIGINT) AS n_repeats
       |FROM documents d JOIN plan p ON d.source = p.source
       |ORDER BY d.doc_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val tot = ReservedTot
    val perSrc = Tables
      .documents(s, d)
      .groupBy($"source")
      .agg(sum(size(words($"text")).cast("long")).as("n_tokens"))
    val shares = perSrc
      .crossJoin(broadcast(perSrc.agg(sum($"n_tokens").as(tot))))
      .withColumn("pw", pow($"n_tokens" * lit(1.0) / col(tot), MixAlpha))
    val plan = shares
      .crossJoin(broadcast(shares.agg(sum($"pw").as(tot + "pw"))))
      .withColumn("e",
        $"pw" / col(tot + "pw") * lit(MixBudgetTokens.toDouble)
          / $"n_tokens")
      .select(
        $"source",
        floor($"e").cast("long").as("whole"),
        floor(($"e" - floor($"e")) * 1000 + 0.5).cast("long")
          .as("frac_pm"))
    Tables
      .documents(s, d)
      .join(broadcast(plan), Seq("source"))
      .select(
        $"doc_id", $"source",
        ($"whole" + when(
          graft.operators.CorpusOps.sampleHash($"doc_id", "rep")
            < $"frac_pm", 1L).otherwise(0L)).cast("long").as("n_repeats"))
      .orderBy($"doc_id")
  }

  /** Internal total-column name for [[qTemperatureMix]]'s broadcast
    * global sums (documents carries no such column). */
  private val ReservedTot = "__graft_tot"

  /** Deterministic train/val/test split (980/10/10‰): each document's
    * salted id-hash band decides its split — disjoint, exhaustive, and
    * STABLE under corpus growth (appending documents never moves an old
    * one between splits, which ntile/row_number splits cannot promise).
    * The gate reports per-split document/char counts plus an id-sum
    * checksum so membership — not just cardinality — is hash-checked.
    * Pure per-row predicate feeding one map-side-combined aggregate:
    * a single scan at any corpus size. Library form:
    * [[CorpusOps.datasetSplit]]. */
  val qTrainValSplit = QueryDef.sql(
    "q_train_val_split",
    """WITH a AS (
      |  SELECT doc_id, n_chars,
      |         CAST(concat('0x', substr(md5('spl|' || doc_id), 1, 15))
      |              AS BIGINT) % 1000 AS h
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, n_chars,
      |         CASE WHEN h < 980 THEN 'train'
      |              WHEN h < 990 THEN 'val'
      |              ELSE 'test' END AS split
      |  FROM a)
      |SELECT split,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       CAST(sum(doc_id) AS BIGINT) AS id_sum
      |FROM s GROUP BY split ORDER BY split""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    CorpusOps
      .datasetSplit(Tables.documents(s, d), "doc_id")
      .groupBy($"split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        sum($"doc_id").as("id_sum"))
      .orderBy($"split")
  }

  /** Deterministic training-order shuffle ([[CorpusOps.trainingOrder]]):
    * a salted hash permutation assigns every document a (shard, pos)
    * coordinate — the reproducible global shuffle a training run reads
    * in, with per-epoch re-permutation by salt. One shuffle on the shard
    * key, per-shard parallel ordering, no global sort. */
  val qTrainingOrder = QueryDef.sql(
    "q_training_order",
    """WITH a AS (
      |  SELECT doc_id,
      |         CAST(concat('0x', substr(md5('ord|' || doc_id), 1, 15))
      |              AS BIGINT) AS h
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(h % 16 AS INT) AS shard,
      |       CAST(row_number() OVER (PARTITION BY h % 16
      |                               ORDER BY h, doc_id) AS INT) AS pos
      |FROM a ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    CorpusOps
      .trainingOrder(Tables.documents(s, d), "doc_id")
      .orderBy($"doc_id")
  }

  /** Vocabulary coverage curve: the token share covered by the top-10 /
    * top-100 / top-1000 words — the Zipf saturation measurement that
    * sizes a tokenizer's vocabulary (where the curve flattens, extra
    * vocab buys nothing). The vocab table is Zipf-bounded but NOT
    * assumed small: the top-1000 slice comes from ORDER BY + LIMIT
    * (per-partition heaps), ranks from [[CorpusOps.boundedRank]] over
    * those ≤1000 rows, totals from one aggregate — nothing vocab-sized
    * ever transits a single-partition window. */
  val qVocabCoverage = QueryDef.sql(
    "q_vocab_coverage",
    """WITH t AS (
      |  SELECT string_split_regex(trim(text), ' +') AS w FROM documents),
      |wc AS (SELECT unnest(w) AS word FROM t),
      |cnt AS (SELECT word, count(*) AS c FROM wc GROUP BY word),
      |tot AS (SELECT sum(c) AS t FROM cnt),
      |top AS (SELECT word, c FROM cnt ORDER BY c DESC, word LIMIT 1000),
      |ranked AS (
      |  SELECT word, c, row_number() OVER (ORDER BY c DESC, word) AS rnk
      |  FROM top),
      |n AS (SELECT unnest([10, 100, 1000]) AS n_vocab)
      |SELECT n_vocab,
      |       CAST(sum(c) AS BIGINT) AS covered_tokens,
      |       round(sum(c) * 1.0 / any_value(t), 4) AS coverage
      |FROM ranked CROSS JOIN n CROSS JOIN tot
      |WHERE rnk <= n_vocab
      |GROUP BY n_vocab ORDER BY n_vocab""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val cnt = Tables.documents(s, d)
      .select(explode(words($"text")).as("word"))
      .groupBy($"word")
      .agg(count(lit(1)).as("c"))
    val tot = cnt.agg(sum($"c").as("t"))
    val top = cnt.orderBy($"c".desc, $"word").limit(1000)
    CorpusOps
      .boundedRank(top, struct((-$"c").as("nc"), $"word"), "rnk")
      .select($"c", $"rnk",
        explode(array(lit(10), lit(100), lit(1000))).as("n_vocab"))
      .filter($"rnk" <= $"n_vocab")
      .groupBy($"n_vocab")
      .agg(sum($"c").as("covered_tokens"))
      .crossJoin(broadcast(tot))
      .select($"n_vocab", $"covered_tokens",
        round($"covered_tokens" * lit(1.0) / $"t", 4).as("coverage"))
      .orderBy($"n_vocab")
  }

  /** Per-source corpus dashboard: doc/token volume, language spread,
    * exact length percentiles, and each source's share of total tokens —
    * the one-page report a data-mixing decision starts from (q_mix_*
    * consume these totals; this surfaces them with distribution shape).
    *
    * Exact percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`, the
    * q_events_percentiles recipe) buffer per-group values, so at
    * production scale the drop-in swap is `approx_percentile` — the
    * report is |sources| rows either way, and everything else is one
    * narrow scan + one aggregate + a broadcast 1-row total. */
  val qSourceReport = QueryDef.sql(
    "q_source_report",
    """WITH d AS (
      |  SELECT source, lang,
      |         len(string_split_regex(trim(text), ' +')) AS n_tok
      |  FROM documents),
      |t AS (SELECT sum(n_tok) AS tot FROM d)
      |SELECT source,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |       round(sum(n_tok) * 1.0 / count(*), 2) AS mean_len,
      |       round(quantile_cont(n_tok, 0.50), 2) AS p50_len,
      |       round(quantile_cont(n_tok, 0.95), 2) AS p95_len,
      |       round(sum(n_tok) * 1.0 / (SELECT tot FROM t), 4) AS tok_share
      |FROM d GROUP BY source ORDER BY source""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val toks = Tables.documents(s, d)
      .select($"source", $"lang", size(words($"text")).as("n_tok"))
    val tot = toks.agg(sum($"n_tok").as("tot"))
    toks
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tok").as("sum_tok"),
        countDistinct($"lang").as("n_langs"),
        expr("percentile(n_tok, 0.50)").as("p50_raw"),
        expr("percentile(n_tok, 0.95)").as("p95_raw"))
      .crossJoin(broadcast(tot))
      .select(
        $"source",
        $"n_docs".cast("long").as("n_docs"),
        $"sum_tok".cast("long").as("n_tokens"),
        $"n_langs".cast("long").as("n_langs"),
        round($"sum_tok" * lit(1.0) / $"n_docs", 2).as("mean_len"),
        round($"p50_raw", 2).as("p50_len"),
        round($"p95_raw", 2).as("p95_len"),
        round($"sum_tok" * lit(1.0) / $"tot", 4).as("tok_share"))
      .orderBy($"source")
  }

  /** Corpus snapshot diff — the audit an incremental ingest runs between
    * two corpus versions before re-training: per source, how many
    * documents were added, removed, changed (content hash differs at the
    * same id), or untouched. The v2 snapshot is DERIVED deterministically
    * inside the query (every 17th-residue doc removed, every 13th-residue
    * text revised, every 19th-residue doc cloned under a fresh id — the
    * +10⁹ offset clears the fixture id space) so both engines diff the
    * identical pair; a production caller diffs two real snapshot tables
    * with the same plan.
    *
    * Scale (100 TB): one full-outer shuffle join on the document id with
    * an md5 CONTENT-hash compare (never the text itself — the hash is
    * computed scan-side, so only 32-byte digests reach the exchange
    * alongside the id/source), then an aggregate to ≤ \|sources\|·4 rows. */
  val qCorpusDiff = QueryDef.sql(
    "q_corpus_diff",
    """WITH v1 AS (SELECT doc_id, md5(text) AS h, source FROM documents),
      |v2 AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 13 = 4 THEN md5(text || ' [rev2]')
      |              ELSE md5(text) END AS h,
      |         source
      |  FROM documents WHERE doc_id % 17 <> 3
      |  UNION ALL
      |  SELECT doc_id + 1000000000, md5(text), source
      |  FROM documents WHERE doc_id % 19 = 6),
      |d AS (
      |  SELECT coalesce(a.source, b.source) AS source,
      |         CASE WHEN a.doc_id IS NULL THEN 'added'
      |              WHEN b.doc_id IS NULL THEN 'removed'
      |              WHEN a.h <> b.h THEN 'changed'
      |              ELSE 'unchanged' END AS status
      |  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
      |SELECT source, status, CAST(count(*) AS BIGINT) AS n
      |FROM d GROUP BY source, status ORDER BY source, status""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    val v1 = docs.select($"doc_id", md5($"text").as("h"), $"source")
    val v2 = docs
      .filter($"doc_id" % 17 =!= 3)
      .select($"doc_id",
        when($"doc_id" % 13 === 4, md5(concat($"text", lit(" [rev2]"))))
          .otherwise(md5($"text")).as("h"),
        $"source")
      .unionAll(docs
        .filter($"doc_id" % 19 === 6)
        .select(($"doc_id" + 1000000000L).as("doc_id"),
          md5($"text").as("h"), $"source"))
    val a = v1.select($"doc_id".as("a_id"), $"h".as("a_h"),
      $"source".as("a_src"))
    val b = v2.select($"doc_id".as("b_id"), $"h".as("b_h"),
      $"source".as("b_src"))
    a.join(b, $"a_id" === $"b_id", "full_outer")
      .select(
        coalesce($"a_src", $"b_src").as("source"),
        when($"a_id".isNull, "added")
          .when($"b_id".isNull, "removed")
          .when($"a_h" =!= $"b_h", "changed")
          .otherwise("unchanged").as("status"))
      .groupBy($"source", $"status")
      .agg(count(lit(1)).as("n"))
      .orderBy($"source", $"status")
  }

  /** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    * one Group-DRO multiplicative-weights step over the source mixture.
    * DoReMi upweights domains with high EXCESS loss (proxy-model loss
    * the reference model doesn't explain); the deterministic stand-in
    * here is each source's KL(source ‖ corpus) over hashed unigram
    * buckets ([[CorpusOps.sourceDivergence]] — a drifted source is
    * exactly one the corpus-wide reference model fits worst). The step:
    * w̃_s = share_s · exp(η·excess_s) with η = 1, normalized, then
    * smoothed with the uniform mixture (DoReMi's c·u + (1-c)·w, c=0.1).
    *
    * Scale: the only corpus-scale operation is sourceDivergence's one
    * count-shuffle; everything after is arithmetic on |sources| rows
    * with two broadcast 1-row totals. The excess term enters the update
    * at its published 4-decimal rounding, so both engines exponentiate
    * identical doubles. */
  val qDomainReweight = QueryDef.sql(
    "q_domain_reweight",
    """WITH t AS (
      |  SELECT source, string_split_regex(trim(text), ' +') AS w
      |  FROM documents),
      |tok AS (SELECT source, unnest(w) AS token FROM t),
      |sb AS (
      |  SELECT source,
      |         CAST(concat('0x', substr(md5('ds|' || token), 1, 15))
      |              AS BIGINT) % 1024 AS b,
      |         count(*) AS c
      |  FROM tok GROUP BY 1, 2),
      |stot AS (SELECT source, sum(c) AS ns FROM sb GROUP BY source),
      |cb AS (SELECT b, sum(c) AS cbn FROM sb GROUP BY b),
      |tot AS (SELECT sum(cbn) AS n FROM cb),
      |dom AS (
      |  SELECT source, d.b
      |  FROM stot CROSS JOIN
      |       (SELECT unnest(generate_series(0, 1023)) AS b) d),
      |terms AS (
      |  SELECT dom.source, stot.ns,
      |         (coalesce(sb.c, 0) + 1.0) / (stot.ns + 1024.0) AS q,
      |         (coalesce(cb.cbn, 0) + 1.0) / (tot.n + 1024.0) AS p
      |  FROM dom
      |  JOIN stot USING (source)
      |  LEFT JOIN sb ON sb.source = dom.source AND sb.b = dom.b
      |  LEFT JOIN cb ON cb.b = dom.b
      |  CROSS JOIN tot),
      |kl AS (
      |  SELECT source, any_value(ns) AS n_tokens,
      |         round(sum(q * ln(q / p)), 4) + 0.0 AS excess
      |  FROM terms GROUP BY source),
      |shared AS (
      |  SELECT source, n_tokens, excess,
      |         n_tokens * 1.0 / (SELECT sum(n_tokens) FROM kl) AS share
      |  FROM kl),
      |un AS (SELECT source, n_tokens, excess, share,
      |              share * exp(excess) AS u FROM shared),
      |z AS (SELECT sum(u) AS zz, count(*) AS ns FROM un)
      |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
      |       round(share, 4) AS old_share, excess,
      |       round(0.9 * (u / zz) + 0.1 / ns, 4) AS new_weight
      |FROM un CROSS JOIN z
      |ORDER BY source""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val kl = CorpusOps
      .sourceDivergence(Tables.documents(s, d), "source", "text")
      .select($"source", $"n_tokens", $"kl_to_corpus".as("excess"))
    val tot = kl.agg(sum($"n_tokens").as("nt"))
    val un = kl
      .crossJoin(broadcast(tot))
      .withColumn("share", $"n_tokens" * lit(1.0) / $"nt")
      .withColumn("u", $"share" * exp($"excess"))
    val z = un.agg(sum($"u").as("zz"), count(lit(1)).as("ns"))
    un.crossJoin(broadcast(z))
      .select(
        $"source", $"n_tokens".cast("long").as("n_tokens"),
        round($"share", 4).as("old_share"), $"excess",
        round(lit(0.9) * ($"u" / $"zz") + lit(0.1) / $"ns", 4)
          .as("new_weight"))
      .orderBy($"source")
  }

  /** Incremental materialized-view maintenance — the per-source stats
    * table (docs, chars) a warehouse keeps current between corpus
    * versions WITHOUT rescanning the corpus: the view over v2 is
    * computed as view(v1) merged with aggregates of the CHANGE SET only
    * (added docs add, removed docs subtract, changed docs do both), and
    * the query audits that algebra by recomputing view(v2) from scratch
    * and comparing. v1/v2 are derived with the same deterministic
    * residue edits as [[qCorpusDiff]], so both engines maintain the
    * identical pair; a production caller feeds its CDC log as the delta.
    *
    * Scale (100 TB): the incremental path aggregates only the delta —
    * at a typical 0.1% daily churn that is a 1000× smaller scan than
    * refresh-by-recompute (here the from-scratch side exists purely as
    * the in-query audit). SUM/COUNT are self-maintainable; the merge is
    * an O(|sources|) outer join of two aggregate-sized relations. */
  val qMvMaintain = QueryDef.sql(
    "q_mv_maintain",
    """WITH v1 AS (SELECT doc_id, source, length(text) AS nc, md5(text) AS h
      |            FROM documents),
      |v2 AS (
      |  SELECT doc_id, source,
      |         CASE WHEN doc_id % 13 = 4 THEN length(text || ' [rev2]')
      |              ELSE length(text) END AS nc,
      |         CASE WHEN doc_id % 13 = 4 THEN md5(text || ' [rev2]')
      |              ELSE md5(text) END AS h
      |  FROM documents WHERE doc_id % 17 <> 3
      |  UNION ALL
      |  SELECT doc_id + 1000000000, source, length(text), md5(text)
      |  FROM documents WHERE doc_id % 19 = 6),
      |mv1 AS (SELECT source, count(*) AS n1, sum(nc) AS s1
      |        FROM v1 GROUP BY source),
      |delta AS (
      |  SELECT coalesce(a.source, b.source) AS source,
      |         sum(CASE WHEN a.doc_id IS NULL THEN 1
      |                  WHEN b.doc_id IS NULL THEN -1 ELSE 0 END) AS dn,
      |         sum(coalesce(b.nc, 0) - coalesce(a.nc, 0)) AS ds
      |  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
      |  WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.h <> b.h
      |  GROUP BY 1),
      |incr AS (
      |  SELECT mv1.source,
      |         mv1.n1 + coalesce(delta.dn, 0) AS n_incr,
      |         mv1.s1 + coalesce(delta.ds, 0) AS s_incr
      |  FROM mv1 LEFT JOIN delta ON mv1.source = delta.source),
      |full_v2 AS (SELECT source, count(*) AS n_full, sum(nc) AS s_full
      |            FROM v2 GROUP BY source)
      |SELECT i.source,
      |       CAST(i.n_incr AS BIGINT) AS n_docs,
      |       CAST(i.s_incr AS BIGINT) AS sum_chars,
      |       (i.n_incr = f.n_full AND i.s_incr = f.s_full) AS consistent
      |FROM incr i JOIN full_v2 f ON i.source = f.source
      |ORDER BY i.source""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    val v1 = docs.select($"doc_id", $"source",
      length($"text").cast("long").as("nc"), md5($"text").as("h"))
    val revised = $"doc_id" % 13 === 4
    val v2 = docs
      .filter($"doc_id" % 17 =!= 3)
      .select($"doc_id", $"source",
        when(revised, length(concat($"text", lit(" [rev2]"))))
          .otherwise(length($"text")).cast("long").as("nc"),
        when(revised, md5(concat($"text", lit(" [rev2]"))))
          .otherwise(md5($"text")).as("h"))
      .unionAll(docs
        .filter($"doc_id" % 19 === 6)
        .select(($"doc_id" + 1000000000L).as("doc_id"), $"source",
          length($"text").cast("long").as("nc"), md5($"text").as("h")))
    val mv1 = v1.groupBy($"source")
      .agg(count(lit(1)).as("n1"), sum($"nc").as("s1"))
    val a = v1.select($"doc_id".as("a_id"), $"source".as("a_src"),
      $"nc".as("a_nc"), $"h".as("a_h"))
    val b = v2.select($"doc_id".as("b_id"), $"source".as("b_src"),
      $"nc".as("b_nc"), $"h".as("b_h"))
    val delta = a
      .join(b, $"a_id" === $"b_id", "full_outer")
      .filter($"a_id".isNull || $"b_id".isNull || $"a_h" =!= $"b_h")
      .groupBy(coalesce($"a_src", $"b_src").as("source"))
      .agg(
        sum(when($"a_id".isNull, 1L).when($"b_id".isNull, -1L)
          .otherwise(0L)).as("dn"),
        sum(coalesce($"b_nc", lit(0L)) - coalesce($"a_nc", lit(0L)))
          .as("ds"))
    val incr = mv1
      .join(delta, Seq("source"), "left")
      .select($"source",
        ($"n1" + coalesce($"dn", lit(0L))).as("n_incr"),
        ($"s1" + coalesce($"ds", lit(0L))).as("s_incr"))
    val fullV2 = v2.groupBy($"source")
      .agg(count(lit(1)).as("n_full"), sum($"nc").as("s_full"))
    incr
      .join(fullV2, Seq("source"))
      .select($"source",
        $"n_incr".cast("long").as("n_docs"),
        $"s_incr".cast("long").as("sum_chars"),
        ($"n_incr" === $"n_full" && $"s_incr" === $"s_full")
          .as("consistent"))
      .orderBy($"source")
  }

  /** Curriculum ordering — easy→hard training order by length band
    * (short documents first, the standard length-curriculum proxy),
    * salted-hash shuffled WITHIN each band so each band is still an
    * unbiased sample stream: band boundaries are the exact length
    * quartiles (rounded to 2 decimals before comparing, so an
    * interpolation ulp can't flip a boundary document), and the global
    * position is band offset + intra-band hash rank.
    *
    * Scale: quartiles are one aggregate broadcast back onto the scan;
    * the intra-band rank windows partition by band (4-way parallel —
    * at 100 TB use more bands); the band offsets are a 4-row triangular
    * broadcast join, the same two-phase shape as
    * [[CorpusOps.trainingOrder]]'s shards — no global sort or window. */
  val qCurriculumOrder = QueryDef.sql(
    "q_curriculum_order",
    """WITH b AS (
      |  SELECT round(quantile_cont(n_chars, 0.25), 2) AS b25,
      |         round(quantile_cont(n_chars, 0.50), 2) AS b50,
      |         round(quantile_cont(n_chars, 0.75), 2) AS b75
      |  FROM documents),
      |banded AS (
      |  SELECT doc_id, n_chars,
      |         CASE WHEN n_chars <= b25 THEN 0
      |              WHEN n_chars <= b50 THEN 1
      |              WHEN n_chars <= b75 THEN 2
      |              ELSE 3 END AS band,
      |         CAST(concat('0x', substr(md5('cur|' || CAST(doc_id AS VARCHAR)),
      |              1, 15)) AS BIGINT) AS h
      |  FROM documents CROSS JOIN b)
      |SELECT doc_id, CAST(band AS BIGINT) AS band,
      |       CAST(row_number() OVER (ORDER BY band, h, doc_id) AS BIGINT)
      |         AS pos
      |FROM banded
      |ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    val b = docs.agg(
      round(expr("percentile(n_chars, 0.25)"), 2).as("b25"),
      round(expr("percentile(n_chars, 0.50)"), 2).as("b50"),
      round(expr("percentile(n_chars, 0.75)"), 2).as("b75"))
    val banded = docs
      .crossJoin(broadcast(b))
      .select($"doc_id",
        when($"n_chars" <= $"b25", 0L)
          .when($"n_chars" <= $"b50", 1L)
          .when($"n_chars" <= $"b75", 2L)
          .otherwise(3L).as("band"),
        stableHash60(concat(lit("cur|"), $"doc_id".cast("string"))).as("h"))
    val w = Window.partitionBy($"band").orderBy($"h", $"doc_id")
    val ranked = banded.withColumn("rk", row_number().over(w))
    val counts = banded.groupBy($"band").agg(count(lit(1)).as("bn"))
    val prior = counts.select($"band".as("pband"), $"bn".as("pn"))
    val offsets = counts
      .join(broadcast(prior), $"pband" < $"band", "left")
      .groupBy($"band")
      .agg(coalesce(sum($"pn"), lit(0L)).as("off"))
    ranked
      .join(broadcast(offsets), "band")
      .select($"doc_id", $"band",
        ($"off" + $"rk").cast("long").as("pos"))
      .orderBy($"doc_id")
  }

  /** Token-weighted median document length per source — the length a
    * TOKEN experiences, not the length a document has (mean-vs-weighted
    * is exactly how long-doc-heavy sources hide in unweighted stats):
    * smallest length whose cumulative token weight reaches half the
    * source's tokens.
    *
    * Scale: per-source cumulative windows (partitioned by source —
    * parallel across sources), one count-shuffle before them; output
    * O(|sources|). */
  val qWeightedMedian = QueryDef.sql(
    "q_weighted_median",
    """WITH f AS (
      |  SELECT source, n_chars,
      |         CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS w
      |  FROM documents),
      |c AS (
      |  SELECT source, n_chars, w,
      |         sum(w) OVER (PARTITION BY source ORDER BY n_chars, n_chars
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
      |         sum(w) OVER (PARTITION BY source) AS tw
      |  FROM f),
      |q AS (
      |  SELECT source, min(n_chars) AS wmedian_len
      |  FROM c WHERE cw * 2 >= tw GROUP BY source),
      |u AS (
      |  SELECT source, round(avg(n_chars), 2) AS mean_len,
      |         round(quantile_cont(n_chars, 0.5), 2) AS median_len
      |  FROM f GROUP BY source)
      |SELECT u.source, u.mean_len, u.median_len,
      |       CAST(q.wmedian_len AS BIGINT) AS wmedian_len
      |FROM u JOIN q ON q.source = u.source
      |ORDER BY u.source""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val f = Tables.documents(s, d)
      .select($"source", $"n_chars",
        size(words($"text")).cast("long").as("w"))
    val cum = Window.partitionBy($"source").orderBy($"n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy($"source")
    val c = f
      .withColumn("cw", sum($"w").over(cum))
      .withColumn("tw", sum($"w").over(tot))
    val q = c.filter($"cw" * 2 >= $"tw")
      .groupBy($"source").agg(min($"n_chars").as("wmedian_len"))
    val u = f.groupBy($"source")
      .agg(round(avg($"n_chars"), 2).as("mean_len"),
        round(expr("percentile(n_chars, 0.5)"), 2).as("median_len"))
    u.join(q, "source")
      .select($"source", $"mean_len", $"median_len",
        $"wmedian_len".cast("long").as("wmedian_len"))
      .orderBy($"source")
  }

  /** Gini coefficient of the token share across sources (plus the
    * max-share concentration read) — the inequality audit behind the
    * mix planner: a high Gini means a handful of sources carry the
    * corpus and temperature mixing will fight hard. Computed by the
    * exact pairwise formula G = ΣᵢΣⱼ|xᵢ−xⱼ| / (2n²µ) on the
    * AGGREGATED |sources|-row relation — the corpus contributes one
    * count-shuffle; the n² is 25². */
  val qGiniSources = QueryDef.sql(
    "q_gini_sources",
    """WITH x AS (
      |  SELECT source,
      |         CAST(sum(len(string_split_regex(trim(text), ' +'))) AS DOUBLE)
      |           AS toks
      |  FROM documents GROUP BY source),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(toks) AS tot FROM x),
      |p AS (
      |  SELECT sum(abs(a.toks - b.toks)) AS sd
      |  FROM x a CROSS JOIN x b)
      |SELECT CAST(n.n AS BIGINT) AS n_sources,
      |       round(p.sd / (2 * n.n * n.tot), 4) AS gini,
      |       round((SELECT max(toks) FROM x) / n.tot, 4) AS top_share
      |FROM n CROSS JOIN p""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val x = Tables.documents(s, d)
      .groupBy($"source")
      .agg(sum(size(words($"text"))).cast("double").as("toks"))
    val n = x.agg(count(lit(1)).cast("double").as("n"),
      sum($"toks").as("tot"))
    val p = x.as("a").crossJoin(x.as("b"))
      .agg(sum(abs($"a.toks" - $"b.toks")).as("sd"))
    val mx = x.agg(max($"toks").as("mx"))
    n.crossJoin(broadcast(p))
      .crossJoin(broadcast(mx))
      .select($"n".cast("long").as("n_sources"),
        round($"sd" / (lit(2) * $"n" * $"tot"), 4).as("gini"),
        round($"mx" / $"tot", 4).as("top_share"))
  }

  /** Class-based TF-IDF (the BERTopic c-TF-IDF recipe, Grootendorst
    * 2022): each SOURCE is one class document; a term's score in a
    * class is its in-class rate times ln(1 + A/tf_all) with A = average
    * class size — surfacing the words that CHARACTERIZE a source rather
    * than merely occur in it (the domain-fingerprinting read before
    * mixing decisions). Top 5 terms per source on the ROUNDED score
    * (term tiebreak).
    *
    * Scale: one token count-shuffle to the (source, word) relation;
    * class totals and corpus term totals are aggregate-sized broadcasts;
    * the per-source ranking window filters rank ≤ 5, which
    * InferWindowGroupLimit pushes below the exchange. */
  val qCtfidfTerms = QueryDef.sql(
    "q_ctfidf_terms",
    """WITH tok AS (
      |  SELECT source, unnest(string_split_regex(trim(text), ' +')) AS w
      |  FROM documents),
      |tf AS (SELECT source, w, CAST(count(*) AS DOUBLE) AS n
      |       FROM tok GROUP BY 1, 2),
      |cls AS (SELECT source, sum(n) AS ctot FROM tf GROUP BY 1),
      |a AS (SELECT avg(ctot) AS avg_cls FROM cls),
      |wall AS (SELECT w, sum(n) AS n_all FROM tf GROUP BY 1),
      |sc AS (
      |  SELECT tf.source, tf.w,
      |         round(tf.n / cls.ctot * ln(1 + a.avg_cls / wall.n_all), 6)
      |           AS ctfidf
      |  FROM tf
      |    JOIN cls ON cls.source = tf.source
      |    JOIN wall ON wall.w = tf.w
      |    CROSS JOIN a),
      |rk AS (
      |  SELECT source, w, ctfidf,
      |         CAST(row_number() OVER (PARTITION BY source
      |                ORDER BY ctfidf DESC, w) AS INT) AS rnk
      |  FROM sc)
      |SELECT source, w AS term, ctfidf, rnk
      |FROM rk WHERE rnk <= 5
      |ORDER BY source, rnk""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val tf = Tables.documents(s, d)
      .select($"source", explode(words($"text")).as("w"))
      .groupBy($"source", $"w")
      .agg(count(lit(1)).cast("double").as("n"))
    val cls = tf.groupBy($"source").agg(sum($"n").as("ctot"))
    val a = cls.agg(avg($"ctot").as("avg_cls"))
    val wall = tf.groupBy($"w").agg(sum($"n").as("n_all"))
    val wnd = Window.partitionBy($"source").orderBy($"ctfidf".desc, $"w")
    tf
      .join(broadcast(cls), "source")
      .join(wall, "w")
      .crossJoin(broadcast(a))
      .select($"source", $"w",
        round($"n" / $"ctot" * log(lit(1) + $"avg_cls" / $"n_all"), 6)
          .as("ctfidf"))
      .withColumn("rnk", row_number().over(wnd))
      .filter($"rnk" <= 5)
      .select($"source", $"w".as("term"), $"ctfidf", $"rnk")
      .orderBy($"source", $"rnk")
  }

  def defs: Seq[QueryDef] =
    Seq(qSampleStratified, qSamplePerStratumK, qMixSources, qVocabOov,
      qTfidfTopTerms, qTextRepetition, qWeightedSample, qTemperatureMix,
      qTrainValSplit, qTrainingOrder, qVocabCoverage, qMixBudget,
      qRepeatPlan, qSourceReport, qCorpusDiff, qDomainReweight, qMvMaintain,
      qCurriculumOrder, qWeightedMedian, qGiniSources, qCtfidfTerms)
}
