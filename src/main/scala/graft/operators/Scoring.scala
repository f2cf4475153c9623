package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-based document scoring: the two cheap "model" passes a training
  * pipeline runs over every candidate document — a hashed linear quality
  * classifier (the fastText-style recipe: hash each token to a weight,
  * average, squash) and per-document cross-entropy under the corpus's own
  * bigram LM (the CCNet/KenLM-style fluency filter).
  *
  * Scale design (100 TB):
  *  - the classifier needs NO model table at all — the hashing trick turns
  *    the weight lookup into pure per-row arithmetic, so scoring is a
  *    single narrow pass inside the parquet scan's codegen span;
  *  - the LM score joins each document's bigrams against the corpus bigram
  *    table on the bigram key; the model side is vocabulary-bounded (Zipf,
  *    not corpus-bounded), and in production would be top-V-truncated and
  *    broadcast — here it stays an exact shuffle join so the oracle can
  *    reproduce it bit-for-bit.
  */
object Scoring {

  /** Hashed linear quality classifier: token t carries weight
    * (stable_hash60("qw|"||t) % 2001 - 1000) / 1000 ∈ [-1, 1]; the
    * document logit is the token-count-weighted mean and the score its
    * logistic squash. Weight sums stay INTEGER (scaled by 1000) until the
    * single final division, so both engines feed identical inputs to
    * exp(). Deterministic stand-in for trained weights — the dataflow
    * (feature hash → weighted sum → sigmoid → threshold) is exactly a
    * production linear scorer.
    *
    * The logit is a RATIONAL (zsum / 1000n) that genuinely lands on
    * round-half boundaries (2 of 500 fixture docs), where DuckDB's and
    * Spark's round() disagree — so it is rounded as floor(x·10⁴ + 0.5)/10⁴
    * instead: every step is a correctly-rounded IEEE op on identical
    * inputs, hence bit-identical in both engines even AT the tie. */
  val qQualityClassifier = QueryDef.sql(
    "q_quality_classifier",
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w
      |  FROM documents),
      |tok AS (SELECT doc_id, unnest(w) AS token FROM t),
      |feat AS (
      |  SELECT doc_id, count(*) AS n,
      |         sum((CAST(concat('0x', substr(md5('qw|' || token), 1, 15))
      |              AS BIGINT) % 2001) - 1000) AS zsum
      |  FROM tok GROUP BY doc_id)
      |SELECT doc_id,
      |       CAST(n AS INT) AS n_tokens,
      |       floor(zsum * 10.0 / n + 0.5) / 10000.0 AS logit,
      |       round(1.0 / (1.0 + exp(-(zsum / (1000.0 * n)))), 4) AS score,
      |       CAST(CASE WHEN 1.0 / (1.0 + exp(-(zsum / (1000.0 * n)))) >= 0.5
      |                 THEN 1 ELSE 0 END AS INT) AS keep
      |FROM feat ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    // the SAME column-parameterized scorer the library exposes
    // (CorpusOps.qualityScore) — gate and API cannot drift
    CorpusOps
      .qualityScore(Tables.documents(s, d), "doc_id", "text")
      .orderBy($"doc_id")
  }

  /** Per-document cross-entropy under the corpus bigram model (trained on
    * the same corpus, so every document bigram has a count — no smoothing
    * needed): H(doc) = -mean log2 P(next|head) with P = c(head,next) /
    * c(head,·). High H = improbable word sequences = the fluency-filter
    * signal. Counts are exact integers; the only float is the final
    * log2 ratio, rounded after the mean. */
  val qDocCrossEntropy = QueryDef.sql(
    "q_doc_cross_entropy",
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id,
      |         unnest([{'head': w[i], 'next': w[i+1]}
      |                 for i in range(1, len(w))]) AS b
      |  FROM t WHERE len(w) >= 2),
      |bgf AS (SELECT doc_id, b.head AS head, b.next AS next FROM bg),
      |bc AS (SELECT head, next, count(*) AS c FROM bgf GROUP BY 1, 2),
      |hc AS (SELECT head, sum(c) AS hcnt FROM bc GROUP BY head)
      |SELECT doc_id,
      |       CAST(count(*) AS BIGINT) AS n_bigrams,
      |       round(-avg(log2(bc.c * 1.0 / hc.hcnt)), 4) + 0.0 AS cross_entropy
      |FROM bgf JOIN bc USING (head, next) JOIN hc USING (head)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    // words() MUST materialize in its own projection before shingles():
    // inlined, every element_at in the transform lambda would re-split
    // the full text — O(n²) re-tokenization per document
    val bgf = Tables
      .documents(s, d)
      .select($"doc_id", words($"text").as("w"))
      .select($"doc_id", explode(shingles($"w", 2)).as("sp"))
      .select(
        $"doc_id",
        substring_index($"sp", " ", 1).as("head"),
        substring_index($"sp", " ", -1).as("next"))
    val bc = bgf.groupBy($"head", $"next").agg(count(lit(1)).as("c"))
    val hc = bc.groupBy($"head").agg(sum($"c").as("hcnt"))
    bgf
      .join(bc, Seq("head", "next"))
      .join(hc, Seq("head"))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        (round(-avg(log2($"c" * lit(1.0) / $"hcnt")), 4) + 0.0).as("cross_entropy"))
      .orderBy($"doc_id")
  }

  /** Per-language adaptive quality thresholds: instead of one global
    * cutoff, each language's own logit distribution sets its p10/p50,
    * and documents below their language's p10 are cut — the
    * distribution-aware filtering a multilingual corpus needs (a global
    * threshold silently over-filters whichever language scores lower).
    * Exact interpolated percentiles over the per-language aggregate;
    * the cut decision compares against the UNROUNDED percentile, which
    * either equals a data point bit-exactly in both engines (f = 0) or
    * lies strictly inside a ≥10⁻⁴-wide logit gap — either way the
    * comparison cannot flip. Scale: scoring is the narrow hashed pass;
    * the percentile aggregate shuffles logit-sized rows by language and
    * its |langs|-row cut table broadcasts back. */
  val qQualityThreshold = QueryDef.sql(
    "q_quality_threshold",
    """WITH t AS (
      |  SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS w
      |  FROM documents),
      |tok AS (SELECT doc_id, lang, unnest(w) AS token FROM t),
      |feat AS (
      |  SELECT doc_id, any_value(lang) AS lang, count(*) AS n,
      |         sum((CAST(concat('0x', substr(md5('qw|' || token), 1, 15))
      |              AS BIGINT) % 2001) - 1000) AS zsum
      |  FROM tok GROUP BY doc_id),
      |scored AS (
      |  SELECT doc_id, lang, floor(zsum * 10.0 / n + 0.5) / 10000.0 AS logit
      |  FROM feat),
      |cuts AS (
      |  SELECT lang, quantile_cont(logit, 0.1) AS p10,
      |         quantile_cont(logit, 0.5) AS p50
      |  FROM scored GROUP BY lang)
      |SELECT s.lang, CAST(count(*) AS BIGINT) AS n_docs,
      |       round(any_value(p10), 4) AS p10,
      |       round(any_value(p50), 4) AS p50,
      |       CAST(sum(CASE WHEN logit < p10 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_cut
      |FROM scored s JOIN cuts USING (lang)
      |GROUP BY s.lang ORDER BY s.lang""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    val scored = CorpusOps
      .qualityScore(docs, "doc_id", "text")
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .select($"doc_id", $"lang", $"logit")
    val cuts = scored
      .groupBy($"lang")
      .agg(
        expr("percentile(logit, 0.1)").as("p10"),
        expr("percentile(logit, 0.5)").as("p50"))
    scored
      .join(broadcast(cuts), "lang")
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(first($"p10"), 4).as("p10"),
        round(first($"p50"), 4).as("p50"),
        sum(when($"logit" < $"p10", 1L).otherwise(0L)).as("n_cut"))
      .orderBy($"lang")
  }

  /** DSIR-style importance weighting (Xie et al. 2023): score every
    * document by how much more likely its hashed unigram bag is under the
    * target-slice model (lang = 'en' here) than under the raw-corpus
    * model, then flag the top-100 as the selected training slice — the
    * hashed-n-gram importance-resampling recipe, with the Gumbel draw
    * replaced by a deterministic (score, id) top-k so both engines pick
    * identical rows. Delegates to [[CorpusOps.dsirWeights]]; see there
    * for the 100 TB layout (single B-row bucket table broadcast both
    * ways, ORDER BY + LIMIT selection). */
  val qDsirWeights = QueryDef.sql(
    "q_dsir_weights",
    """WITH t AS (
      |  SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS w
      |  FROM documents),
      |tok AS (SELECT doc_id, lang, unnest(w) AS token FROM t),
      |hb AS (
      |  SELECT doc_id, lang,
      |         CAST(concat('0x', substr(md5('ds|' || token), 1, 15))
      |              AS BIGINT) % 1024 AS b
      |  FROM tok),
      |bkt AS (
      |  SELECT b, count(*) AS cr,
      |         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
      |  FROM hb GROUP BY b),
      |tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM bkt),
      |w AS (
      |  SELECT b,
      |         ln((ct + 1.0) / (nt + 1024.0))
      |       - ln((cr + 1.0) / (nr + 1024.0)) AS lw
      |  FROM bkt CROSS JOIN tot),
      |perdoc AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |         round(avg(lw), 4) + 0.0 AS log_importance
      |  FROM hb JOIN w USING (b) GROUP BY doc_id),
      |top AS (
      |  SELECT doc_id FROM perdoc
      |  ORDER BY log_importance DESC, doc_id LIMIT 100)
      |SELECT p.doc_id, p.n_tokens, p.log_importance,
      |       CAST(CASE WHEN t2.doc_id IS NULL THEN 0 ELSE 1 END AS INT)
      |         AS selected
      |FROM perdoc p LEFT JOIN top t2 USING (doc_id)
      |ORDER BY p.doc_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    CorpusOps
      .dsirWeights(Tables.documents(s, d), "doc_id", "text",
        isTarget = $"lang" === "en")
      .orderBy($"doc_id")
  }

  /** Gopher-style composite rule filter (Rae et al. 2021 §A1.1): five
    * independent pass/fail quality rules per document and their
    * conjunction, each evaluated in integer arithmetic so no float
    * boundary can flip a verdict between engines (mean word length
    * ∈ [3,10] is `3·n ≤ Σlen ≤ 10·n`, repetition is `5·distinct ≥ 2·n`).
    * Pure per-row projection — the whole filter fuses into the parquet
    * scan's codegen span; delegates to [[CorpusOps.gopherRules]]. */
  val qGopherRules = QueryDef.sql(
    "q_gopher_rules",
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |         string_split_regex(trim(text), ' +') AS w
       |  FROM documents),
       |m AS (
       |  SELECT doc_id,
       |         len(w) AS n,
       |         list_aggregate(list_transform(w, x -> len(x)), 'sum') AS sl,
       |         len(regexp_extract_all(text, '[^\\w\\s]')) AS sym,
       |         len(list_filter(list_distinct(w),
       |           x -> x IN (${CorpusOps.GopherStopwords
                   .map("'" + _ + "'").mkString(",")}))) AS nstop,
       |         len(list_distinct(w)) AS nd
       |  FROM t)
       |SELECT doc_id,
       |       n BETWEEN 25 AND 1000              AS r_len,
       |       sl >= 3 * n AND sl <= 10 * n       AS r_wordlen,
       |       10 * sym < n                       AS r_symbols,
       |       nstop >= 2                         AS r_stopwords,
       |       5 * nd >= 2 * n                    AS r_repetition,
       |       (n BETWEEN 25 AND 1000) AND sl >= 3 * n AND sl <= 10 * n
       |         AND 10 * sym < n AND nstop >= 2 AND 5 * nd >= 2 * n
       |                                          AS pass
       |FROM m ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    CorpusOps
      .gopherRules(Tables.documents(s, d), "doc_id", "text")
      .orderBy($"doc_id")
  }

  /** Model-vs-rules calibration report: bucket documents by the hashed
    * classifier's ROUNDED score into tenth-wide bands and report each
    * band's Gopher-rule pass rate — the agreement audit that says
    * whether the cheap model ranks documents the way the hard rules
    * judge them (a well-calibrated scorer's pass rate rises with the
    * band). Both signals are per-row/one-aggregate computations joined
    * on the id; output is ≤ 10 rows. Banding happens on the rounded
    * score so both engines cut identically; the pass rate uses the
    * tie-safe floor(x·10⁴+0.5) rounding. */
  val qScoreCalibration = QueryDef.sql(
    "q_score_calibration",
    s"""WITH t AS (
       |  SELECT doc_id, text, string_split_regex(trim(text), ' +') AS w
       |  FROM documents),
       |tok AS (SELECT doc_id, unnest(w) AS token FROM t),
       |feat AS (
       |  SELECT doc_id, count(*) AS n,
       |         sum((CAST(concat('0x', substr(md5('qw|' || token), 1, 15))
       |              AS BIGINT) % 2001) - 1000) AS zsum
       |  FROM tok GROUP BY doc_id),
       |scored AS (
       |  SELECT doc_id,
       |         round(1.0 / (1.0 + exp(-(zsum / (1000.0 * n)))), 4) AS score
       |  FROM feat),
       |gm AS (
       |  SELECT doc_id, len(w) AS n,
       |         list_aggregate(list_transform(w, x -> len(x)), 'sum') AS sl,
       |         len(regexp_extract_all(text, '[^\\w\\s]')) AS sym,
       |         len(list_filter(list_distinct(w),
       |           x -> x IN (${CorpusOps.GopherStopwords
                   .map("'" + _ + "'").mkString(",")}))) AS nstop,
       |         len(list_distinct(w)) AS nd
       |  FROM t),
       |rules AS (
       |  SELECT doc_id,
       |         CASE WHEN (n BETWEEN 25 AND 1000) AND sl >= 3 * n
       |                   AND sl <= 10 * n AND 10 * sym < n
       |                   AND nstop >= 2 AND 5 * nd >= 2 * n
       |              THEN 1 ELSE 0 END AS pass
       |  FROM gm)
       |SELECT CAST(floor(s.score * 10) AS BIGINT) AS band,
       |       CAST(count(*) AS BIGINT)            AS n_docs,
       |       CAST(sum(r.pass) AS BIGINT)         AS n_pass,
       |       floor(sum(r.pass) * 10000.0 / count(*) + 0.5) / 10000.0
       |         AS pass_rate
       |FROM scored s JOIN rules r ON s.doc_id = r.doc_id
       |GROUP BY 1 ORDER BY band""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    val scored = CorpusOps
      .qualityScore(docs, "doc_id", "text")
      .select($"doc_id", $"score")
    val rules = CorpusOps
      .gopherRules(docs, "doc_id", "text")
      .select($"doc_id", when($"pass", 1L).otherwise(0L).as("pass"))
    scored
      .join(rules, Seq("doc_id"))
      .groupBy(floor($"score" * 10).cast("long").as("band"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"pass").as("n_pass"),
        (floor(sum($"pass") * lit(10000.0) / count(lit(1)) + lit(0.5))
          / 10000.0).as("pass_rate"))
      .orderBy($"band")
  }

  /** Interpolated Kneser–Ney smoothing over the corpus bigram model (Kneser
    * & Ney 1995; Chen & Goodman 1998 eq. 4.24) — the standard n-gram
    * smoothing a KenLM-style fluency filter actually ships, upgrading the
    * unsmoothed model of q_doc_cross_entropy: mass discounted from seen
    * bigrams is redistributed by CONTINUATION probability (how many
    * distinct contexts a word follows), not raw frequency, which is what
    * stops high-count-but-context-bound words ("Francisco") from stealing
    * probability. For the top-20 bigrams (count desc, then head/next):
    *   P_KN(next|head) = (c − D)/c(head·)
    *                   + D·N₁₊(head,·)/c(head·) · N₁₊(·,next)/B
    * with discount D = 0.75, N₁₊ the distinct-continuation counts and B
    * the distinct-bigram-type total. c ≥ 1 so c − D > 0 and the max(·,0)
    * clamp of the general form never binds.
    *
    * Engine determinism: every input is an exact integer; both engines
    * evaluate the identical float expression tree (same association, each
    * step a correctly-rounded IEEE op), then quantize via
    * floor(x·10⁶ + 0.5). Scale: two wordcount-shaped shuffles on the
    * bigram key; the model side is vocabulary-bounded (Zipf); N₁₊ tables
    * aggregate off the same bigram relation; B broadcasts as one row. */
  val qKneserNey = QueryDef.sql(
    "q_kneser_ney",
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id,
      |         unnest([{'head': w[i], 'next': w[i+1]}
      |                 for i in range(1, len(w))]) AS b
      |  FROM t WHERE len(w) >= 2),
      |bgf AS (SELECT b.head AS head, b.next AS next FROM bg),
      |bc AS (SELECT head, next, count(*) AS c FROM bgf GROUP BY 1, 2),
      |hc AS (SELECT head, sum(c) AS hcnt, count(*) AS n1fwd
      |       FROM bc GROUP BY head),
      |nc AS (SELECT next, count(*) AS n1bwd FROM bc GROUP BY next),
      |bt AS (SELECT count(*) AS b FROM bc)
      |SELECT bc.head, bc.next, CAST(bc.c AS BIGINT) AS c,
      |       floor((bc.c * 1.0 / hc.hcnt) * 1000000 + 0.5) / 1000000.0
      |         AS p_mle,
      |       floor(((bc.c - 0.75) / hc.hcnt
      |              + 0.75 * hc.n1fwd / hc.hcnt * (nc.n1bwd * 1.0 / bt.b))
      |             * 1000000 + 0.5) / 1000000.0 AS p_kn
      |FROM bc JOIN hc USING (head) JOIN nc USING (next) CROSS JOIN bt
      |ORDER BY c DESC, head, next LIMIT 20""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val bgf = Tables
      .documents(s, d)
      .select($"doc_id", words($"text").as("w"))
      .select($"doc_id", explode(shingles($"w", 2)).as("sp"))
      .select(
        substring_index($"sp", " ", 1).as("head"),
        substring_index($"sp", " ", -1).as("next"))
    val bc = bgf.groupBy($"head", $"next").agg(count(lit(1)).as("c"))
    val hc = bc.groupBy($"head")
      .agg(sum($"c").as("hcnt"), count(lit(1)).as("n1fwd"))
    val nc = bc.groupBy($"next").agg(count(lit(1)).as("n1bwd"))
    val bt = bc.agg(count(lit(1)).as("b"))
    bc
      .join(hc, Seq("head"))
      .join(nc, Seq("next"))
      .crossJoin(broadcast(bt))
      .select(
        $"head", $"next", $"c",
        (floor(($"c" * lit(1.0) / $"hcnt") * 1000000 + 0.5) / 1000000.0)
          .as("p_mle"),
        (floor((($"c" - 0.75) / $"hcnt"
          + lit(0.75) * $"n1fwd" / $"hcnt" * ($"n1bwd" * lit(1.0) / $"b"))
          * 1000000 + 0.5) / 1000000.0).as("p_kn"))
      .orderBy($"c".desc, $"head", $"next")
      .limit(20)
  }

  /** Multinomial Naive Bayes language classifier — train, predict and
    * evaluate as ONE dataflow (the textbook learned classifier beside
    * the stopword-heuristic `q_text_langid`): hash-split 80/20, hashed-
    * unigram features (1024 buckets), add-one-smoothed per-class bucket
    * log-likelihoods + log priors, argmax with (score, lang) tie-break,
    * per-class held-out accuracy.
    *
    * Scale: the model is a \|langs\|×1024 aggregate (broadcast); train
    * is one token count-shuffle; predict joins the test token stream
    * against the broadcast model and reduces per (doc, lang) — linear
    * in the corpus, no iteration (NB's closed form is exactly why it's
    * the 100 TB baseline classifier). */
  val qNaiveBayes = QueryDef.sql(
    "q_naive_bayes",
    """WITH docs AS (
      |  SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS w,
      |         CAST(concat('0x', substr(md5('nb|' || CAST(doc_id AS VARCHAR)),
      |              1, 15)) AS BIGINT) % 5 AS fold
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, lang, fold,
      |         CAST(concat('0x', substr(md5('nbf|' || unnest(w)), 1, 15))
      |              AS BIGINT) % 1024 AS b
      |  FROM docs),
      |model AS (
      |  SELECT lang, b, count(*) AS c
      |  FROM tok WHERE fold < 4 GROUP BY lang, b),
      |ltot AS (
      |  SELECT lang, sum(c) AS nt FROM model GROUP BY lang),
      |prior AS (
      |  SELECT lang, count(*) AS nd FROM docs WHERE fold < 4 GROUP BY lang),
      |ptot AS (SELECT sum(nd) AS n FROM prior),
      |scored AS (
      |  SELECT t.doc_id, t.lang AS true_lang, p.lang AS hyp,
      |         sum(ln((coalesce(m.c, 0) + 1.0) / (lt.nt + 1024.0)))
      |           + any_value(ln(p.nd * 1.0 / pt.n)) AS score
      |  FROM tok t
      |  CROSS JOIN prior p
      |  CROSS JOIN ptot pt
      |  JOIN ltot lt ON lt.lang = p.lang
      |  LEFT JOIN model m ON m.lang = p.lang AND m.b = t.b
      |  WHERE t.fold = 4
      |  GROUP BY t.doc_id, t.lang, p.lang),
      |pred AS (
      |  SELECT doc_id, true_lang, hyp,
      |         row_number() OVER (PARTITION BY doc_id
      |           ORDER BY round(score, 6) DESC, hyp) AS rn
      |  FROM scored QUALIFY rn = 1)
      |SELECT true_lang,
      |       CAST(count(*) AS BIGINT) AS n_test,
      |       CAST(sum(CASE WHEN hyp = true_lang THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_correct,
      |       round(sum(CASE WHEN hyp = true_lang THEN 1 ELSE 0 END) * 1.0
      |             / count(*), 4) AS accuracy
      |FROM pred GROUP BY true_lang ORDER BY true_lang""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import graft.functions.TextFunctions.{stableHash60, words}
    val docs = Tables.documents(s, d)
      .select($"doc_id", $"lang", words($"text").as("w"),
        pmod(stableHash60(concat(lit("nb|"), $"doc_id".cast("string"))),
          lit(5L)).as("fold"))
    val tok = docs
      .select($"doc_id", $"lang", $"fold", explode($"w").as("tokw"))
      .select($"doc_id", $"lang", $"fold",
        pmod(stableHash60(concat(lit("nbf|"), $"tokw")), lit(1024L))
          .as("b"))
    val model = tok.filter($"fold" < 4)
      .groupBy($"lang", $"b").agg(count(lit(1)).as("c"))
    val ltot = model.groupBy($"lang").agg(sum($"c").as("nt"))
    val prior = docs.filter($"fold" < 4)
      .groupBy($"lang").agg(count(lit(1)).as("nd"))
    val ptot = prior.agg(sum($"nd").as("n"))
    val hyp = prior
      .crossJoin(broadcast(ptot))
      .join(ltot, "lang")
      .select($"lang".as("hyp"), $"nd", $"n", $"nt")
    val scored = tok
      .filter($"fold" === 4)
      .crossJoin(broadcast(hyp))
      .join(broadcast(model.select($"lang".as("hyp"), $"b",
        $"c")), Seq("hyp", "b"), "left")
      .groupBy($"doc_id", $"lang", $"hyp")
      .agg((sum(log((coalesce($"c", lit(0L)) + 1.0) / ($"nt" + 1024.0)))
        + first(log($"nd" * lit(1.0) / $"n"))).as("score"))
    val wPred = Window.partitionBy($"doc_id")
      .orderBy(round($"score", 6).desc, $"hyp")
    scored
      .withColumn("rn", row_number().over(wPred))
      .filter($"rn" === 1)
      .groupBy($"lang".as("true_lang"))
      .agg(count(lit(1)).cast("long").as("n_test"),
        sum(when($"hyp" === $"lang", 1L).otherwise(0L)).cast("long")
          .as("n_correct"),
        round(sum(when($"hyp" === $"lang", 1.0).otherwise(0.0))
          / count(lit(1)), 4).as("accuracy"))
      .orderBy($"true_lang")
  }

  def defs: Seq[QueryDef] =
    Seq(qQualityClassifier, qDocCrossEntropy, qQualityThreshold,
      qDsirWeights, qGopherRules, qScoreCalibration, qKneserNey,
      qNaiveBayes)
}
