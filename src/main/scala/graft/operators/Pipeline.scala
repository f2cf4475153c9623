package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed LLM-data-pipeline: what a training-data job actually runs
  * over 100 TB of raw documents — quality gate → exact-dup removal →
  * near-dup clustering → canonical document selection — as ONE dataflow,
  * oracle-checked end-to-end (each stage is individually gated elsewhere;
  * this guards the composition).
  *
  * Scale shape: stages 1-2 are narrow or single-shuffle; near-dup
  * clustering reuses the inverted-index join from Dedup (bounded by the
  * postings lists); canonical selection is a window over candidate
  * clusters only — documents that never collide take the narrow path.
  */
object Pipeline {

  /** Stages 1-2 of every corpus pipeline — quality gate + exact-dup
    * removal — as shared SQL CTEs (`quality`, `exact`), so the two gated
    * pipelines can never drift on the thresholds or the keeper rule. */
  private val qualityCtes =
    """quality AS (
      |  SELECT doc_id, text, lang, n_chars,
      |         string_split_regex(trim(text), ' +') AS w
      |  FROM documents
      |  WHERE n_chars >= 100
      |    AND len(list_distinct(string_split_regex(trim(text), ' +'))) * 1.0
      |        / len(string_split_regex(trim(text), ' +')) > 0.3),
      |exact AS (
      |  -- exact-dup removal: keep min doc_id per content hash
      |  SELECT * FROM quality
      |  WHERE doc_id IN (
      |    SELECT min(doc_id) FROM quality GROUP BY md5(text)))""".stripMargin

  /** The Spark twin of [[qualityCtes]]: quality-gated, exact-deduped
    * documents with the words array staged as `w`. Stage 1 is narrow;
    * stage 2's only wide op groups on a 16-byte content hash.
    *
    * Exact-dup keeper = ONE aggregate: `min_by(struct(row), doc_id)` per
    * md5(text) (r15, guide §2.3/§2.5). The r13 shape (groupBy + semi-join
    * back) scanned the quality gate twice; the r14 fix (min-over-window on
    * the hash) scanned once but funneled every exact-dup clique — full
    * rows — into ONE window task with no partial aggregation, the skew
    * class the r14 verdict flagged for 100 TB (a boilerplate page
    * duplicated 10⁶× serializes and spills). min_by keeps the one-scan win
    * AND restores partial aggregation: each map task reduces its slice of
    * a clique to one buffered row BEFORE the exchange, so no clique is
    * ever assembled anywhere. `text` itself is projected away pre-exchange
    * (consumers use doc_id/lang/n_chars/w; only the hash is needed) —
    * roughly halving the exchange's bytes. The struct buffer makes this a
    * SortAggregate rather than a hash aggregate (fixture cost ~3% on the
    * two pipeline queries, matched A/B); PlanSpec pins the partial
    * min_by + no-Window shape, DedupSpec pins mega-clique behavior. */
  private[graft] def cleanedDocsOf(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val quality = docs
      .withColumn("w", words($"text"))
      .filter($"n_chars" >= 100 &&
        size(array_distinct($"w")) * lit(1.0) / size($"w") > 0.3)
    val cols = Seq("doc_id", "lang", "n_chars", "w")
    quality
      .groupBy(md5($"text").as("__h"))
      .agg(min_by(struct(cols.map(col): _*), $"doc_id").as("__r"))
      .select(cols.map(c => $"__r".getField(c).as(c)): _*)
  }

  private def cleanedDocs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    cleanedDocsOf(Tables.documents(s, d))

  val qCleanCorpus = QueryDef.sql(
    "q_pipeline_clean_corpus",
    s"""WITH $qualityCtes,
      |ds AS (
      |  SELECT DISTINCT doc_id,
      |         unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |                 for i in range(1, len(w)-1)]) AS s
      |  FROM exact WHERE len(w) >= 3),
      |cnt AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
      |  FROM ds a JOIN ds b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |neardups AS (
      |  -- near-dup edges at jaccard >= 0.8; loser = the larger doc_id
      |  SELECT DISTINCT d2 AS loser
      |  FROM pairs JOIN cnt ca ON d1 = ca.doc_id JOIN cnt cb ON d2 = cb.doc_id
      |  WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.8)
      |SELECT e.doc_id, e.lang, CAST(e.n_chars AS BIGINT) AS n_chars
      |FROM exact e LEFT JOIN neardups nd ON e.doc_id = nd.loser
      |WHERE nd.loser IS NULL
      |ORDER BY e.doc_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    // stages 1-2: shared quality gate + exact-dup removal
    val exact = cleanedDocs(s, d)
    // stage 3: near-dup edges via the inverted shingle index, with the
    // document-frequency cap (Dedup.JaccardDfCap) bounding the quadratic
    // tail of hot boilerplate shingles
    val ds = Dedup.cappedPostings(
      exact
        .select($"doc_id", explode(array_distinct(shingles($"w", 3))).as("s"))
        .repartition(col("s")),
      Dedup.JaccardDfCap)
    val cnt = ds.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val losers = ds
      .as("a")
      .join(ds.as("b"), $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .agg(count(lit(1)).as("common"))
      .join(cnt.as("ca"), $"d1" === $"ca.doc_id")
      .join(cnt.as("cb"), $"d2" === $"cb.doc_id")
      .filter($"common" * lit(1.0) / ($"ca.n" + $"cb.n" - $"common") >= 0.8)
      .select($"d2".as("loser"))
      .distinct()
    // stage 4: canonical selection — drop near-dup losers
    exact
      .join(losers, $"doc_id" === $"loser", "left_anti")
      .select($"doc_id", $"lang", $"n_chars".cast("long").as("n_chars"))
      .orderBy($"doc_id")
  }

  /** The training-mix pipeline: quality gate → exact-dup removal →
    * deterministic stratified downsampling → per-shard sequence packing,
    * as ONE dataflow — the path from raw corpus to "which context window
    * does each surviving document land in". Every stage is individually
    * gated elsewhere (q_text_quality, q_dedup_exact, q_sample_stratified,
    * q_pack_sequences); this guards the composition end-to-end.
    *
    * Scale shape: stages 1-3 are narrow or single-shuffle (the dedup
    * group-by on a 16-byte hash is the only wide op before packing); the
    * sampling decision is a pure per-row hash predicate; packing windows
    * partition by the language shard, so shards pack in parallel.
    */
  val qTrainingMix = QueryDef.sql(
    "q_pipeline_training_mix",
    s"""WITH $qualityCtes,
       |sampled AS (
       |  SELECT doc_id, lang, len(w) AS n_tokens
       |  FROM exact
       |  WHERE CAST(concat('0x', substr(md5('smp|' || doc_id), 1, 15))
       |             AS BIGINT) % 1000
       |        < CASE lang ${Corpus.rateSql} ELSE 1000 END),
       |packed AS (
       |  SELECT doc_id, lang, n_tokens,
       |         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           - n_tokens AS start_tok
       |  FROM sampled)
       |SELECT doc_id, lang,
       |       CAST(n_tokens AS INT)                  AS n_tokens,
       |       CAST(start_tok // 512 AS INT)          AS bin,
       |       CAST(start_tok % 512 AS INT)           AS offset,
       |       CAST((start_tok + n_tokens - 1) // 512
       |            - start_tok // 512 + 1 AS INT)    AS span_bins
       |FROM packed
       |ORDER BY lang, doc_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    // stages 1-2 shared with qCleanCorpus; stage 3 is the SAME library
    // sampler the q_sample_stratified gate verifies (defaults:
    // permille 1000, salt "smp")
    val sampled = CorpusOps
      .stratifiedSample(cleanedDocs(s, d), "doc_id", "lang",
        Corpus.SampleRates)
      .select($"doc_id", $"lang", size($"w").as("n_tokens"))
    val win = Window
      .partitionBy($"lang")
      .orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sampled
      .withColumn("start_tok",
        (sum($"n_tokens").over(win) - $"n_tokens").cast("long"))
      .select(
        $"doc_id", $"lang", $"n_tokens",
        expr("start_tok div 512").cast("int").as("bin"),
        ($"start_tok" % 512).cast("int").as("offset"),
        (expr("(start_tok + n_tokens - 1) div 512")
          - expr("start_tok div 512") + 1).cast("int").as("span_bins"))
      .orderBy($"lang", $"doc_id")
  }

  /** Tokens per output shard for the export manifest. */
  val ShardTokens = 2048L

  /** Prefix-sum bucket width for [[qShardManifest]], chosen so the
    * per-bucket totals relation stays ~10k rows at ANY corpus size —
    * the gauge's two-phase recipe assumes aggregate-sized totals, and a
    * FIXED width would make the O(buckets²) offsets join quadratic in
    * the corpus (1e7 buckets at 1e9 docs = 1e14 comparisons). Sized from
    * the ID-SPACE EXTENT (max doc_id), NOT the row count: buckets are
    * `doc_id div width`, so with sparse ids (max_id ≫ count) a
    * count-derived width would mint far more than the ~10k-bucket
    * design bound and the quadratic returns. Any monotone bucketing
    * yields identical results, so the width is free to scale; the
    * oracle's global window never sees it. */
  private[graft] def shardBucketSize(maxDocId: Long): Long =
    math.max(100L, (maxDocId + 1) / 10000L)

  /** Export-stage shard manifest: documents are laid out in doc_id order
    * and cut into ~[[ShardTokens]]-token shards by exclusive prefix sum
    * (a document starts the next shard when the running total crosses
    * the boundary — documents are never split). Emits, per shard, the
    * doc/token counts, the id range, and an order-independent content
    * checksum — what a 100 TB training-data export writes next to its
    * shard files so a reader can verify completeness.
    *
    * Scale: the prefix sum is the same two-phase shape as
    * q_events_gauge — intra-bucket running sums in parallel (bucket =
    * doc_id div 100, monotone in the layout order) plus inter-bucket
    * offsets from a broadcast triangular join over the per-bucket
    * TOTALS. Nothing funnels through a single task; the checksum stays
    * in a prime field so the sum cannot overflow either engine. */
  val qShardManifest = QueryDef.sql(
    "q_shard_manifest",
    s"""WITH t AS (
       |  SELECT doc_id,
       |         len(string_split_regex(trim(text), ' +')) AS n_tok,
       |         CAST(concat('0x', substr(md5('sh|' || doc_id), 1, 15))
       |              AS BIGINT) % 1000000007 AS h
       |  FROM documents),
       |laid AS (
       |  SELECT doc_id, n_tok, h,
       |         coalesce(sum(n_tok) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS cum_before
       |  FROM t)
       |SELECT CAST(cum_before // $ShardTokens AS BIGINT) AS shard_id,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |       min(doc_id) AS first_doc,
       |       max(doc_id) AS last_doc,
       |       CAST(sum(h) % 1000000007 AS BIGINT) AS checksum
       |FROM laid GROUP BY shard_id ORDER BY shard_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    // bucket width scales with the id space (driver-side max() reads
    // parquet column statistics — as cheap as the count it replaces);
    // coalesce guards the empty-table null → the query degrades to an
    // empty manifest instead of an NPE
    val bucketSize = shardBucketSize(
      Tables.documents(s, d)
        .agg(coalesce(max($"doc_id"), lit(0L))).head().getLong(0))
    val t = Tables
      .documents(s, d)
      .select($"doc_id", words($"text").as("w"))
      .select(
        $"doc_id",
        size($"w").cast("long").as("n_tok"),
        pmod(stableHash60(concat(lit("sh|"), $"doc_id".cast("string"))),
          lit(1000000007L)).as("h"),
        expr(s"doc_id div $bucketSize").as("bucket"))
    // two-phase exclusive prefix sum (see q_events_gauge): intra-bucket
    // running sums parallelize; offsets come from the per-bucket totals
    val intraW = Window
      .partitionBy($"bucket")
      .orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = t.groupBy($"bucket").agg(sum($"n_tok").as("btotal"))
    val prior = totals
      .select($"bucket".as("pbucket"), $"btotal".as("ptotal"))
    val offsets = totals
      .join(broadcast(prior), $"pbucket" < $"bucket", "left")
      .groupBy($"bucket")
      .agg(coalesce(sum($"ptotal"), lit(0L)).as("off"))
    t.withColumn("intra", coalesce(sum($"n_tok").over(intraW), lit(0L)))
      .join(broadcast(offsets), "bucket")
      .withColumn("cum_before", $"intra" + $"off")
      .groupBy(expr(s"cum_before div $ShardTokens").cast("long").as("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tok").as("n_tokens"),
        min($"doc_id").as("first_doc"),
        max($"doc_id").as("last_doc"),
        pmod(sum($"h"), lit(1000000007L)).as("checksum"))
      .orderBy($"shard_id")
  }

  /** The full r6 signal stack fused into one per-document curation
    * verdict: hashed quality score, normalized token entropy, and n-gram
    * novelty, each computed by the SAME oracle-gated building block it is
    * gated under, joined on the id and reduced to a keep flag plus a
    * '|'-separated reason list — the decision table a curation run
    * actually materializes before dropping documents.
    *
    * Thresholds compare ROUNDED signals (an ulp cannot flip a verdict);
    * docs too short to shingle count as fully novel. Scale: the three
    * signals are independent linear passes that join on the id — no
    * signal ever sees another's corpus-sized intermediate state. */
  val qCurationReport = QueryDef.sql(
    "q_curation_report",
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), ' +') AS w
      |  FROM documents),
      |tok AS (SELECT doc_id, unnest(w) AS token FROM t),
      |tc AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
      |ent AS (
      |  SELECT doc_id, n,
      |         CASE WHEN n_types = 1 THEN 0.0
      |              ELSE round((log2(n * 1.0) - s / n)
      |                         / log2(n_types * 1.0), 4) + 0.0 END AS norm_entropy
      |  FROM (SELECT doc_id, sum(c) AS n, count(*) AS n_types,
      |               sum(c * log2(c * 1.0)) AS s
      |        FROM tc GROUP BY doc_id)),
      |feat AS (
      |  SELECT doc_id, count(*) AS nt,
      |         sum((CAST(concat('0x', substr(md5('qw|' || token), 1, 15))
      |              AS BIGINT) % 2001) - 1000) AS zsum
      |  FROM tok GROUP BY doc_id),
      |qual AS (
      |  SELECT doc_id,
      |         CAST(CASE WHEN 1.0 / (1.0 + exp(-(zsum / (1000.0 * nt)))) >= 0.5
      |                   THEN 1 ELSE 0 END AS INT) AS keep_quality
      |  FROM feat),
      |ds AS (
      |  SELECT DISTINCT doc_id,
      |         unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |                 for i in range(1, len(w)-1)]) AS s
      |  FROM t WHERE len(w) >= 3),
      |own AS (SELECT s, min(doc_id) AS first_doc FROM ds GROUP BY s),
      |nov AS (
      |  SELECT ds.doc_id,
      |         round(sum(CASE WHEN own.first_doc = ds.doc_id
      |                        THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
      |           AS novelty
      |  FROM ds JOIN own USING (s) GROUP BY ds.doc_id),
      |verdict AS (
      |  SELECT e.doc_id,
      |         CAST(e.n AS BIGINT) AS n_tokens,
      |         e.norm_entropy,
      |         coalesce(nov.novelty, 1.0) AS novelty,
      |         q.keep_quality,
      |         concat(
      |           CASE WHEN q.keep_quality = 0 THEN '|low_quality' ELSE '' END,
      |           CASE WHEN e.norm_entropy < 0.5 THEN '|low_entropy' ELSE '' END,
      |           CASE WHEN coalesce(nov.novelty, 1.0) < 0.2
      |                THEN '|low_novelty' ELSE '' END) AS r
      |  FROM ent e
      |    JOIN qual q USING (doc_id)
      |    LEFT JOIN nov USING (doc_id))
      |SELECT doc_id, n_tokens, norm_entropy, novelty, keep_quality,
      |       CAST(CASE WHEN r = '' THEN 1 ELSE 0 END AS INT) AS keep,
      |       CASE WHEN r = '' THEN 'ok' ELSE substr(r, 2) END AS reasons
      |FROM verdict ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val ent = graft.operators.TextOps.qTokenEntropy.fn(s, d)
      .select($"doc_id", $"n_tokens", $"norm_entropy")
    val qual = CorpusOps
      .qualityScore(Tables.documents(s, d), "doc_id", "text")
      .select($"doc_id", $"keep".as("keep_quality"))
    val nov = graft.operators.Dedup.qNgramNovelty.fn(s, d)
      .select($"doc_id", $"novelty")
    val novC = coalesce($"novelty", lit(1.0))
    val r = concat(
      when($"keep_quality" === 0, "|low_quality").otherwise(""),
      when($"norm_entropy" < 0.5, "|low_entropy").otherwise(""),
      when(novC < 0.2, "|low_novelty").otherwise(""))
    ent
      .join(qual, "doc_id")
      .join(nov, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens", $"norm_entropy",
        novC.as("novelty"), $"keep_quality",
        when(r === "", 1).otherwise(0).cast("int").as("keep"),
        when(r === "", "ok").otherwise(substring(r, 2, 1000000))
          .as("reasons"))
      .orderBy($"doc_id")
  }

  /** The r6 curation composite: Gopher rule filter → canonical-keeper
    * near-dedup → per-shard packing report, as ONE dataflow — the
    * "filter, dedup, pack" spine of a pretraining data build, assembled
    * from the individually-gated operators (q_gopher_rules,
    * q_dedup_canonical, q_pack_efficiency) so the composition itself is
    * oracle-proven end to end.
    *
    * Scale shape: the rule filter is a narrow projection that SHRINKS
    * the corpus before any wide op runs; dedup's banding joins and the
    * canonical argmax see only survivors; the final report is a
    * |shards|-row aggregate. Each stage's 100 TB argument is made at
    * its own gate — this query proves they compose. */
  val qCuratePack = QueryDef.sql(
    "q_pipeline_curate_pack",
    s"""WITH RECURSIVE gw AS (
       |  SELECT doc_id, lang, n_chars, text,
       |         string_split_regex(trim(text), ' +') AS w
       |  FROM documents),
       |gm AS (
       |  SELECT doc_id, lang, n_chars, w, len(w) AS n,
       |         list_aggregate(list_transform(w, x -> len(x)), 'sum') AS sl,
       |         len(regexp_extract_all(text, '[^\\w\\s]')) AS sym,
       |         len(list_filter(list_distinct(w),
       |           x -> x IN (${CorpusOps.GopherStopwords
                   .map("'" + _ + "'").mkString(",")}))) AS nstop,
       |         len(list_distinct(w)) AS nd
       |  FROM gw),
       |surv AS (
       |  SELECT doc_id, lang, n_chars, w FROM gm
       |  WHERE n BETWEEN 25 AND 1000 AND sl >= 3 * n AND sl <= 10 * n
       |    AND 10 * sym < n AND nstop >= 2 AND 5 * nd >= 2 * n),
       |${Dedup.minhashPairsCtesOver("surv")},
       |cc_sym AS (
       |  SELECT d1 AS a, d2 AS b FROM cand
       |  UNION
       |  SELECT d2, d1 FROM cand),
       |reach(a, b) AS (
       |  SELECT a, b FROM cc_sym
       |  UNION
       |  SELECT r.a, s.b FROM reach r JOIN cc_sym s ON r.b = s.a),
       |lbl AS (SELECT a AS doc_id, min(b) AS m FROM reach GROUP BY a),
       |grp AS (
       |  SELECT s.doc_id,
       |         least(coalesce(l.m, s.doc_id), s.doc_id) AS group_id,
       |         s.n_chars
       |  FROM surv s LEFT JOIN lbl l ON s.doc_id = l.doc_id),
       |st AS (SELECT group_id, max(n_chars) AS mx FROM grp GROUP BY group_id),
       |canon AS (
       |  SELECT g.group_id, min(g.doc_id) AS canonical_doc
       |  FROM grp g JOIN st ON g.group_id = st.group_id
       |                    AND g.n_chars = st.mx
       |  GROUP BY g.group_id),
       |kept AS (
       |  SELECT s.doc_id, s.lang, len(s.w) AS n_tokens
       |  FROM surv s
       |    JOIN grp g ON s.doc_id = g.doc_id
       |    JOIN canon c ON g.group_id = c.group_id
       |  WHERE s.doc_id = c.canonical_doc),
       |packed AS (
       |  SELECT doc_id, lang, n_tokens,
       |         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           - n_tokens AS start_tok
       |  FROM kept)
       |SELECT lang,
       |  CAST(count(*) AS BIGINT)      AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(max((start_tok + n_tokens - 1) // 512) + 1 AS BIGINT)
       |    AS bins_used,
       |  CAST((max((start_tok + n_tokens - 1) // 512) + 1) * 512 AS BIGINT)
       |    AS capacity,
       |  floor(sum(n_tokens) * 10000.0 /
       |        ((max((start_tok + n_tokens - 1) // 512) + 1) * 512) + 0.5)
       |    / 10000.0 AS fill_ratio,
       |  CAST(count(*) FILTER (WHERE (start_tok + n_tokens - 1) // 512
       |                              > start_tok // 512) AS BIGINT)
       |    AS straddle_docs,
       |  CAST(sum((start_tok + n_tokens - 1) // 512 - start_tok // 512)
       |       AS BIGINT) AS boundary_crossings
       |FROM packed
       |GROUP BY lang ORDER BY lang""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    val pass = CorpusOps
      .gopherRules(docs, "doc_id", "text")
      .filter($"pass")
      .select($"doc_id")
    val surv = docs.join(pass, Seq("doc_id"))
    val keepIds = CorpusOps
      .canonicalPerGroup(surv, "doc_id", "text", "n_chars")
      .filter($"keep")
      .select($"doc_id")
    CorpusOps
      .packEfficiency(surv.join(keepIds, Seq("doc_id")),
        "doc_id", "text", "lang")
      .orderBy($"lang")
  }

  /** Governance release gate — the round-7 audits fused into one
    * per-source verdict a corpus DISTRIBUTION runs before shipping:
    * blocklist-violation share, boilerplate occurrence rate,
    * k-anonymity risky-group count and l-diversity homogeneous-group
    * count, each by its own gated definition, combined into a
    * release_ok flag (rates compared at their tie-safe rounding). The
    * composite analog of q_pipeline_clean_corpus for the
    * privacy/content-policy axis.
    *
    * Scale: four independent aggregate passes (token screen fused into
    * the scan; chunk exchange keyed (source, chunk); two QI
    * count-shuffles) joined on the |sources|-row key — no corpus-sized
    * intermediate anywhere. */
  val qGovernance = QueryDef.sql(
    "q_pipeline_governance",
    """WITH t AS (
      |  SELECT doc_id, source, lang, n_chars,
      |         string_split_regex(trim(text), ' +') AS w
      |  FROM documents),
      |bl AS (
      |  SELECT source,
      |         count(*) AS n_docs,
      |         sum(CASE WHEN len(list_filter(w, x ->
      |               list_contains(['slow', 'merge', 'window'], x)))
      |               * 1.0 / len(w) >= 0.05 THEN 1 ELSE 0 END)
      |           AS n_blocked
      |  FROM t GROUP BY source),
      |c AS (
      |  SELECT doc_id, source,
      |         unnest([list_aggregate(w[i*10+1:i*10+10], 'string_agg', ' ')
      |                 for i in range(0, CAST(ceil(len(w)/10.0) AS INT))])
      |           AS chunk
      |  FROM t),
      |cf AS (
      |  SELECT source, chunk, count(*) AS occ,
      |         count(DISTINCT doc_id) AS df
      |  FROM c GROUP BY source, chunk),
      |boil AS (
      |  SELECT source,
      |         sum(CASE WHEN df >= 3 THEN occ ELSE 0 END) AS boiler_occ,
      |         sum(occ) AS total_chunks
      |  FROM cf GROUP BY source),
      |kan AS (
      |  SELECT source,
      |         sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS risky_groups
      |  FROM (SELECT source, lang, n_chars // 256 AS band, count(*) AS n
      |        FROM documents GROUP BY 1, 2, 3)
      |  GROUP BY source),
      |ld AS (
      |  SELECT source,
      |         sum(CASE WHEN nl < 2 THEN 1 ELSE 0 END) AS homog_groups
      |  FROM (SELECT source, n_chars // 256 AS band,
      |               count(DISTINCT lang) AS nl
      |        FROM documents GROUP BY 1, 2)
      |  GROUP BY source)
      |SELECT bl.source AS source,
      |       CAST(bl.n_docs AS BIGINT) AS n_docs,
      |       CAST(bl.n_blocked AS BIGINT) AS n_blocked,
      |       floor(boil.boiler_occ * 10000.0 / boil.total_chunks + 0.5)
      |         / 10000.0 AS boiler_rate,
      |       CAST(kan.risky_groups AS BIGINT) AS risky_groups,
      |       CAST(ld.homog_groups AS BIGINT) AS homog_groups,
      |       (floor(bl.n_blocked * 10000.0 / bl.n_docs + 0.5) / 10000.0
      |          <= 0.02
      |        AND floor(boil.boiler_occ * 10000.0 / boil.total_chunks + 0.5)
      |          / 10000.0 <= 0.05
      |        AND kan.risky_groups <= 5) AS release_ok
      |FROM bl
      |JOIN boil ON boil.source = bl.source
      |JOIN kan ON kan.source = bl.source
      |JOIN ld ON ld.source = bl.source
      |ORDER BY source""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import graft.functions.TextFunctions.words
    val t = Tables
      .documents(s, d)
      .select($"doc_id", $"source", $"lang", $"n_chars",
        words($"text").as("w"))
    val blTerms = array(Seq("slow", "merge", "window").map(lit): _*)
    val bl = t
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(
          size(filter($"w", x => array_contains(blTerms, x))) * lit(1.0) /
            size($"w") >= 0.05, 1L).otherwise(0L)).as("n_blocked"))
    val cf = t
      .select($"doc_id", $"source",
        explode(
          transform(
            sequence(lit(0), ceil(size($"w") / lit(10.0)).cast("int") - 1),
            i => array_join(slice($"w", i * 10 + 1, lit(10)), " ")))
          .as("chunk"))
      .groupBy($"source", $"chunk")
      .agg(count(lit(1)).as("occ"), countDistinct($"doc_id").as("df"))
    val boil = cf
      .groupBy($"source")
      .agg(
        sum(when($"df" >= 3, $"occ").otherwise(0L)).as("boiler_occ"),
        sum($"occ").as("total_chunks"))
    val docs = Tables.documents(s, d)
    val kan = docs
      .groupBy($"source", $"lang",
        ($"n_chars".cast("long") / 256).cast("long").as("band"))
      .agg(count(lit(1)).as("n"))
      .groupBy($"source")
      .agg(sum(when($"n" < 5, 1L).otherwise(0L)).as("risky_groups"))
    val ld = docs
      .groupBy($"source",
        ($"n_chars".cast("long") / 256).cast("long").as("band"))
      .agg(countDistinct($"lang").as("nl"))
      .groupBy($"source")
      .agg(sum(when($"nl" < 2, 1L).otherwise(0L)).as("homog_groups"))
    def rate(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      floor(num * lit(10000.0) / den + 0.5) / 10000.0
    bl.join(boil, "source")
      .join(broadcast(kan), "source")
      .join(broadcast(ld), "source")
      .select(
        $"source", $"n_docs", $"n_blocked",
        rate($"boiler_occ", $"total_chunks").as("boiler_rate"),
        $"risky_groups", $"homog_groups",
        (rate($"n_blocked", $"n_docs") <= 0.02 &&
          rate($"boiler_occ", $"total_chunks") <= 0.05 &&
          $"risky_groups" <= 5).as("release_ok"))
      .orderBy($"source")
  }

  def defs: Seq[QueryDef] =
    Seq(qCleanCorpus, qTrainingMix, qShardManifest, qCurationReport,
      qCuratePack, qGovernance)
}
