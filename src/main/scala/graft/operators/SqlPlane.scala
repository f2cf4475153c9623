package graft.operators

import graft.{QueryDef, Tables}

/** The SQL plane end-to-end: a gated query whose Spark side goes through
  * `spark.sql` text with graft's registered Catalyst functions
  * ([[graft.plans.GraftExtensions]]) — proving a SQL-only user gets the
  * same engine (and the same oracle-checked answers) as the DataFrame
  * API, with no wrapper in between.
  *
  * Three registered pieces are exercised in one statement:
  *  - `stable_hash60` — the custom scalar Expression (F1, the engine's
  *    replay-stable md5-derived hash; plans/StableHash60.scala), here
  *    driving a 64-way shard assignment;
  *  - `vec_dot` — the codegen'd FloatVectorDot (whole-stage-codegen'd
  *    primitive loop; plans/VectorExpressions.scala);
  *  - `kmv_distinct` — the mergeable k-minimum-values sketch aggregate
  *    (plans/KmvAgg.scala), as a scalar subquery, with k=16 small enough
  *    that the ESTIMATOR path (not the exact-set path) is what the
  *    oracle must reproduce bit-for-bit.
  *
  * Scale: one narrow scan + a 16-long sketch aggregate — the per-row
  * expressions fuse into the scan's codegen span, and the sketch's
  * partial buffers carry ≤ k longs per partition regardless of corpus
  * size.
  */
object SqlPlane {

  val qSqlEngine = QueryDef.sql(
    "q_sql_engine",
    """WITH h AS (
      |  SELECT DISTINCT CAST(concat('0x', substr(md5('sq|' || vec_id), 1, 15))
      |                       AS BIGINT) AS h
      |  FROM embeddings),
      |est AS (
      |  SELECT CAST(CASE WHEN count(*) < 16 THEN count(*)
      |              ELSE floor(15.0 * (1152921504606846976.0 /
      |                   CAST((list(h ORDER BY h))[16] AS DOUBLE)))
      |         END AS BIGINT) AS n_ids_est
      |  FROM h)
      |SELECT vec_id,
      |       CAST(concat('0x', substr(md5('sq|' || vec_id), 1, 15))
      |            AS BIGINT) % 64 AS shard,
      |       round(list_inner_product(CAST(embedding AS DOUBLE[]),
      |                                CAST(embedding AS DOUBLE[])), 4)
      |         AS self_dot,
      |       (SELECT n_ids_est FROM est) AS n_ids_est
      |FROM embeddings
      |WHERE vec_id < 200
      |ORDER BY vec_id""".stripMargin
  ) { (s, d) =>
    // the whole point: register on the LIVE session (withExtensions only
    // applies at build time) and run SQL text, not DataFrame calls
    graft.plans.GraftExtensions.register(s)
    Tables.embeddings(s, d).createOrReplaceTempView("graft_embeddings")
    s.sql(
      """SELECT vec_id,
        |       stable_hash60(concat('sq|', CAST(vec_id AS STRING))) % 64
        |         AS shard,
        |       round(vec_dot(embedding, embedding), 4) AS self_dot,
        |       (SELECT kmv_distinct(
        |                 stable_hash60(concat('sq|', CAST(vec_id AS STRING))),
        |                 16)
        |        FROM graft_embeddings) AS n_ids_est
        |FROM graft_embeddings
        |WHERE vec_id < 200
        |ORDER BY vec_id""".stripMargin)
  }

  /** The round-7 registered pieces through the same SQL-text plane:
    * `jaro_winkler` (codegen'd scoring Expression) powering a SQL-only
    * fuzzy join, and `kmv_sketch` (the k-minimum-values ARRAY aggregate)
    * providing the sketch whose 8th value both engines must agree on
    * bit-for-bit. One length-blocked fuzzy self-pair count per name
    * length plus the sketch probe — a SQL user composing linkage without
    * touching the DataFrame API. */
  val qSqlLinkage = QueryDef.sql(
    "q_sql_linkage",
    """WITH m AS (SELECT DISTINCT p_name FROM part),
      |pairs AS (
      |  SELECT len(a.p_name) AS name_len,
      |         count(*) AS n_pairs,
      |         sum(CASE WHEN round(jaro_winkler_similarity(a.p_name, b.p_name),
      |                         4) >= 0.85 THEN 1 ELSE 0 END) AS n_similar
      |  FROM m a JOIN m b
      |    ON a.p_name < b.p_name AND len(a.p_name) = len(b.p_name)
      |  GROUP BY 1),
      |h AS (
      |  SELECT DISTINCT CAST(concat('0x', substr(md5(p_name), 1, 15))
      |                       AS BIGINT) AS h
      |  FROM part),
      |sk AS (
      |  SELECT (list_sort(list(h)))[8] AS h8 FROM h)
      |SELECT name_len, CAST(n_pairs AS BIGINT) AS n_pairs,
      |       CAST(n_similar AS BIGINT) AS n_similar,
      |       (SELECT h8 FROM sk) AS sketch_h8
      |FROM pairs ORDER BY name_len""".stripMargin
  ) { (s, d) =>
    graft.plans.GraftExtensions.register(s)
    Tables.part(s, d).createOrReplaceTempView("graft_part")
    s.sql(
      """WITH m AS (SELECT DISTINCT p_name FROM graft_part),
        |pairs AS (
        |  SELECT length(a.p_name) AS name_len,
        |         count(*) AS n_pairs,
        |         sum(CASE WHEN round(jaro_winkler(a.p_name, b.p_name), 4)
        |                       >= 0.85 THEN 1 ELSE 0 END) AS n_similar
        |  FROM m a JOIN m b
        |    ON a.p_name < b.p_name AND length(a.p_name) = length(b.p_name)
        |  GROUP BY 1),
        |sk AS (
        |  SELECT element_at(kmv_sketch(stable_hash60(p_name), 8), 8) AS h8
        |  FROM graft_part)
        |SELECT CAST(name_len AS BIGINT) AS name_len, n_pairs, n_similar,
        |       (SELECT h8 FROM sk) AS sketch_h8
        |FROM pairs ORDER BY name_len""".stripMargin)
  }

  /** The LAST four Scala-only registered pieces through the SQL-text
    * plane (closing the r7 coverage ask — every custom Catalyst piece is
    * now reachable from `spark.sql`):
    *  - `nfc_normalize` — the codegen'd canonicalization Expression,
    *    here counting already-canonical documents per source;
    *  - `pq_adc_sum` — the IVF-PQ ADC scoring kernel (M=2, K=4 inline
    *    codebook; the oracle unrolls the same subspace-major lookups
    *    longhand with 1-indexed list math);
    *  - `hist_buckets` — the mergeable sparse-histogram aggregate
    *    (width 50 over positive event values), consumed in-query as
    *    bucket count + bucket-0 occupancy so no MAP column reaches the
    *    output;
    *  - `space_saving` — the Metwally heavy-hitters sketch with k=16 ≥
    *    |event types|, where the summary is provably EXACT (no eviction
    *    ever fires) and therefore deterministic under any partitioning —
    *    the top entry must equal the oracle's exact mode.
    *
    * Scale: one narrow documents scan (normalize + ADC fuse into its
    * codegen span) + two aggregate-sized event subqueries whose partial
    * buffers are O(buckets) / O(k) per partition. */
  val qSqlCuration = QueryDef.sql(
    "q_sql_curation",
    """WITH hb AS (
      |  SELECT CAST(floor(value / 50.0) AS INT) AS b, count(*) AS n
      |  FROM events WHERE value > 0 GROUP BY 1),
      |nb AS (SELECT count(*) AS n_buckets FROM hb),
      |b0 AS (SELECT coalesce((SELECT n FROM hb WHERE b = 0), 0) AS n0),
      |tt AS (SELECT event_type, count(*) AS n FROM events
      |       GROUP BY 1 ORDER BY n DESC, event_type LIMIT 1)
      |SELECT source,
      |       count(*) AS n_docs,
      |       CAST(sum(CASE WHEN nfc_normalize(text) = text
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_nfc_clean,
      |       CAST(sum(([10, 23, 7, 41])[CAST(doc_id % 4 AS INT) + 1] +
      |                ([5, 17, 29, 3])[CAST(doc_id % 3 AS INT) + 1])
      |            AS BIGINT) AS adc_sum,
      |       (SELECT CAST(n_buckets AS BIGINT) FROM nb) AS n_value_buckets,
      |       (SELECT CAST(n0 AS BIGINT) FROM b0) AS bucket0_n,
      |       (SELECT event_type FROM tt) AS top_type,
      |       (SELECT CAST(n AS BIGINT) FROM tt) AS top_type_n
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin
  ) { (s, d) =>
    graft.plans.GraftExtensions.register(s)
    Tables.documents(s, d).createOrReplaceTempView("graft_documents")
    Tables.events(s, d).createOrReplaceTempView("graft_events")
    s.sql(
      """WITH hb AS (
        |  SELECT hist_buckets(value, 50.0) AS h
        |  FROM graft_events WHERE value > 0),
        |ss AS (
        |  SELECT space_saving(event_type, 16) AS tops FROM graft_events)
        |SELECT source,
        |       count(*) AS n_docs,
        |       sum(CASE WHEN nfc_normalize(text) = text
        |                THEN 1 ELSE 0 END) AS n_nfc_clean,
        |       sum(pq_adc_sum(
        |             array(CAST(doc_id % 4 AS INT), CAST(doc_id % 3 AS INT)),
        |             array(10L, 23L, 7L, 41L, 5L, 17L, 29L, 3L))) AS adc_sum,
        |       (SELECT CAST(cardinality(h) AS BIGINT) FROM hb)
        |         AS n_value_buckets,
        |       (SELECT coalesce(element_at(h, 0), 0L) FROM hb) AS bucket0_n,
        |       (SELECT element_at(tops, 1).item FROM ss) AS top_type,
        |       (SELECT element_at(tops, 1).est FROM ss) AS top_type_n
        |FROM graft_documents
        |GROUP BY source
        |ORDER BY source""".stripMargin)
  }

  def defs: Seq[QueryDef] = Seq(qSqlEngine, qSqlLinkage, qSqlCuration)
}
