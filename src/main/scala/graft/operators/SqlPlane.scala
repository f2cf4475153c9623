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

  def defs: Seq[QueryDef] = Seq(qSqlEngine)
}
