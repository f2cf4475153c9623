package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are declared as [[QueryDef]]s in graft.operators.*; this object
  * just assembles the registry the driver consumes.
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    operators.Relational.defs ++ operators.TextOps.defs ++
      operators.Dedup.defs ++ operators.Similarity.defs ++
      operators.Multimodal.defs ++ operators.FsQueries.defs ++
      operators.Events.defs ++ operators.Temporal.defs ++
      operators.Extras.defs ++ operators.Subqueries.defs ++
      operators.Pipeline.defs ++ operators.Corpus.defs ++
      operators.Curation.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1Agg.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
