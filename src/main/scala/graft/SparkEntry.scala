package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are declared as [[QueryDef]]s in graft.operators.*; this object
  * just assembles the registry the driver consumes.
  */
object SparkEntry {

  /** Declared queries grouped by operator family — the structure the
    * generated CAPABILITIES.md table reflects. */
  def families: Seq[(String, Seq[QueryDef])] = Seq(
    "relational" -> operators.Relational.defs,
    "text analysis" -> operators.TextOps.defs,
    "dedup" -> operators.Dedup.defs,
    "similarity / ANN" -> operators.Similarity.defs,
    "spectral decomposition" -> operators.Spectral.defs,
    "vector quantization" -> operators.Quantization.defs,
    "multimodal" -> operators.Multimodal.defs,
    "fs / kv metadata" -> operators.FsQueries.defs,
    "data layout / placement" -> operators.Layout.defs,
    "events / metrics" -> operators.Events.defs,
    "temporal joins" -> operators.Temporal.defs,
    "record linkage" -> operators.Linkage.defs,
    "graph analytics" -> operators.GraphOps.defs,
    "extras" -> operators.Extras.defs,
    "subqueries" -> operators.Subqueries.defs,
    "pipelines" -> operators.Pipeline.defs,
    "corpus sampling/mixing" -> operators.Corpus.defs,
    "corpus curation" -> operators.Curation.defs,
    "model scoring" -> operators.Scoring.defs,
    "sql plane" -> operators.SqlPlane.defs)

  def allDefs: Seq[QueryDef] = families.flatMap(_._2)

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
