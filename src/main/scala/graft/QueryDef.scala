package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a Spark-first query plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Determinism conventions (both sides MUST follow them or the driver's
  * hash-compare fails spuriously):
  *   - every query ends in a total ORDER BY (unique key set);
  *   - doubles are round(x, 2) post-aggregation;
  *   - timestamps are emitted as formatted strings or epoch integers,
  *     never raw TIMESTAMP values (events.parquet is ns-precision, Spark
  *     is µs-precision);
  *   - aggregate / computed columns carry the same alias in both dialects.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  /** Non-SQL-expressible operator: driver records a weaker rows-only check;
    * a ScalaTest spec must cover semantics instead. */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
