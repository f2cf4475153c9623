package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish tables (see TESTDATA.md /
  * FIXTURES.md). Every query takes an explicit `sfDir` so the same code runs
  * at any scale factor — and, on a real cluster, against any warehouse path.
  */
object Tables {
  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** events.parquet has a TIMESTAMP(NANOS) column; with
    * spark.sql.legacy.parquet.nanosAsLong=true it reads as BIGINT
    * epoch-nanos. Expose both the raw nanos (`ts_ns`) and a µs-truncated
    * proper timestamp (`ts`) so event-time operators (windows, watermarks)
    * work on a TimestampType column.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    val tsType = raw.schema("ts").dataType.typeName
    if (tsType == "long" || tsType == "bigint")
      raw
        .withColumnRenamed("ts", "ts_ns")
        // integer DIV, not `/ 1000`: double division of epoch-nanos loses
        // ulps and can shift the µs by one
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
    else raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000)
  }
}
