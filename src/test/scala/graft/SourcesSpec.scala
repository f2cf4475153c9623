package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source-format surface: the engine reads/writes parquet (primary), ORC,
  * JSON, and CSV with schema fidelity — the Spark analog of the
  * reference's pluggable storage (S1-S5). Each format round-trips the
  * documents table and compares content.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables
    .documents(spark, sf)
    .select($"doc_id", $"text", $"lang", $"source", $"n_chars")

  private def roundtrip(fmt: String, opts: Map[String, String] = Map.empty): Unit = {
    val dir = Files.createTempDirectory(s"src_$fmt").toString + "/out"
    docs.write.format(fmt).options(opts).mode("overwrite").save(dir)
    var reader = spark.read.format(fmt).options(opts)
    // CSV/JSON don't persist the schema — supply it (real pipelines do)
    if (fmt == "csv" || fmt == "json") reader = reader.schema(docs.schema)
    val back = reader.load(dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      docs.schema.fields.map(f => (f.name, f.dataType)).toSeq, s"$fmt schema")
    assert(back.count() === docs.count(), s"$fmt rowcount")
    assert(back.except(docs).count() === 0, s"$fmt content drift")
    assert(docs.except(back).count() === 0, s"$fmt content loss")
  }

  test("parquet round-trip preserves schema and content")(roundtrip("parquet"))
  test("orc round-trip preserves schema and content")(roundtrip("orc"))
  test("json round-trip preserves schema and content")(roundtrip("json"))
  test("csv round-trip preserves schema and content") {
    // multiline text with quotes needs explicit quoting/escaping options
    roundtrip("csv", Map(
      "header" -> "true", "quote" -> "\"", "escape" -> "\"",
      "multiLine" -> "true"))
  }

  test("partitioned write prunes on read (date-style partitioning)") {
    val dir = Files.createTempDirectory("part_out").toString + "/out"
    Tables
      .orders(spark, sf)
      .withColumn("o_year", year($"o_orderdate"))
      .write
      .partitionBy("o_year")
      .parquet(dir)
    val one = spark.read.parquet(dir).filter($"o_year" === 1997)
    one.collect()
    val plan = one.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("FileScan")).get
    assert(scanLine.contains("PartitionFilters: [isnotnull(o_year"), scanLine)
    val expected = Tables.orders(spark, sf).filter(year($"o_orderdate") === 1997).count()
    assert(one.count() === expected)
  }
}
