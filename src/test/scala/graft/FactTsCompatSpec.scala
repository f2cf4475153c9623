package graft

import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The same per-generation type instability [[EventsTsCompatSpec]] guards
  * for `events.ts` exists for the FACT-table date columns: the driver
  * has shipped `o_orderdate` / `l_shipdate` as both TIMESTAMP(µs) and
  * tz-naive TIMESTAMP(µs) (TIMESTAMP_NTZ in Spark 4) — the sweep-line
  * spec originally failed on exactly this (`CAST(o_orderdate AS BIGINT)`
  * is legal on TIMESTAMP, DATATYPE_MISMATCH on NTZ). This spec rewrites
  * orders+lineitem with the date columns in EACH flavor and ANALYZES
  * every registry query against each, so a date-function regression
  * surfaces at test time, not per-testdata-generation.
  */
class FactTsCompatSpec extends SparkSpec {
  import spark.implicits._

  private lazy val variants: Seq[(String, String)] = {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    Seq("timestamp", "timestamp_ntz").map { flavor =>
      val dir = Files.createTempDirectory(s"facts_$flavor").toString
      new java.io.File(sf).listFiles()
        .filter(f => f.getName != "orders.parquet" && f.getName != "lineitem.parquet")
        .foreach(f =>
          Files.createSymbolicLink(Paths.get(dir, f.getName), f.toPath))
      orders.withColumn("o_orderdate", $"o_orderdate".cast(flavor))
        .coalesce(1).write.parquet(s"$dir/orders.parquet")
      lineitem.withColumn("l_shipdate", $"l_shipdate".cast(flavor))
        .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
      flavor -> dir
    }
  }

  test("every registry query analyzes against every fact-date generation flavor") {
    val failures = for {
      (flavor, dir) <- variants
      name <- SparkEntry.queries.keys.toSeq.sorted
      err <- (try {
        SparkEntry.queries(name)(spark, dir).queryExecution.analyzed
        None
      } catch {
        case e: Throwable =>
          Some(s"$name [$flavor]: ${e.getMessage.linesIterator.take(3).mkString(" | ")}")
      }).toSeq
    } yield err
    assert(failures.isEmpty,
      s"queries breaking on a fact-date flavor:\n${failures.mkString("\n")}")
  }
}
