package graft

import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The driver's `events.parquet` `ts` column has shipped as three
  * different physical types across testdata generations (epoch-nanos
  * BIGINT, TIMESTAMP(µs), and tz-naive TIMESTAMP(µs) → TIMESTAMP_NTZ in
  * Spark 4). [[Tables.events]] normalizes them, but deliberately leaves
  * batch `ts` in the file's flavor when it is NTZ (to match the DuckDB
  * oracle's naive-timestamp semantics) — which means a batch operator
  * applying a TIMESTAMP-only function to `ts` would work on some
  * generations and throw DATATYPE_MISMATCH on others, per-round.
  *
  * This spec makes that hazard a test failure instead: it rewrites the
  * fixture with `ts` in EACH flavor and ANALYZES (no execution) every
  * registry query against each — Catalyst raises type mismatches at
  * analysis time, so one pass catches every operator on every generation
  * shape the driver has ever produced.
  */
class EventsTsCompatSpec extends SparkSpec {
  import spark.implicits._

  private lazy val variants: Seq[(String, String)] = {
    val raw = spark.read.parquet(s"$sf/events.parquet")
    Seq("timestamp", "timestamp_ntz").map { flavor =>
      val dir = Files.createTempDirectory(s"events_$flavor").toString
      // symlink the non-events tables; rewrite events with the re-typed ts
      new java.io.File(sf).listFiles()
        .filter(_.getName != "events.parquet")
        .foreach(f =>
          Files.createSymbolicLink(
            Paths.get(dir, f.getName), f.toPath))
      val ts = raw.schema("ts").dataType.typeName match {
        case "long" | "bigint" =>
          expr("timestamp_micros(ts div 1000)").cast(flavor)
        case _ => $"ts".cast(flavor)
      }
      raw.withColumn("ts", ts)
        .coalesce(1)
        .write.parquet(s"$dir/events.parquet")
      flavor -> dir
    }
  }

  test("every registry query analyzes against every events.ts generation flavor") {
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
      s"queries breaking on an events.ts flavor:\n${failures.mkString("\n")}")
  }

  test("Tables.events exposes both a usable ts and exact epoch nanos in every flavor") {
    for ((flavor, dir) <- variants) {
      val ev = Tables.events(spark, dir)
      // ts_ns must be exact epoch nanos regardless of the file's type
      val chk = ev
        .select(
          (unix_micros($"ts".cast("timestamp")) * 1000 === $"ts_ns").as("ok"))
        .agg(min($"ok")).head.getBoolean(0)
      assert(chk, s"ts/ts_ns diverged for flavor $flavor")
    }
  }
}
