package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the JVM/codegen/file-index paths so the first timed query
    // doesn't absorb cold-start costs
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // time a FULL materialization via the noop sink: under a bare count()
    // Catalyst prunes unreferenced projections, so projection-heavy
    // queries would look artificially cheap
    // a throwing query records NEGATIVE elapsed time — a swallowed failure
    // must never masquerade as a legitimately fast timing
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failed += name
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) dt else -dt)
    }
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.filter(_ > 0).sum
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // The harness keeps only the tail of this process's output, and sbt
    // appends its own "[success] ..." line after ours — a JSON line longer
    // than ~1.9k chars gets beheaded and fails to parse (this bit rounds
    // 1-3). Emit the slowest queries individually and fold the long cheap
    // tail into one "other" bucket so the line always fits.
    val byTime = results.toSeq.sortBy { case (_, v) => -math.abs(v) }
    val budget = 1400 // chars for the per-query map
    val detailed = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 0
    var kept = 0
    byTime.foreach { case (k, v) =>
      val entry = "\"" + k + "\":" + f3(v)
      if (used + entry.length + 1 <= budget) { detailed += entry; used += entry.length + 1; kept += 1 }
    }
    val restSum = byTime.drop(kept).map { case (_, v) => math.abs(v) }.sum
    if (kept < byTime.size)
      detailed += "\"_other_" + (byTime.size - kept) + "_queries\":" + f3(restSum)
    val qs = detailed.mkString("{", ",", "}")
    // "timing" documents the r2 method change: r1 timed count() (Catalyst
    // prunes unreferenced projections under a count), r2+ times a full
    // noop-sink materialization — totals are NOT comparable across that
    // boundary, r2 measures strictly more work per query
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","nq":${results.size},"queries":$qs,"sf":"$sfDir","failed":$failedJson,"timing":"noop-sink full materialization; slowest queries listed, rest folded into _other"}""")
    spark.stop()
  }
}
