package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: loop ONE registered query N times in a single JVM and print
  * each pass's time — isolates whether a pass-over-pass slowdown in the
  * full bench is query-local state accumulation or suite-level/machine
  * noise. Usage: runMain graft.BenchOne <query> [passes]. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shared graft config set — see GraftSession.tunedBuilder
    val spark = GraftSession.tunedBuilder(cpus.toInt, "graft-benchone")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val times = (1 to n).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[benchone] $name: ${times.map(t => f"$t%.3f").mkString(" ")}")
    spark.stop()
  }
}
