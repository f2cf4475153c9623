package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev tool: ambient-load canary. Runs the same fixed-cost probes as the
  * bench's canary block (pure-CPU codegen sum, fixed shuffle) min-of-2 and
  * prints them, so a quiet window can be verified BEFORE starting a
  * controlled bench or A/B (baseline quiet-window cpu canary: 0.63-0.70 s).
  * Usage: runMain graft.tools.Canary [reps]
  */
object Canary {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tunedBuilder(cpus.toInt, "graft-canary")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def min2(f: => Unit): Double = {
      def t(): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(t(), t())
    }
    // one unmeasured warm-up so codegen compilation is not in rep 1
    noop(spark.range(10000000L)
      .select(sum(pmod(xxhash64(col("id")), lit(1000)))))
    (1 to reps).foreach { i =>
      val cpu = min2(noop(spark.range(1000000000L)
        .select(sum(pmod(xxhash64(col("id")), lit(1000))))))
      val shuffle = min2(noop(spark.range(100000000L)
        .select(pmod(col("id"), lit(4096)).as("k"), col("id"))
        .groupBy(col("k"))
        .agg(sum(col("id")), count(lit(1)))))
      println(f"[canary] rep $i cpu=$cpu%.3f shuffle=$shuffle%.3f")
    }
    spark.stop()
  }
}
