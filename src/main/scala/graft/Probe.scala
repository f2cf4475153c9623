package graft

import org.apache.spark.sql.SparkSession

/** Plan/latency probe for one registered query: prints per-iteration
  * noop-sink times (first = cold, rest = warm) and the formatted physical
  * plan. Usage:
  *
  *   sbt "runMain graft.Probe q_dedup_ngram_jaccard /root/testdata/sf0.1 3"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    // shared graft config set — see GraftSession.tunedBuilder
    val spark = GraftSession.tunedBuilder(32, "graft-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[probe] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val df = fn(spark, sfDir)
    // drive THIS Dataset's own QueryExecution (a .write or Dataset.rdd
    // wraps the plan in a fresh QueryExecution and leaves this one
    // unfinalized) so AQE finalizes every stage and ReusedExchange /
    // skew decisions are visible in the printed plan; toRdd.count()
    // executes without materializing result rows on the driver
    df.queryExecution.toRdd.count()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
