package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.execution.ExplainMode

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

/** Dev tool: dump `explain("formatted")` for registered queries and,
  * optionally, execute each via the noop sink while counting jobs/stages
  * and recording the AQE final plan — the guide §1 "measure first"
  * instrumentation (plan shape + per-query job/stage cost in one pass).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <query>... | ALL
  * Env:   SPARK_GRAFT_PLAN_RUN=1 also runs each query (final plan + job/
  *        stage counts + wall seconds appended to the dump).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    Files.createDirectories(outDir)
    val names =
      if (args.length == 2 && args(1) == "ALL") SparkEntry.allDefs.map(_.name)
      else args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val run = sys.env.get("SPARK_GRAFT_PLAN_RUN").contains("1")
    val spark = GraftSession.tunedBuilder(cpus.toInt, "graft-plandump")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })
    names.foreach { name =>
      val sb = new StringBuilder
      // count jobs/stages from CONSTRUCTION on: iterative queries run
      // eager work (localCheckpoint rounds, convergence counts) inside
      // fn() itself, before any sink — the bench pays for those too
      jobs.set(0); stages.set(0)
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tBuilt = System.nanoTime()
      val jBuilt = jobs.get
      if (run) df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val dtBuild = (tBuilt - t0) / 1e9
      if (run) Thread.sleep(300) // listener bus drain
      sb ++= df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      if (run) {
        sb ++= f"%n== Executed (noop sink) ==%njobs=${jobs.get} stages=${stages.get} wall=$dt%.3f s buildjobs=$jBuilt buildwall=$dtBuild%.3f s%n"
        sb ++= df.queryExecution.executedPlan.toString
      }
      Files.write(outDir.resolve(s"$name.txt"),
        sb.toString.getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] $name -> ${outDir.resolve(s"$name.txt")}")
    }
    spark.stop()
  }
}
