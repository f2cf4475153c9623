package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json")
    // shared graft config set (incl. the heap-derived object-agg
    // fallback threshold) — see GraftSession.tunedBuilder
    val spark = GraftSession.tunedBuilder(cpus.toInt, "graft-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the JVM/codegen/file-index paths so the first timed query
    // doesn't absorb cold-start costs
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // FIXED-COST CANARIES (r12 VERDICT task #2): three queries whose cost
    // is independent of the registry and of SPARK_GRAFT_SF_DIR, timed
    // before and after the registry passes. A round-over-round shift in
    // the canaries is the box, not the code — the r12 ambient slowdown
    // (median carried-query ratio 1.105×) had to be INFERRED from 266
    // carried queries; these measure it directly. min-of-2 each so a JIT
    // or GC hiccup doesn't masquerade as ambient drift.
    object canary {
      import org.apache.spark.sql.functions._
      private def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      private def min2(f: => Unit): Double = {
        def t(): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        math.min(t(), t())
      }
      // pure whole-stage-codegen CPU: no IO, no shuffle (pmod keeps
      // the ANSI-mode sum far from Long overflow at any row count).
      // Also run ALONE between registry passes (r13 VERDICT #3): the
      // end-only canaries missed a mid-run ambient burst (r13-final2's
      // 17.6 s sweep pass), so the cheapest canary now samples the
      // window each pass boundary sits in.
      def cpu(): Double = min2(noop(spark.range(1000000000L)
        .select(sum(pmod(xxhash64(col("id")), lit(1000))))))
      // a pinned parquet scan — the SAME file at every SF dial. Path is
      // env-overridable and guarded (r13 ADVICE: the hardcoded path made
      // every bench abort on any other layout); -1 records "absent"
      // without failing the run or masquerading as a timing.
      private val scanPath = sys.env.getOrElse(
        "SPARK_GRAFT_CANARY_PARQUET", "/root/testdata/sf0.1/lineitem.parquet")
      def full(): Map[String, Double] = Map(
        "cpu" -> cpu(),
        // one fixed-size shuffle: 100M rows into 4096 groups
        "shuffle" -> min2(noop(spark.range(100000000L)
          .select(pmod(col("id"), lit(4096)).as("k"), col("id"))
          .groupBy(col("k"))
          .agg(sum(col("id")), count(lit(1))))),
        "scan" -> (if (java.nio.file.Files.exists(
            java.nio.file.Paths.get(scanPath)))
          min2(noop(spark.read.parquet(scanPath)))
        else -1.0))
    }
    val canaryFirst = canary.full()
    // time a FULL materialization via the noop sink: under a bare count()
    // Catalyst prunes unreferenced projections, so projection-heavy
    // queries would look artificially cheap
    // a throwing query records NEGATIVE elapsed time — a swallowed failure
    // must never masquerade as a legitimately fast timing
    def runPass(): Map[String, Double] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        name -> (if (ok) dt else -dt)
      }
    // N full passes in one JVM (default 3): pass 1 absorbs codegen
    // compilation, GC ramp and page-cache warmup; the REPORTED per-query
    // number is the MIN across passes — a machine-wide load burst (the
    // r5 artifact was captured during one, inflating a 100-row projection
    // to 21 s) slows SOME passes, but the min over ≥3 survives any burst
    // shorter than the whole run, so round-over-round deltas are signal
    val nPasses =
      math.max(2, sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt)
    // a cpu canary fires BETWEEN registry passes (nPasses-1 samples), so
    // a burst confined to one pass shows up next to that pass's totals
    // instead of hiding between the end canaries
    val midCpu = scala.collection.mutable.ArrayBuffer.empty[Double]
    val passes = (1 to nPasses).map { i =>
      val p = runPass()
      if (i < nPasses) midCpu += canary.cpu()
      p
    }
    val canaryLast = canary.full()
    val names = passes.head.keys.toSeq.sorted
    // min over the passes where the query SUCCEEDED; all-failed stays
    // negative so a swallowed failure can't read as a fast timing
    val results: Map[String, Double] = names.map { n =>
      val vs = passes.map(_(n))
      val ok = vs.filter(_ > 0)
      n -> (if (ok.nonEmpty) ok.min else vs.head)
    }.toMap
    // the failed list mirrors the same per-query rule as `results`: a
    // query is failed only if EVERY pass failed — a transient one-pass
    // failure whose min timing counts toward the total must not also be
    // listed as failed (the artifact would contradict itself). The
    // per-pass stderr lines still record transients.
    val allFailed = names.filter(n => results(n) <= 0)
    val failedJson = allFailed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.filter(_ > 0).sum
    val total1 = passes.head.values.filter(_ > 0).sum
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def canaryJson(c: Map[String, Double]): String =
      c.toSeq.sorted
        .map { case (k, v) => s""""$k":${f3(v)}""" }
        .mkString("{", ",", "}")
    // durable machine-readable artifact with EVERY pass, immune to the
    // harness's stdout tail truncation (r1-r3 totals were lost to it)
    val artifact = names
      .map { n =>
        val per = passes.zipWithIndex
          .map { case (p, i) => s""""pass${i + 1}":${f3(p(n))}""" }
          .mkString(",")
        s""""$n":{$per,"min":${f3(results(n))}}"""
      }
      .mkString(
        s"""{"metric":"total","value":${f3(total)},"pass1_total":${f3(total1)},"stat":"min-of-$nPasses","unit":"sec","nq":${results.size},"sf":"$sfDir","failed":$failedJson,"canary_first":${canaryJson(canaryFirst)},"canary_mid_cpu":${midCpu.map(f3).mkString("[", ",", "]")},"canary_last":${canaryJson(canaryLast)},"queries":{""",
        ",",
        "}}")
    val out = java.nio.file.Paths.get(outPath)
    if (out.getParent != null) java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      artifact.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // The harness keeps only the tail of this process's output, and sbt
    // appends its own "[success] ..." line after ours — a JSON line longer
    // than ~1.9k chars gets beheaded and fails to parse (this bit rounds
    // 1-3). Emit the slowest queries individually and fold the long cheap
    // tail into one "other" bucket so the line always fits.
    val byTime = results.toSeq.sortBy { case (_, v) => -math.abs(v) }
    // the ambient factor must be readable from BENCH_rN.json ALONE
    // (r13 VERDICT #3): ~170 chars of canary trade against the query
    // map's budget so the whole line stays under the ~1.9k beheading
    val canarySummary =
      s""""canary":{"first":${canaryJson(canaryFirst)},"mid_cpu":${midCpu.map(f3).mkString("[", ",", "]")},"last":${canaryJson(canaryLast)}}"""
    val budget = 1400 - canarySummary.length // chars for the per-query map
    val entries = byTime.map { case (k, v) => "\"" + k + "\":" + f3(v) }
    // kept entries are a strict PREFIX of byTime (stop at the first entry
    // that doesn't fit), so drop(kept) is exactly the non-kept remainder —
    // a skip-and-continue loop could double-count a later short entry
    val kept = entries
      .scanLeft(0)((used, e) => used + e.length + 1)
      .tail
      .takeWhile(_ <= budget)
      .size
    val detailed = entries.take(kept).toBuffer
    if (kept < byTime.size) {
      val restSum = byTime.drop(kept).map { case (_, v) => math.abs(v) }.sum
      detailed += "\"_other_" + (byTime.size - kept) + "_queries\":" + f3(restSum)
    }
    val qs = detailed.mkString("{", ",", "}")
    // "timing" documents the method: noop-sink full materialization,
    // per-query MIN over the in-JVM passes; all passes live in the artifact
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","nq":${results.size},"queries":$qs,"sf":"$sfDir","failed":$failedJson,$canarySummary,"timing":"noop-sink full materialization, per-query min of $nPasses in-JVM passes; slowest listed, rest in _other; full per-pass artifact at $outPath"}""")
    spark.stop()
  }
}
