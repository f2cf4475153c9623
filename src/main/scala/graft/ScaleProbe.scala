package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling probe for the dedup/ANN family — turns the "scales
  * ≲ linearly" plan arguments into measured decades.
  *
  * Blows the sf0.1 `documents`/`embeddings` tables up by 10× and 100×
  * with DECORRELATED replicas (replica k's words are salted with k, so
  * replicas share no shingles; replica k's embeddings get a per-(k, dim)
  * Rademacher sign flip, which preserves norms but zeroes expected
  * cross-replica cosine). Plain row replication would be wrong for this
  * probe: it multiplies duplicate-group sizes, so pair-generation work
  * grows quadratically as a property of the DATA, masking whether the
  * OPERATORS scale. Decorrelated replicas keep the per-document duplicate
  * structure identical at every factor, so wall-time growth measures the
  * operators alone.
  *
  * Runs the bench's five most expensive queries (VERDICT r6 plan-audit
  * table) at each factor, min-of-N in-JVM passes (same statistic as
  * Bench), and writes one JSON artifact with per-query seconds and the
  * per-decade growth ratios.
  */
object ScaleProbe {

  /** The r6 plan-audit top-5 by best-of-mins cost, with one substitution:
    * q_embed_dedup_groups is replaced by q_semantic_dedup. The original
    * run at 10× measured WHY: that query fixes its LSH at 6 bits/table
    * (64 buckets), so mean bucket size — and with it the candidate-pair
    * count — grows linearly with the corpus and the verify stage grows
    * QUADRATICALLY (~100× work at 10× corpus; its own Scaladoc documents
    * bits ∝ log₂|corpus| as the production dial, which the fixture-pinned
    * query cannot exercise). q_semantic_dedup probes the same
    * embedding-dedup family with the self-scaling parameterization (cell
    * count grows with the corpus, within-cell pair work stays bounded),
    * so linear growth is the PASS criterion rather than impossible by
    * construction. The finding itself is recorded in SCALE.md. */
  val DefaultProbeQueries: Seq[String] = Seq(
    "q_pipeline_curate_pack",
    "q_winnow_pairs",
    "q_semantic_dedup",
    "q_dedup_canonical",
    "q_ann_ivfpq")

  /** Probe set — override with SPARK_GRAFT_SCALE_QUERIES (comma list) to
    * measure a different family (e.g. the r7 additions) on the same
    * decorrelated blow-ups. */
  def ProbeQueries: Seq[String] =
    sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultProbeQueries)

  /** Probe adapters: names the env can request that are NOT registry
    * queries but registry code paths with their production-scale dial
    * set from the blow-up factor. `q_embed_dedup_groups@logbits` runs
    * [[operators.Similarity.embedDedupGroupsMeasured]] with
    * `bitsPerTable = 6 + ⌈log₂ factor⌉` — bucket count ∝ corpus size,
    * the dial SCALE.md finding 2 prescribes — so the probe measures the
    * production parameterization the oracle-pinned 6-bit registry query
    * cannot (its fixed 64-bucket space is quadratic by construction). */
  val Adapters: Map[String, (SparkSession, String, Int) => DataFrame] = Map(
    "q_embed_dedup_groups@logbits" -> { (s, d, f) =>
      val bits = 6 + math.ceil(math.log(f.toDouble) / math.log(2.0)).toInt
      operators.Similarity.embedDedupGroupsMeasured(s, d, 12, bits)
    },
    // the production band-sweep composition: the truth slice SHRINKS as
    // the corpus grows (permille = 1000/factor) so the measured set stays
    // fixture-sized — the S-curve estimate a 100 TB run computes from a
    // constant-cost sample while the corpus scales underneath it
    "q_lsh_band_sweep@sampled" -> { (s, d, f) =>
      val permille = math.max(1, 1000 / f)
      operators.Dedup.lshBandSweepMeasured(s, d, permille)
    },
    // the sweep's CANDIDATE stage in isolation, both dedup shapes, for
    // the dense decades (r13): @cands_emit is the production
    // first-matching-band emission (candidates streamed, only 4 counts
    // exchanged); @cands_distinct is the pre-r13 distinct() the
    // registry walker now forbids (pair-sized partial state + exchange,
    // clique-quadratic on dense corpora). The truth side is excluded on
    // purpose — it is the data's own quadratic output (r12b1) and would
    // mask the candidate-stage A/B this probe exists to measure.
    "q_lsh_sweep@cands_emit" -> { (s, d, _) =>
      operators.Dedup
        .lshSweepCandidates(Tables.documents(s, d), emission = true)
        .groupBy(col("cfg")).agg(count(lit(1)).as("n_candidates"))
    },
    "q_lsh_sweep@cands_distinct" -> { (s, d, _) =>
      operators.Dedup
        .lshSweepCandidates(Tables.documents(s, d), emission = false)
        .groupBy(col("cfg")).agg(count(lit(1)).as("n_candidates"))
    },
    // the prefix-filter CANDIDATE stage in isolation, both dedup shapes
    // (r14): @cands_emit is the production first-common-hash emission
    // (pairs filtered row-local, nothing pair-sized exchanged);
    // @cands_distinct is the pre-r14 string-keyed join + distinct()
    // the walker's string-taint mode now forbids (pair-sized partial
    // state + exchange). Verify excluded on purpose, as with the sweep
    // probes: its pair-sized exchange is the same in both shapes and
    // would mask the candidate-stage A/B.
    "q_prefix_filter@cands_emit" -> { (s, d, _) =>
      operators.Dedup
        .prefixCandidates(Tables.documents(s, d), emission = true)
        .agg(count(lit(1)).as("n_candidates"))
    },
    "q_prefix_filter@cands_distinct" -> { (s, d, _) =>
      operators.Dedup
        .prefixCandidates(Tables.documents(s, d), emission = false)
        .agg(count(lit(1)).as("n_candidates"))
    },
    // structure-varying graph decades (r10): the registry graph queries
    // run on the ≤25-node strong-trade graph, so a volume blow-up never
    // changes their GRAPH SHAPE — these adapters blow up the shape
    // itself (diameter ∝ factor) and run the convergence-dial loop the
    // fixed-round registry forms truncate on (GraphOps @conv variants)
    "q_graph_bfs@conv" -> { (s, _, f) =>
      operators.GraphOps.bfsDistancesConverged(cliquePathSym(s, f))
    },
    "q_lpa@conv" -> { (s, _, f) =>
      operators.GraphOps.lpaStable(cliquePathSym(s, f))._1
    },
    "q_kcore@conv" -> { (s, _, f) =>
      operators.GraphOps.kcoreConverged(pathSym(s, 25 * f), 2)
    },
    // code-length dial (r11): banded candidate counts at the fixture
    // 64-bit dial vs the 256-bit production dial, verify excluded — the
    // 64-bit band space (2¹⁶) saturates as the corpus grows (count →
    // ~n²/2¹⁶) while the 256-bit dial's 2⁶⁴ band space keeps spurious
    // collisions at zero and the count tracks true near-dup structure
    "q_media_phash@cands64" -> { (s, d, _) =>
      operators.Multimodal.phashCandidateCount(
        Tables.documents(s, d), 64, 4)
    },
    "q_media_phash@cands256" -> { (s, d, _) =>
      operators.Multimodal.phashCandidateCount(
        Tables.documents(s, d), 256, 4)
    })

  /** The 25-node strong-trade graph blown into a HIGH-DIAMETER shape:
    * `f` copies of a 25-clique chained by single bridge edges — node
    * count and edge count grow ∝ f while the diameter grows ∝ f too
    * (≈ 3f hops end to end), the graph-shape axis the r9 probe lesson
    * demands (volume blow-ups of the warehouse tables cannot move the
    * trade graph's 25-node shape at all). Returns both edge
    * directions. */
  def cliquePathSym(s: SparkSession, f: Int): DataFrame = {
    import s.implicits._
    val within = (for { a <- 0 until 25; b <- (a + 1) until 25 }
      yield (a, b)).toDF("a", "b")
    val clique = s.range(f.toLong)
      .crossJoin(broadcast(within))
      .select(($"id" * 25 + $"a").as("src"), ($"id" * 25 + $"b").as("dst"))
    val bridges = s.range(math.max(0, f - 1).toLong)
      .select(($"id" * 25 + 24).as("src"), (($"id" + 1) * 25).as("dst"))
    val und = clique.unionAll(bridges)
    und.unionAll(und.select($"dst".as("src"), $"src".as("dst")))
  }

  /** Pure path graph of `n` nodes — the ADVERSARIAL k-core peel shape:
    * every peel round removes only the two endpoints, so the 2-core
    * fixpoint (empty) takes Θ(n) rounds. That is the algorithm's true
    * worst case (peeling is inherently sequential on a path), not an
    * implementation defect — the probe measures it instead of hiding
    * it. */
  def pathSym(s: SparkSession, n: Int): DataFrame = {
    import s.implicits._
    val und = s.range(math.max(0, n - 1).toLong)
      .select($"id".as("src"), ($"id" + 1).as("dst"))
    und.unionAll(und.select($"dst".as("src"), $"src".as("dst")))
  }

  /** NEAR-DUP-DENSE `factor`× blow-up (r10): the structural OPPOSITE of
    * [[blowUp]]'s decorrelated replicas. Replica k of a document keeps
    * the text except ONE word (position (7k+3) mod len swapped for a
    * k-salted token), so every original becomes a near-dup CLIQUE of
    * `factor` members (word-shingle Jaccard ≈ (n−3)/(n+1) per pair);
    * replica k of an embedding scales a single dimension by 0.9, so
    * cosine to the original stays ≈ 1. This stresses the PPJoin prefix
    * math, band-bucket sizes and Hamming verify with MANY REAL
    * near-duplicates, where the decorrelated blow-up stresses them with
    * none: the candidate sets are now genuinely quadratic IN EACH
    * CLIQUE, so the honest output itself is Θ(n·factor) pairs — wall
    * growth must track the output size, not the corpus product. */
  def blowUpDense(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int): Unit = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val nDocs = docs.agg(max($"doc_id")).head.getLong(0) + 1
    (0 until factor).map { k =>
      val text =
        if (k == 0) $"text"
        else {
          val ws = split($"text", " ")
          val idx = pmod(lit(7 * k + 3), greatest(size(ws), lit(1)))
          array_join(
            zip_with(ws, sequence(lit(0), size(ws) - 1), (w, i) =>
              when(i === idx, lit(s"swap~$k")).otherwise(w)), " ")
        }
      docs.select(
        ($"doc_id" + lit(k.toLong * nDocs)).as("doc_id"),
        text.as("text"), $"lang", $"source",
        length(text).cast("long").as("n_chars"))
    }.reduce(_.unionAll(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val nVecs = emb.agg(max($"vec_id")).head.getLong(0) + 1
    // modulus = the actual embedding dimension (64): with a larger
    // modulus every replica whose k % modulus lands past the last
    // index would perturb NO element — a byte-identical exact dup
    // instead of the documented single-dimension near-dup, silently
    // changing what the dense probe stresses at high factors
    val dim = emb.select(size($"embedding")).head.getInt(0)
    (0 until factor).map { k =>
      val vec =
        if (k == 0) $"embedding"
        else transform($"embedding", (x, i) =>
          (x * when(i === lit(k % dim), 0.9f).otherwise(1.0f))
            .cast("float"))
      emb.select(
        ($"vec_id" + lit(k.toLong * nVecs)).as("vec_id"),
        vec.as("embedding"), $"label")
    }.reduce(_.unionAll(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  /** Word-salted, sign-flipped `factor`× blow-up of documents+embeddings
    * into `outDir` (same file layout Tables.load expects). Replica 0 is
    * the original data byte-for-byte. */
  def blowUp(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int): Unit = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val nDocs = docs.agg(max($"doc_id")).head.getLong(0) + 1
    val docReps = (0 until factor).map { k =>
      val text =
        if (k == 0) $"text"
        else array_join(
          transform(split($"text", " "), w => concat(w, lit(s"~$k"))), " ")
      docs.select(
        ($"doc_id" + lit(k.toLong * nDocs)).as("doc_id"),
        text.as("text"), $"lang", $"source",
        length(text).cast("long").as("n_chars"))
    }
    docReps.reduce(_.unionAll(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val nVecs = emb.agg(max($"vec_id")).head.getLong(0) + 1
    val embReps = (0 until factor).map { k =>
      val vec =
        if (k == 0) $"embedding"
        else transform($"embedding", (x, i) =>
          (x * when(pmod(hash(i * 31 + lit(k)), lit(2)) === 0, 1.0f)
            .otherwise(-1.0f)).cast("float"))
      emb.select(
        ($"vec_id" + lit(k.toLong * nVecs)).as("vec_id"),
        vec.as("embedding"), $"label")
    }
    embReps.reduce(_.unionAll(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    // events: replica k shifts user_id (sessions/windows stay per-user
    // sized and DECORRELATED — plain row duplication would multiply
    // per-user event counts, quadratically inflating window work as a
    // data property) and event_id (uniqueness); timestamps unchanged,
    // so time-bucketed aggregates get denser, not longer
    val ev = spark.read.parquet(s"$srcDir/events.parquet")
    val nUsers = ev.agg(max($"user_id")).head.getLong(0) + 1
    val nEv = ev.agg(max($"event_id")).head.getLong(0) + 1
    (0 until factor).map { k =>
      ev.select(($"event_id" + lit(k.toLong * nEv)).as("event_id"),
        $"ts", ($"user_id" + lit(k.toLong * nUsers)).as("user_id"),
        $"event_type", $"value", $"props")
    }.reduce(_.unionAll(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    // orders: replica k shifts the order key; totalprice/date unchanged
    // (value-distribution operators see a denser, not wider, domain)
    val ord = spark.read.parquet(s"$srcDir/orders.parquet")
    val nOrd = ord.agg(max($"o_orderkey")).head.getLong(0) + 1
    (0 until factor).map { k =>
      ord.select(($"o_orderkey" + lit(k.toLong * nOrd)).as("o_orderkey"),
        $"o_custkey", $"o_orderstatus", $"o_totalprice", $"o_orderdate",
        $"o_orderpriority")
    }.reduce(_.unionAll(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val workDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_WORK", "target/scaledata")
    val outPath =
      sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "target/scaleprobe.json")
    val factors = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTORS", "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val nPasses = sys.env.getOrElse("SPARK_GRAFT_SCALE_PASSES", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shared graft config set — see GraftSession.tunedBuilder
    val spark = GraftSession.tunedBuilder(cpus.toInt, "graft-scaleprobe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_SCALE_MODE=dense switches to the near-dup-dense
    // blow-up (clique structure) and its own work dir; default stays
    // the decorrelated volume blow-up
    val dense = sys.env.get("SPARK_GRAFT_SCALE_MODE").contains("dense")
    val effWork = if (dense) s"$workDir-dense" else workDir
    val dirs: Seq[(Int, String)] = factors.map { f =>
      if (f == 1) f -> srcDir
      else {
        val d = s"$effWork/x$f"
        if (!new java.io.File(s"$d/embeddings.parquet").exists()) {
          System.err.println(s"[scale] building ${f}x blow-up at $d")
          if (dense) blowUpDense(spark, srcDir, d, f)
          else blowUp(spark, srcDir, d, f)
        }
        f -> d
      }
    }

    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // warmup: absorb codegen + file-index cold start before any timing
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    // Per-query wall budget: a fixture-pinned parameterization probed past
    // its documented asymptote (e.g. the 64-bucket LSH at 100×) would
    // otherwise run for hours; the budget turns "would never finish" into
    // a measured DNF at a known wall time. Cancellation goes through a
    // per-query job group with interruptOnCancel, the supported way to
    // abort running stages.
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_SCALE_TIMEOUT_SEC", "900").toInt
    import scala.concurrent.{Await, Future, TimeoutException}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global

    /** One timed leg. A timeout is a first-class DNF (never a negated
      * elapsed — a killed battery must not leave rows a reader could
      * mistake for measurements); a thrown query is an Err row. */
    sealed trait Leg { def elapsed: Double }
    case class Ok(elapsed: Double) extends Leg
    case class Dnf(elapsed: Double) extends Leg
    case class Err(elapsed: Double, msg: String) extends Leg

    /** Cancellation is asynchronous: after cancelJobGroup the stages keep
      * draining executor threads for a while, which would contaminate the
      * NEXT leg's timer. Await the future itself (it completes when the
      * cancelled job throws), then poll the status tracker until no jobs
      * are active — both bounded. */
    def quiesce(fut: scala.concurrent.Future[Unit]): Unit = {
      try Await.ready(fut, 120.seconds) catch { case _: TimeoutException => () }
      val tracker = spark.sparkContext.statusTracker
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (tracker.getActiveJobIds().nonEmpty && System.nanoTime() < deadline)
        Thread.sleep(200)
    }

    def runOnce(q: String, d: String, f: Int): Leg = {
      val fn: (SparkSession, String) => DataFrame =
        Adapters.get(q).map(a => (s: SparkSession, dir: String) => a(s, dir, f))
          .getOrElse(SparkEntry.queries(q))
      val group = s"scaleprobe-$q-x$f-${System.nanoTime()}"
      val t0 = System.nanoTime()
      def dt = (System.nanoTime() - t0) / 1e9
      val fut = Future {
        spark.sparkContext.setJobGroup(group, q, interruptOnCancel = true)
        try fn(spark, d).write.format("noop").mode("overwrite").save()
        finally spark.sparkContext.clearJobGroup()
      }
      try { Await.result(fut, budgetSec.seconds); Ok(dt) }
      catch {
        case _: TimeoutException =>
          spark.sparkContext.cancelJobGroup(group)
          System.err.println(s"[scale] $q@${f}x DNF: > $budgetSec s budget")
          quiesce(fut)
          Dnf(budgetSec.toDouble)
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          System.err.println(s"[scale] $q@${f}x failed: $msg")
          quiesce(fut)
          // strip EVERY control char (< 0x20), not just CR/LF — Spark
          // stage-failure messages carry tabs, which would make the
          // hand-assembled JSON artifact unparseable
          Err(dt, msg.map(c => if (c < ' ' || c == '"' || c == '\\') ' ' else c)
            .take(160))
      }
    }

    // Durable accumulation: the artifact is rewritten after EVERY query
    // leg (atomic tmp+move), so a killed battery keeps its finished legs
    // instead of losing the whole run.
    val acc = scala.collection.mutable.LinkedHashMap[Int,
      scala.collection.mutable.LinkedHashMap[String, Leg]]()
    def flush(): String = {
      val base = acc.headOption.map(_._2).getOrElse(
        scala.collection.mutable.LinkedHashMap.empty[String, Leg])
      val body = acc.map { case (f, legs) =>
        val qs = legs.map {
          case (q, Ok(s)) =>
            val ratio = base.get(q) match {
              case Some(Ok(b)) if b > 0 => s""","vs_x1":${f3(s / b)}"""
              case _ => ""
            }
            s""""$q":{"sec":${f3(s)}$ratio}"""
          case (q, Dnf(b)) =>
            s""""$q":{"dnf":true,"budget_sec":${f3(b)}}"""
          case (q, Err(s, m)) =>
            s""""$q":{"err":"$m","elapsed_sec":${f3(s)}}"""
        }.mkString(",")
        s""""x$f":{$qs}"""
      }.mkString(
        s"""{"probe":"scale","stat":"min-of-$nPasses","src":"$srcDir","factors":[${
          factors.mkString(",")}],"results":{""",
        ",", "}}")
      val out = java.nio.file.Paths.get(outPath)
      if (out.getParent != null)
        java.nio.file.Files.createDirectories(out.getParent)
      val tmp = out.resolveSibling(out.getFileName.toString + ".tmp")
      java.nio.file.Files.write(tmp,
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, out,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      body
    }

    dirs.foreach { case (f, d) =>
      val legs = acc.getOrElseUpdate(f,
        scala.collection.mutable.LinkedHashMap[String, Leg]())
      ProbeQueries.foreach { q =>
        // min-of-N back-to-back passes; a DNF/Err on pass 1 is final
        // (re-running a measured timeout wastes the budget a second time)
        val first = runOnce(q, d, f)
        val best = first match {
          case Ok(_) =>
            (2 to nPasses).foldLeft(first) { (b, _) =>
              (b, runOnce(q, d, f)) match {
                case (Ok(x), Ok(y)) => Ok(math.min(x, y))
                case (bb, _) => bb
              }
            }
          case other => other
        }
        legs(q) = best
        best match {
          case Ok(s) =>
            System.err.println(f"[scale] ${f}%3dx $q%-28s ${s}%8.3f s")
          case Dnf(b) =>
            System.err.println(f"[scale] ${f}%3dx $q%-28s DNF > ${b}%.0f s")
          case Err(s, m) =>
            System.err.println(f"[scale] ${f}%3dx $q%-28s ERR at ${s}%.1f s: $m")
        }
        flush()
      }
    }

    println(flush())
    spark.stop()
  }
}
