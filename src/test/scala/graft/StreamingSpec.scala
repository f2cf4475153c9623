package graft

import graft.streaming.EventPipelines
import graft.streaming.EventPipelines.{Heartbeat, LivenessEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }

  test("streaming request rate matches the batch ground truth") {
    val stream = EventPipelines.eventStream(spark, sf)
    runToMemory(EventPipelines.requestRate(stream), "rate_out")
    val streamed = spark
      .table("rate_out")
      .select(
        date_format($"minute_start", "yyyy-MM-dd HH:mm").as("minute"),
        $"event_type", $"n")
    val batch = operators.Events.qRate1m
      .fn(spark, sf)
      .select($"minute", $"event_type", $"n")
    // append mode emits only watermark-closed windows: streamed must be a
    // strict subset of batch, and anything missing must sit inside the
    // final watermark horizon (maxTs - 10 min)
    assert(streamed.except(batch).count() === 0, "no fabricated windows")
    val horizon = Tables
      .events(spark, sf)
      .agg(date_format(
        date_trunc("minute", max($"ts") - expr("INTERVAL 10 MINUTES")),
        "yyyy-MM-dd HH:mm"))
      .head().getString(0)
    val missing = batch.except(streamed)
    assert(
      missing.filter($"minute" < horizon).count() === 0,
      "only windows beyond the watermark horizon may be unemitted")
  }

  test("streaming session windows agree with batch sessionization totals") {
    val stream = EventPipelines.eventStream(spark, sf)
    runToMemory(EventPipelines.sessionCounts(stream), "sess_out")
    val streamed = spark
      .table("sess_out")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"), sum($"n_events").as("n_events"))
    val batch = operators.Events.qSessionize.fn(spark, sf)
    // the final session per user may be unclosed at end-of-stream (append
    // + watermark): totals must agree for every user whose sessions all
    // closed, and no user may have MORE streamed than batch sessions
    val joined = streamed
      .as("s")
      .join(batch.as("b"), $"s.user_id" === $"b.user_id")
    assert(
      joined.filter($"s.n_sessions" > $"b.n_sessions").count() === 0,
      "stream must not fabricate sessions")
    val agree = joined
      .filter($"s.n_sessions" === $"b.n_sessions" && $"s.n_events" === $"b.n_events")
      .count()
    assert(agree > 0, "at least some users fully closed and must agree")
  }

  test("latency quantile stream produces per-window sketches") {
    val stream = EventPipelines.eventStream(spark, sf)
    runToMemory(EventPipelines.latencyQuantiles(stream), "quant_out")
    val out = spark.table("quant_out")
    assert(out.count() > 0)
    assert(
      out.filter($"p50" > $"p95" || $"p95" > $"p99").count() === 0,
      "quantiles must be monotone")
  }

  test("streaming ingest into the KV store: the h2 PUT path end-to-end (S8)") {
    // chunked document stream → foreachBatch → KvStore.putChunked →
    // point gets verify reassembly: the reference's streaming PUT data
    // plane (with the multi-chunk bug fixed) as one flow
    val store = new graft.sources.KvStore(
      spark, java.nio.file.Files.createTempDirectory("kvstream").toString, 32)
    val stream = spark.readStream
      .schema(Tables.documents(spark, sf).schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sf)
      .filter($"doc_id" < 30)
      .select(concat(lit("doc/"), $"doc_id").as("key"),
        encode($"text", "UTF-8").as("bin"))
      .select($"key", posexplode(
        org.apache.spark.sql.functions.transform(
          sequence(lit(0), ceil(length($"bin") / 128.0).cast("int") - 1),
          i => $"bin".substr(i * 128 + 1, lit(128))))
        .as(Seq("chunk_id", "chunk")))
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        store.putChunked(batch)
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val expected = Tables.documents(spark, sf).filter($"doc_id" < 30)
      .select($"doc_id", $"text").collect()
    assert(expected.length === 30)
    expected.foreach { r =>
      val got = store.get(s"doc/${r.getLong(0)}")
      assert(got.isDefined && new String(got.get, "UTF-8") === r.getString(1),
        s"doc ${r.getLong(0)} must round-trip through the stream")
    }
  }

  test("late data beyond the watermark is dropped from windowed aggregates") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "1 minute")
      .groupBy(window($"ts", "1 minute"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("late_out").start()
    val t0 = 1700000000000L
    input.addData((new java.sql.Timestamp(t0), 1.0))
    q.processAllAvailable()
    // advance watermark far past t0's window
    input.addData((new java.sql.Timestamp(t0 + 600000), 1.0))
    q.processAllAvailable()
    // LATE: an event back in t0's window — must be dropped, not re-emitted
    input.addData((new java.sql.Timestamp(t0 + 1000), 99.0))
    q.processAllAvailable()
    input.addData((new java.sql.Timestamp(t0 + 1200000), 1.0))
    q.processAllAvailable()
    q.stop()
    // compare on epoch millis (timezone-free) and keep ALL rows — a Map
    // would collapse a wrongly re-emitted duplicate of the same window
    val rows = spark.table("late_out")
      .select(unix_millis($"window.start").as("w"), $"n")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val t0Window = t0 - t0 % 60000
    val t0Rows = rows.filter(_._1 == t0Window)
    assert(t0Rows === Seq((t0Window, 1L)),
      s"t0's window must be emitted exactly once with the late event dropped: $rows")
  }

  test("lease liveness: silent service goes down after 40s (T2 etcd analog)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Heartbeat]
    val q = EventPipelines
      .livenessMonitor(input.toDS())
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("live_out")
      .start()
    val t0 = 1700000000000L
    // both services register
    input.addData(Heartbeat("a", new Timestamp(t0)), Heartbeat("b", new Timestamp(t0)))
    q.processAllAvailable()
    // only 'a' keeps heartbeating; watermark advances past b's lease expiry
    input.addData(Heartbeat("a", new Timestamp(t0 + 30000)))
    q.processAllAvailable()
    input.addData(Heartbeat("a", new Timestamp(t0 + 120000)))
    q.processAllAvailable()
    input.addData(Heartbeat("a", new Timestamp(t0 + 200000)))
    q.processAllAvailable()
    q.stop()
    val events = spark.table("live_out").as[LivenessEvent].collect()
    val ups = events.filter(_.status == "up").map(_.service).sorted
    assert(ups.toSeq === Seq("a", "b"), s"both must register up: ${events.toSeq}")
    val downs = events.filter(_.status == "down")
    assert(downs.map(_.service).toSeq === Seq("b"), s"only b times out: ${events.toSeq}")
    assert(downs.head.atMs === t0 + EventPipelines.LeaseTtlMs)
  }

  test("streaming corpus ingest: quality gate + in-horizon fingerprint dedup") {
    val t0 = 1700000000000L
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, String, Timestamp)]
    // 24 words / 8 distinct → TTR 0.333 > 0.3; 137 chars >= 100
    val good = ("alpha beta gamma delta epsilon zeta eta theta " * 3).trim
    val lowTtr = ("spam " * 40).trim // >=100 chars but TTR <= 0.3
    in.addData(
      (1L, good, "en", new Timestamp(t0)),
      (2L, good + " ", "en", new Timestamp(t0 + 1000)), // dup modulo norm
      (3L, lowTtr, "en", new Timestamp(t0 + 2000)),
      (4L, "short text", "en", new Timestamp(t0 + 3000)), // < 100 chars
      (5L, good.toUpperCase, "fr", new Timestamp(t0 + 4000))) // dup (lower)
    val docs = in.toDF().toDF("doc_id", "text", "lang", "ts")
    runToMemory(EventPipelines.corpusIngest(docs), "ingest_out")
    val out = spark.table("ingest_out").collect()
    // doc 1 survives; 2 and 5 are fingerprint-dups (whitespace/case
    // normalization); 3 fails TTR; 4 fails length
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
    assert(out.head.getAs[Int]("n_words") === 24)
  }

  test("streaming near-dup ingest: band dedup admits novel docs, flags near-dups") {
    val t0 = 1700000000000L
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val a = "the quick brown fox jumps over the lazy dog near the old river bank today"
    // near-dup of a: one word changed → most minhash bands collide
    val b = a.replace("lazy", "sleepy")
    // unrelated doc: shares no shingles with a
    val c = "completely different subject matter entirely about spark query engines and columnar storage formats"
    in.addData(
      (1L, a, new Timestamp(t0)),
      (2L, a, new Timestamp(t0 + 1000)), // exact dup: all bands collide
      (3L, b, new Timestamp(t0 + 2000)),
      (4L, c, new Timestamp(t0 + 3000)),
      (5L, "too short", new Timestamp(t0 + 4000))) // < 3 words: filtered
    val docs = in.toDF().toDF("doc_id", "text", "ts")
    val q = EventPipelines.nearDupIngest(docs)
      .writeStream.outputMode("append").format("memory")
      .queryName("neardup_out").start()
    q.processAllAvailable()
    // append-mode windowed agg emits only once the watermark passes the
    // window close: push it there with a late flusher doc (its own open
    // window is not asserted on)
    in.addData((6L, c + " flusher", new Timestamp(t0 + 25 * 60 * 1000)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("neardup_out").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_new_bands"), r.getAs[Boolean]("admitted")))
      .toMap
    // first occurrence admits with every band fresh
    assert(out(1L) === ((EventPipelines.NearDupBands.toLong, true)))
    // the exact dup collides on every band → dropped in-stream entirely
    assert(!out.contains(2L), s"exact dup must vanish: $out")
    // the unrelated doc shares no shingles → all bands fresh
    assert(out(4L) === ((EventPipelines.NearDupBands.toLong, true)))
    // the near-dup loses at least one band to doc 1 → not admitted
    out.get(3L).foreach { case (n, adm) =>
      assert(n < EventPipelines.NearDupBands && !adm,
        s"near-dup must not be admitted: $out")
    }
    // the short doc has no shingles → filtered before banding
    assert(!out.contains(5L), s"shingle-less doc must be filtered: $out")
    // stream verdicts must agree with the BATCH signature definition:
    // docs 1 and 3 are band-collision candidates there too
    import graft.functions.TextFunctions._
    val batch = Seq((1L, a), (3L, b)).toDF("doc_id", "text")
      .select($"doc_id", words($"text").as("w"))
      .select($"doc_id", explode(array_distinct(shingles($"w", 3))).as("s"))
      .select($"doc_id", minhashBase($"s").as("h"))
      .groupBy($"doc_id")
      .agg(min(minhashPerm($"h", 0)).as("sig_0"),
        (1 until 16).map(i => min(minhashPerm($"h", i)).as(s"sig_$i")): _*)
    val sigs = batch.collect().map(r => r.getLong(0) ->
      (1 to 16).map(r.getLong)).toMap
    val sharedBand = (0 until 4).exists(bnd =>
      (0 until 4).forall(r => sigs(1L)(bnd * 4 + r) === sigs(3L)(bnd * 4 + r)))
    assert(sharedBand === (out.get(3L).map(_._1).getOrElse(0L) < 4),
      "stream and batch must agree that docs 1/3 share a band")
  }

  test("streaming dedup drops exact repeats and matches batch dropDuplicates") {
    val stream = EventPipelines.eventStream(spark, sf)
    runToMemory(EventPipelines.dedupedEvents(stream), "dedup_out")
    val streamed = spark.table("dedup_out")
    val batch = Tables
      .events(spark, sf)
      .dropDuplicates("user_id", "event_type", "value")
    // same watermark window covers the whole (single-batch) file read,
    // so streamed dedup must equal batch dedup in count
    assert(streamed.count() === batch.count())
    assert(
      streamed.groupBy($"user_id", $"event_type", $"value").count()
        .filter($"count" > 1).count() === 0,
      "no duplicates may survive")
  }

  test("stream-stream interval join matches the batch range-join semantics") {
    val stream = EventPipelines.eventStream(spark, sf)
    runToMemory(EventPipelines.purchaseClickJoin(stream), "ssj_out")
    val streamed = spark
      .table("ssj_out")
      .groupBy($"p_id")
      .agg(count(lit(1)).as("n_clicks"))
    // batch ground truth with identical semantics
    val ev = Tables.events(spark, sf)
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id".as("pu"), $"ts".as("pt"))
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"ts".as("ct"))
    val batch = p
      .join(c, $"pu" === $"cu" && $"ct" < $"pt" &&
        $"ct" >= $"pt" - expr("INTERVAL 5 MINUTES"))
      .groupBy($"p_id")
      .agg(count(lit(1)).as("n_clicks"))
    assert(streamed.except(batch).count() === 0, "no fabricated matches")
    assert(batch.except(streamed).count() === 0, "no dropped matches")
  }

  test("incremental micro-batches: rate pipeline matches batch across multi-file source") {
    // split events into 4 time-ordered files and stream them one per
    // micro-batch — exercises real incremental watermark advancement
    // rather than a single catch-all batch
    val dir = java.nio.file.Files.createTempDirectory("evsplit").toString
    val ev = Tables.events(spark, sf).orderBy($"ts_ns")
    val n = ev.count()
    val parts = 4
    (0 until parts).foreach { i =>
      ev.limit(((i + 1) * n / parts).toInt)
        .except(if (i == 0) ev.limit(0) else ev.limit((i * n / parts).toInt))
        .write.mode("overwrite").parquet(s"$dir/chunk=$i")
    }
    val schema = spark.read.parquet(s"$dir/chunk=0").schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/chunk=*")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
    val q = streaming.EventPipelines
      .requestRate(stream)
      .writeStream.outputMode("append").format("memory").queryName("inc_rate").start()
    q.processAllAvailable()
    val nBatches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    assert(nBatches >= 2, s"expected multiple micro-batches, got $nBatches")
    val streamed = spark.table("inc_rate").select(
      date_format($"minute_start", "yyyy-MM-dd HH:mm").as("minute"), $"event_type", $"n")
    val batch = operators.Events.qRate1m.fn(spark, sf)
      .select($"minute", $"event_type", $"n")
    assert(streamed.except(batch).count() === 0, "no fabricated windows")
    // late-window tail may be unemitted, but everything emitted must match
    assert(streamed.count() > 0)
  }

  test("metrics push sink receives batches on the 30s trigger path") {
    val received = new java.util.concurrent.atomic.AtomicLong(0)
    val stream = EventPipelines.eventStream(spark, sf)
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val q = EventPipelines.metricsPush(
      stream,
      (batch, _) => { received.addAndGet(batch.count()) },
      ckpt)
    q.processAllAvailable()
    q.stop()
    assert(received.get() > 0, "push sink must observe aggregated rows")
  }

  test("membership snapshot log emits the full current service list (T3)") {
    val snapshots = new java.util.concurrent.ConcurrentLinkedQueue[Seq[String]]()
    implicit val sqlCtx = spark.sqlContext
    val regs = MemoryStream[(String, Timestamp)]
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val q = EventPipelines.membershipSnapshotLog(
      regs.toDF().toDF("service", "ts"),
      snap => snapshots.add(snap),
      ckpt)
    regs.addData(("10.0.0.1:8080", new Timestamp(1000)))
    regs.addData(("10.0.0.2:8080", new Timestamp(2000)))
    q.processAllAvailable()
    // a later registration joins the NEXT snapshot (complete-mode re-emit)
    regs.addData(("10.0.0.3:8080", new Timestamp(3000)))
    q.processAllAvailable()
    q.stop()
    val seen = snapshots.toArray(Array.empty[Seq[String]])
    assert(seen.nonEmpty)
    assert(seen.last === Seq("10.0.0.1:8080", "10.0.0.2:8080", "10.0.0.3:8080"),
      "final snapshot must be the full sorted membership")
    assert(seen.forall(s => s == s.sorted && s.distinct == s),
      "each snapshot is a distinct sorted set")
  }

  test("socket echo reads a real TCP stream end-to-end (S9)") {
    // a real localhost server: accept one connection, write lines, close —
    // the socket-source binding of the echo transform, not just the
    // MemoryStream form
    val server = new java.net.ServerSocket(0)
    val port = server.getLocalPort
    val writer = new Thread(() => {
      val sock = server.accept()
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      Seq("ping", "pong pong").foreach(out.println)
      out.flush()
      Thread.sleep(2000) // let the source poll before the stream closes
      sock.close(); server.close()
    })
    writer.setDaemon(true)
    writer.start()
    val q = EventPipelines.socketEcho(spark, "localhost", port)
      .writeStream.outputMode("append").format("memory")
      .queryName("socket_echo_out").start()
    try {
      // socket source has no end-of-stream; poll until both lines landed
      val deadline = System.currentTimeMillis() + 30000
      def rows() = spark.table("socket_echo_out").collect()
      while (rows().length < 2 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(100)
      }
      val got = rows().map(r => (r.getAs[String]("echoed"),
        r.getAs[Int]("n_bytes"))).sortBy(_._1)
      assert(got.toSeq === Seq(("ping", 4), ("pong pong", 9)))
    } finally q.stop()
  }

  test("echo returns every message verbatim with request metrics (S9)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    in.addData("hello", "", "echo echo", "héllo")
    val q = EventPipelines.echo(in.toDF()).writeStream
      .outputMode("append").format("memory").queryName("echo_out2").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("echo_out2")
      .select($"echoed", $"n_bytes", $"incoming_requests")
      .as[(String, Int, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq("", "echo echo", "hello", "héllo"))
    // n_bytes counts octets on the wire: "héllo" is 5 chars but 6 bytes
    assert(rows.forall { case (s, n, c) =>
      n === s.getBytes("UTF-8").length && c === 1L })
  }

  test("library chunker runs unchanged on a stream (batch/stream parity)") {
    // CorpusOps.ragChunks is a narrow transform, so the SAME library call
    // that chunks a batch corpus chunks a readStream — no streaming
    // variant to maintain. Batch output is the ground truth.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "alpha beta gamma"),
      (3L, "just one tiny doc here"))
    in.addData(docs: _*)
    val streamed = operators.CorpusOps.ragChunks(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text",
      chunkSize = 4, stride = 2)
    runToMemory(streamed, "chunks_out")
    val got = spark.table("chunks_out")
      .select($"doc_id", $"chunk_idx", $"chunk_text")
      .as[(Long, Int, String)].collect().sortBy(r => (r._1, r._2))
    val batch = operators.CorpusOps.ragChunks(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        chunkSize = 4, stride = 2)
      .select($"doc_id", $"chunk_idx", $"chunk_text")
      .as[(Long, Int, String)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq === batch.toSeq)
    assert(got.count(_._1 == 1L) === 5) // 10 words, size 4 stride 2
  }

  test("library rule filter runs unchanged on a stream (batch/stream parity)") {
    // CorpusOps.gopherRules is a pure projection, so the exact library
    // call that gates a batch corpus gates a readStream micro-batch —
    // the shape a streaming ingest quality gate actually has.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = Seq(
      (1L, ((1 to 30).map(i => s"word$i") ++ Seq("the", "of"))
        .mkString(" ")), // passes all rules
      (2L, "too short"), // fails the word-count floor
      (3L, Seq.fill(40)("dup").mkString(" ") + " the of")) // repetitive
    in.addData(docs: _*)
    val streamed = operators.CorpusOps.gopherRules(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text")
    runToMemory(streamed, "rules_out")
    val got = spark.table("rules_out")
      .select($"doc_id", $"pass").as[(Long, Boolean)]
      .collect().sortBy(_._1)
    val batch = operators.CorpusOps.gopherRules(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .select($"doc_id", $"pass").as[(Long, Boolean)]
      .collect().sortBy(_._1)
    assert(got.toSeq === batch.toSeq)
    assert(got.toMap === Map(1L -> true, 2L -> false, 3L -> false))
  }
  test("streaming KMV distinct estimate equals the batch sketch") {
    val stream = EventPipelines.eventStream(spark, sf)
    val q = EventPipelines.distinctUsersSketch(stream)
      .writeStream.outputMode("update").format("memory")
      .queryName("kmv_out").start()
    q.processAllAvailable()
    q.stop()
    import org.apache.spark.sql.functions._
    // last emitted estimate per type (update mode re-emits per trigger)
    val streamed = spark.table("kmv_out")
      .groupBy($"event_type")
      .agg(max(struct($"n_seen", $"est_users")).as("s"))
      .select($"event_type", $"s.est_users")
      .as[(String, Long)].collect().toMap
    val batch = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(graft.plans.KmvAgg.kmvDistinct(
        graft.functions.TextFunctions.stableHash60(
          concat(lit("u|"), $"user_id")), 64).as("est"))
      .as[(String, Long)].collect().toMap
    assert(streamed === batch,
      "streamed sketch must equal the batch KMV over the same prefix")
    // and state stays sketch-sized: estimates are positive and bounded
    assert(streamed.values.forall(_ > 0))
  }
  test("streaming DDSketch quantiles equal the batch bucket estimates") {
    val stream = EventPipelines.eventStream(spark, sf)
    val q = EventPipelines.latencySketch(stream)
      .writeStream.outputMode("update").format("memory")
      .queryName("dd_out").start()
    q.processAllAvailable()
    q.stop()
    import org.apache.spark.sql.functions._
    val streamed = spark.table("dd_out")
      .groupBy($"event_type")
      .agg(max(struct($"n", $"p50_est", $"p95_est", $"p99_est")).as("s"))
      .select($"event_type", $"s.n", $"s.p50_est", $"s.p99_est")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // batch twin: identical bucket rule + midpoint estimate
    val lnG = math.log(EventPipelines.StreamDdGamma)
    val b = Tables.events(spark, sf).filter($"value" > 0)
      .groupBy($"event_type",
        ceil(round(log($"value") / lnG, 8)).cast("long").as("bk"))
      .agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)].collect()
    b.groupBy(_._1).foreach { case (tpe, rs) =>
      val m = rs.map(r => r._2 -> r._3).toMap
      val n = m.values.sum
      def est(p: Double): Double = {
        val target = math.ceil(p * n).toLong
        var cc = 0L
        val bk = m.toSeq.sortBy(_._1).collectFirst {
          case (bb, c) if { cc += c; cc >= target } => bb
        }.get
        2.0 * math.pow(EventPipelines.StreamDdGamma, bk.toDouble) /
          (EventPipelines.StreamDdGamma + 1.0)
      }
      val (_, sn, s50, s99) = streamed(tpe)
      assert(sn === n, s"count($tpe)")
      assert(math.abs(s50 - est(0.50)) <= 1e-9, s"p50($tpe)")
      assert(math.abs(s99 - est(0.99)) <= 1e-9, s"p99($tpe)")
    }
    // the sketch guarantee: estimates within 2% of the exact quantiles
    val exact = Tables.events(spark, sf).filter($"value" > 0)
      .groupBy($"event_type")
      .agg(expr("percentile(value, 0.5)").as("e50"))
      .as[(String, Double)].collect().toMap
    streamed.foreach { case (tpe, (_, _, s50, _)) =>
      assert(math.abs(s50 - exact(tpe)) / exact(tpe) <= 0.02 + 1e-6,
        s"relative error guarantee($tpe)")
    }
  }

  test("streaming funnel stage census equals the batch funnel counts") {
    val stream = EventPipelines.eventStream(spark, sf)
    val q = EventPipelines.funnelProgress(stream)
      .writeStream.outputMode("update").format("memory")
      .queryName("funnel_out").start()
    q.processAllAvailable()
    q.stop()
    import org.apache.spark.sql.functions._
    // last emitted stage per user
    val stages = spark.table("funnel_out")
      .groupBy($"user_id").agg(max($"stage").as("stage"))
      .as[(Long, Int)].collect().toMap
    val (viewed, clicked, purchased) = graft.operators.Events.qFunnel
      .fn(spark, sf)
      .select($"viewed", $"clicked", $"purchased")
      .as[(Long, Long, Long)].head()
    assert(stages.values.count(_ >= 1) === viewed,
      "stage >= 1 census == users with a view")
    assert(stages.values.count(_ >= 2) === clicked,
      "stage >= 2 census == users converting view -> click")
    assert(stages.values.count(_ >= 3) === purchased,
      "stage 3 census == users converting click -> purchase")
    // every user with any event appears exactly once
    assert(stages.size === Tables.events(spark, sf)
      .select($"user_id").distinct().count())
  }

  test("stream-static enrichment join matches the batch join per event") {
    val stream = EventPipelines.eventStream(spark, sf)
    val userDim = Tables.events(spark, sf)
      .select($"user_id").distinct()
      .select($"user_id",
        concat(lit("seg"), pmod($"user_id", lit(3))).as("segment"),
        lit("2023-01-01").as("user_since"))
    runToMemory(EventPipelines.enrichedEvents(stream, userDim), "enrich_out")
    val streamed = spark.table("enrich_out")
      .select($"event_id", $"segment", $"high_value")
    val batch = EventPipelines.enrichedEvents(
      Tables.events(spark, sf), userDim)
      .select($"event_id", $"segment", $"high_value")
    assert(streamed.count() === Tables.events(spark, sf).count())
    assert(streamed.except(batch).count() === 0)
    assert(batch.except(streamed).count() === 0)
    // every known user resolved (dim covers all users here)
    assert(spark.table("enrich_out").filter($"segment" === "unknown").count() === 0)
  }

  test("streaming stats maintenance converges to the batch recompute") {
    val state = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF().toDF("doc_id", "source", "text")
    val ckpt = java.nio.file.Files.createTempDirectory("mv_ckpt").toString
    val q = EventPipelines.statsMaintenance(
      docs,
      (src, dn, ds) => state.merge(src, (dn, ds),
        (a, b) => (a._1 + b._1, a._2 + b._2)),
      ckpt)
    val rows = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect().toSeq
    // feed in three uneven micro-batches: the merge must be associative
    val (b1, rest) = rows.splitAt(rows.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    Seq(b1, b2, b3).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    val batch = Tables.documents(spark, sf)
      .groupBy($"source")
      .agg(count(lit(1)).as("n"), sum(length($"text").cast("long")).as("s"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    import scala.jdk.CollectionConverters._
    assert(state.asScala.toMap === batch,
      "incrementally maintained stats must equal the batch recompute")
  }

  test("streaming compaction maintenance replans to the batch q_compaction_plan") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val files = input.toDF().toDF("doc_id", "source", "n_chars")
    val censusDir =
      java.nio.file.Files.createTempDirectory("compact_census").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("compact_ckpt").toString
    @volatile var lastPlan: Array[org.apache.spark.sql.Row] = Array.empty
    var nPlans = 0
    val q = EventPipelines.compactionMaintenance(
      files, censusDir, ckpt, 32768L,
      plan => { lastPlan = plan.collect(); nPlans += 1 })
    val rows = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"n_chars".cast("long"))
      .as[(Long, String, Long)].collect().toSeq
    // files land in three uneven waves; the loop replans after each
    val (b1, rest) = rows.splitAt(rows.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    Seq(b1, b2, b3).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    assert(nPlans >= 3, "every micro-batch must trigger a replan")
    // the final streamed plan equals the oracle-gated batch query on the
    // same census — the window's ORDER BY doc_id makes bins independent
    // of arrival order, so streaming accumulation cannot change the plan
    val batch = graft.operators.Layout.qCompactionPlan.fn(spark, sf).collect()
    assert(lastPlan.toSeq === batch.toSeq,
      "streamed compaction plan must equal the batch plan on the same census")
  }
}
