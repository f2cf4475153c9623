package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming pipelines — the reference's periodic/streaming
  * dataflow (SURVEY §2.9) on event time with watermarks.
  *
  * Reference patterns (/root/reference):
  *  - T5/A1-A2: per-request counters with env/status labels,
  *    common/src/metrics.rs:16-24, incremented per TCP message
  *    (worker/src/main.rs:76-82) → windowed streaming counts;
  *  - A4: response-time histogram + Grafana p50/p95/p99 panels →
  *    windowed approx quantiles;
  *  - T2: etcd lease keep-alive — lease TTL 40 s, refresh every 30 s
  *    (worker/src/service_registry/etcd.rs:118,66) → keyed state with a
  *    40 s timeout: a service whose heartbeats stop is declared down
  *    when the watermark passes its lease expiry;
  *  - T4/S12: metrics pushed to a gateway every 30 s
  *    (common/src/metrics.rs:36-52) → foreachBatch sink on a 30 s
  *    processing-time trigger.
  *
  * Everything is event-time + watermark driven (the reference has no
  * event-time notion — wall clock only — so this is the Spark-native
  * upgrade SURVEY §2.9 calls for).
  */
object EventPipelines {

  /** Streaming source over an events directory, normalized to the same
    * shape the batch Tables.events exposes (`ts_ns` epoch-nanos +
    * TimestampType `ts`) regardless of which timestamp physical type the
    * driver's generator wrote (ns-as-long, µs-adjusted-UTC, or tz-naive
    * µs → TIMESTAMP_NTZ in Spark 4). The batch read infers the schema —
    * file sources require one up front — and the branch mirrors
    * Tables.events exactly so batch/stream parity specs compare like
    * for like (same `ts` type, same `ts_ns` derivation). */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    val batchSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // the file source monitors a DIRECTORY; select just the events table
    // from the sf dir via a glob filter
    val raw = spark.readStream
      .schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    batchSchema("ts").dataType.typeName match {
      case "long" | "bigint" =>
        raw
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case "timestamp_ntz" =>
        // watermarks REQUIRE TimestampType (EVENT_TIME_IS_NOT_ON_
        // TIMESTAMP_TYPE on NTZ), so unlike the batch loader the stream
        // casts `ts` — instant-preserving under the UTC session tz, so
        // window boundaries match the batch plane wall-clock for parity
        raw
          .withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000)
      case _ =>
        raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000)
    }
  }

  /** A1/A2/T5: tumbling 1-minute request rate by event type. */
  def requestRate(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        col("window.start").as("minute_start"),
        col("event_type"),
        col("n"),
        col("sum_value"))

  /** A4: per-window latency quantiles (approx — streaming-mergeable
    * sketch, the percentile_approx analog of histogram_quantile). */
  def latencyQuantiles(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("p50"),
        percentile_approx(col("value"), lit(0.95), lit(1000)).as("p95"),
        percentile_approx(col("value"), lit(0.99), lit(1000)).as("p99"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("p50"), col("p95"), col("p99"))

  /** Session windows per user with a 30-minute gap — the streaming form
    * of Events.qSessionize. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("session_window.start").as("session_start"),
        col("user_id"),
        col("n_events"))

  // ---- T2: lease liveness via keyed state -------------------------------

  case class Heartbeat(service: String, ts: java.sql.Timestamp)
  case class LeaseState(lastSeen: Long)
  case class LivenessEvent(service: String, status: String, atMs: Long)

  val LeaseTtlMs: Long = 40000L // etcd.rs:118 lease_grant(40)

  /** T2: flatMapGroupsWithState lease monitor. A service is UP while
    * heartbeats arrive; when the event-time watermark passes
    * lastSeen + 40 s with no heartbeat, the state times out and a DOWN
    * event is emitted — exactly the etcd lease-expiry semantics. */
  def livenessMonitor(heartbeats: Dataset[Heartbeat]): Dataset[LivenessEvent] = {
    val spark = heartbeats.sparkSession
    import spark.implicits._
    heartbeats
      .withWatermark("ts", "5 seconds")
      .groupByKey(_.service)
      .flatMapGroupsWithState[LeaseState, LivenessEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (service, beats, state: GroupState[LeaseState]) =>
          if (state.hasTimedOut) {
            val last = state.get.lastSeen
            state.remove()
            Iterator(LivenessEvent(service, "down", last + LeaseTtlMs))
          } else {
            val latest = beats.map(_.ts.getTime).max
            val first = !state.exists
            val newLast = state.getOption.map(_.lastSeen.max(latest)).getOrElse(latest)
            state.update(LeaseState(newLast))
            state.setTimeoutTimestamp(newLast + LeaseTtlMs)
            if (first) Iterator(LivenessEvent(service, "up", latest))
            else Iterator.empty
          }
      }
  }

  /** Streaming exact deduplication: drop repeated (user_id, event_type,
    * value) observations, keeping state only within the watermark window
    * (dropDuplicatesWithinWatermark bounds state growth — the streaming
    * form of the exact-dedup batch operator). */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "value")

  /** Stream-stream interval join: each purchase joined to the same
    * user's clicks from the preceding 5 minutes. Both sides are
    * watermarked so Spark can bound the join state — the streaming form
    * of Temporal.qRangeJoin. */
  def purchaseClickJoin(events: DataFrame): DataFrame = {
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val clicks = events
      .filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    purchases.join(
      clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") < col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 5 MINUTES"))
  }

  /** T3: membership snapshot log (etcd.rs:70-76) — the reference logs the
    * full registered-services list every 5 s from its shared registry
    * state. Registrations stream in as (service, ts) rows; the snapshot
    * is the distinct current set, re-emitted per trigger in complete
    * mode to a pluggable log sink (console `info!` in the reference, a
    * captured buffer in specs). Returns the started query. */
  def membershipSnapshotLog(
      registrations: DataFrame,
      logSink: Seq[String] => Unit,
      checkpoint: String) =
    registrations
      .groupBy()
      .agg(sort_array(collect_set(col("service"))).as("services"))
      .writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("5 seconds")) // etcd.rs:72
      .foreachBatch { (df: DataFrame, _: Long) =>
        val snap = df.collect().headOption
          .map(_.getAs[scala.collection.Seq[String]]("services").toSeq)
          .getOrElse(Seq.empty)
        logSink(snap)
      }
      .start()

  /** S9: TCP echo semantics (worker/src/main.rs:72-90) — every message
    * comes back verbatim while the request counter and response-size
    * metrics tick. Works over any line stream; [[socketEcho]] binds it
    * to Spark's socket source (the TcpStream analog). */
  def echo(lines: DataFrame): DataFrame =
    lines.select(
      col("value").as("echoed"),
      // byte length, not char length — the reference's response-size
      // metric counts octets on the wire, which differ for non-ASCII
      length(encode(col("value"), "UTF-8")).as("n_bytes"),
      lit(1L).as("incoming_requests"))

  /** The socket-bound form of [[echo]]. */
  def socketEcho(spark: SparkSession, host: String, port: Int): DataFrame =
    echo(
      spark.readStream
        .format("socket")
        .option("host", host)
        .option("port", port)
        .load())

  /** T4/S12: 30-second metrics push — windowed counts delivered to a
    * pluggable sink via foreachBatch (the push-gateway analog). Returns
    * the started query; caller owns its lifecycle. */
  def metricsPush(
      events: DataFrame,
      pushSink: (DataFrame, Long) => Unit,
      checkpoint: String) = {
    requestRate(events).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("30 seconds")) // metrics.rs:46
      .foreachBatch(pushSink)
      .start()
  }

  /** Streaming corpus ingest: the quality-gate + exact-dedup front of the
    * batch clean-corpus pipeline on an unbounded document stream
    * (schema: doc_id, text, lang, ts). Per-document metrics are narrow;
    * the content-fingerprint dedup state is bounded by the watermark — a
    * re-crawled duplicate inside the horizon is dropped in-stream, one
    * beyond it is left for a periodic batch pass grouping on the SAME
    * normalized fingerprint this stream emits (md5 of lowercased,
    * whitespace-collapsed text — the q_text_fingerprint definition; NOT
    * raw-md5 q_dedup_exact, which would disagree with the stream about
    * what counts as a duplicate). The standard two-tier split: bounded
    * streaming state + exact batch reconciliation over one shared key.
    * Quality semantics mirror the batch gate: >= 100 chars and
    * type-token ratio > 0.3. */
  def corpusIngest(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions._
    val w = words(col("text"))
    docs
      .withWatermark("ts", "10 minutes")
      .filter(length(col("text")) >= 100 &&
        size(array_distinct(w)) * lit(1.0) / size(w) > 0.3)
      .withColumn("fp", md5(normText(col("text"))))
      .dropDuplicatesWithinWatermark("fp")
      .select(col("doc_id"), col("lang"), col("fp"),
        size(w).as("n_words"), col("ts"))
  }

  /** MinHash bands per streaming document (NumBands × RowsPerBand = the
    * 16 fixed permutations the batch dedup queries use). */
  val NearDupBands = 4
  val NearDupRowsPerBand = 4

  /** Streaming NEAR-dup ingest: [[corpusIngest]] drops exact
    * (normalized-fingerprint) repeats; this extends the in-horizon tier to
    * MinHash near-duplicates. Each document computes its 16-permutation
    * MinHash signature NARROWLY (array transforms over the shingle array —
    * no per-document explode/groupBy, which would be a second stateful
    * aggregation) and explodes into [[NearDupBands]] band-key rows; each
    * band key is deduplicated within the watermark horizon, and a windowed
    * per-document count reassembles the verdict:
    *  - all bands survived  → no in-horizon collision anywhere → admitted
    *  - some bands survived → shares signature slices with an in-horizon
    *    predecessor → emitted with admitted=false (the near-dup suspect
    *    stream a downstream exact-verify consumes, mirroring the batch
    *    LSH verify stage)
    *  - no bands survived   → near-identical to an in-horizon predecessor
    *    → dropped in-stream entirely (like corpusIngest's exact tier)
    * Two chained stateful operators (watermarked dedup → windowed count),
    * both with watermark-bounded state; documents under 3 words have no
    * shingles and are filtered (their empty signature would alias). The
    * beyond-horizon tier stays the batch MinHash pass over the same
    * signature definition, so stream and batch can never disagree about
    * what counts as a near-duplicate. */
  def nearDupIngest(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions._
    val sh = shingles(words(col("text")), 3)
    val base = transform(sh, s => stableHash60(s) % MinhashP)
    def sig(i: Int): Column = {
      val (a, b) = MinhashPerms(i)
      array_min(transform(col("__base"), h => (h * a + b) % MinhashP))
    }
    val bandKeys = array((0 until NearDupBands).map { j =>
      concat_ws("_",
        lit(j) +: (0 until NearDupRowsPerBand)
          .map(r => sig(j * NearDupRowsPerBand + r)): _*)
    }: _*)
    docs
      .withWatermark("ts", "10 minutes")
      .withColumn("__base", base)
      .filter(size(col("__base")) > 0)
      .select(col("doc_id"), col("ts"), explode(bandKeys).as("band_key"))
      .dropDuplicatesWithinWatermark("band_key")
      .groupBy(window(col("ts"), "10 minutes"), col("doc_id"))
      .agg(count(lit(1)).as("n_new_bands"))
      .select(
        col("window.start").as("ws"),
        col("doc_id"),
        col("n_new_bands"),
        (col("n_new_bands") === NearDupBands).as("admitted"))
  }

  // ---- streaming distinct-count sketch ----------------------------------

  case class TypedUser(event_type: String, user_id: Long)
  case class DistinctEstimate(event_type: String, n_seen: Long, est_users: Long)

  /** KMV sketch size for the streaming distinct estimator. */
  val StreamKmvK = 64

  /** Streaming distinct-user estimate per event type: mapGroupsWithState
    * maintains the same k-minimum-values buffer [[graft.plans.KmvAgg]]
    * aggregates in batch — ≤ k longs of state per group FOREVER,
    * regardless of how many users stream past (an exact streaming
    * distinct would grow state linearly; dropDuplicates state is
    * watermark-bounded but this sketch needs no watermark at all). Each
    * trigger emits the running estimate per type; the batch KMV formula
    * means the streamed estimate equals the batch `kmv_distinct` over
    * the same prefix — asserted in StreamingSpec. */
  def distinctUsersSketch(events: DataFrame): Dataset[DistinctEstimate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type"), col("user_id"))
      .as[TypedUser]
      .groupByKey(_.event_type)
      .mapGroupsWithState[(Array[Long], Long), DistinctEstimate](
        GroupStateTimeout.NoTimeout) {
        (tpe, rows, state: GroupState[(Array[Long], Long)]) =>
          val buf = new graft.plans.KmvAgg.Buffer(StreamKmvK)
          val (prior, priorSeen) =
            state.getOption.getOrElse((Array.empty[Long], 0L))
          prior.foreach(buf.add)
          var seen = priorSeen
          rows.foreach { r =>
            seen += 1
            buf.add(graft.plans.StableHash60.hash(
              org.apache.spark.unsafe.types.UTF8String.fromString(
                s"u|${r.user_id}")))
          }
          state.update(
            (java.util.Arrays.copyOf(buf.values, buf.size), seen))
          val est =
            if (buf.size < StreamKmvK) buf.size.toLong
            else math.floor((StreamKmvK - 1).toDouble *
              (graft.plans.KmvAgg.M / buf.kth.toDouble)).toLong
          DistinctEstimate(tpe, seen, est)
      }
  }

  case class TypedValue(event_type: String, value: Double)
  case class QuantileEstimate(event_type: String, n: Long,
      p50_est: Double, p95_est: Double, p99_est: Double)

  /** DDSketch gamma shared with the batch plane (`Events.qEventsDdsketch`)
    * so stream and batch produce IDENTICAL buckets. */
  val StreamDdGamma = 1.02

  /** The batch plane's bucket rule, verbatim: ceil(round(ln v/ln γ, 8))
    * — the 8-decimal round absorbs libm ulp differences so a value
    * lands in the same bucket everywhere. */
  private[streaming] def ddBucket(v: Double): Long = {
    val x = math.log(v) / math.log(StreamDdGamma)
    math.ceil(BigDecimal(x)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong
  }

  /** Streaming DDSketch latency quantiles (A4's p50/p95/p99 panels as a
    * RUNNING estimate): per event type, a sparse bucket-count map in
    * keyed state — DDSketch's merge is count addition, so the state is
    * exactly the batch aggregate restricted to rows seen so far, and a
    * one-batch run is BIT-IDENTICAL to `q_events_ddsketch`'s bucket
    * phase (StreamingSpec proves estimate parity). Emits the current
    * n + p50/p95/p99 midpoint estimates per type after each batch.
    *
    * Scale: state is O(buckets) ≈ 1200 longs per type regardless of
    * stream length — the property that makes the sketch the streaming
    * latency monitor (an exact percentile would buffer every value). */
  def latencySketch(events: DataFrame): Dataset[QuantileEstimate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col("value") > 0)
      .select(col("event_type"), col("value"))
      .as[TypedValue]
      .groupByKey(_.event_type)
      .mapGroupsWithState[Map[Long, Long], QuantileEstimate](
        GroupStateTimeout.NoTimeout) {
        (tpe, rows, state: GroupState[Map[Long, Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[Long, Long])
          rows.foreach { r =>
            val bk = ddBucket(r.value)
            m = m.updated(bk, m.getOrElse(bk, 0L) + 1L)
          }
          state.update(m)
          val n = m.values.sum
          def est(p: Double): Double = {
            val target = math.ceil(p * n).toLong
            // explicit walk — mutating the running count inside a
            // collectFirst guard double-counts if the partial function
            // is probed via isDefinedAt before apply (an implementation
            // detail collectFirst does not promise to avoid)
            val sorted = m.toSeq.sortBy(_._1)
            var cc = 0L
            var found = Long.MinValue
            val it = sorted.iterator
            while (found == Long.MinValue && it.hasNext) {
              val (b, c) = it.next()
              cc += c
              if (cc >= target) found = b
            }
            val bk = if (found == Long.MinValue) m.keys.max else found
            2.0 * math.pow(StreamDdGamma, bk.toDouble) / (StreamDdGamma + 1.0)
          }
          QuantileEstimate(tpe, n, est(0.50), est(0.95), est(0.99))
      }
  }

  case class FunnelEvent(user_id: Long, event_type: String, ts_ns: Long)
  case class FunnelState(t1: Long, t2: Long, t3: Long) // MinValue = unset
  case class FunnelProgress(user_id: Long, stage: Int)

  /** Streaming funnel state machine (view → click → purchase, the same
    * first-qualifying-event rule as the batch `Events.qFunnel`): per
    * user, a 3-slot timestamp state advanced by folding each batch's
    * events in event-time order — a click only qualifies after the
    * first view, a purchase only after that click. Emits the user's
    * current stage (0–3) after every batch; StreamingSpec proves the
    * stage census equals the batch funnel's counts.
    *
    * State is three longs per user — the O(1)-per-key shape that
    * tracks a funnel over an unbounded stream where the batch form
    * would rescan history. Within-batch events are sorted by event
    * time (micro-batches arrive time-ordered across batches under
    * watermarked sources; the in-batch sort closes the gap). */
  def funnelProgress(events: DataFrame): Dataset[FunnelProgress] = {
    val spark = events.sparkSession
    import spark.implicits._
    val unset = Long.MinValue
    events
      .select(col("user_id"), col("event_type"), col("ts_ns"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelProgress](
        GroupStateTimeout.NoTimeout) {
        (uid, rows, state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(unset, unset, unset))
          rows.toSeq.sortBy(e => (e.ts_ns, e.event_type)).foreach { e =>
            e.event_type match {
              case "view" if st.t1 == unset =>
                st = st.copy(t1 = e.ts_ns)
              case "click" if st.t1 != unset && st.t2 == unset &&
                  e.ts_ns > st.t1 =>
                st = st.copy(t2 = e.ts_ns)
              case "purchase" if st.t2 != unset && st.t3 == unset &&
                  e.ts_ns > st.t2 =>
                st = st.copy(t3 = e.ts_ns)
              case _ => ()
            }
          }
          state.update(st)
          val stage =
            if (st.t3 != unset) 3
            else if (st.t2 != unset) 2
            else if (st.t1 != unset) 1
            else 0
          FunnelProgress(uid, stage)
      }
  }

  /** Stream-static enrichment join: the event stream left-joined to a
    * STATIC dimension (per-user attributes) on user_id, plus a derived
    * spend segment. Spark re-plans the static side each micro-batch (a
    * broadcast for an aggregate-sized dimension), so dimension updates
    * between batches are picked up without restarting the query — the
    * streaming analog of the batch star join, and the standard shape for
    * enriching a 100 TB/day event firehose against warehouse dims.
    * Output is append-safe (no aggregation): one enriched row per event. */
  def enrichedEvents(events: DataFrame, userDim: DataFrame): DataFrame = {
    val dim = userDim.select(
      col("user_id"), col("segment"), col("user_since"))
    events
      .join(broadcast(dim), Seq("user_id"), "left")
      .select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        coalesce(col("segment"), lit("unknown")).as("segment"),
        col("user_since"),
        (col("value") >= 50.0).as("high_value"))
  }

  /** Streaming incremental stats-view maintenance — the streaming twin
    * of `q_mv_maintain`: each micro-batch's per-key (count, chars) delta
    * is MERGED into a persistent stats map via foreachBatch (SUM/COUNT
    * are self-maintainable, so merge = add). The sink is pluggable (the
    * spec uses an in-memory map; production uses an upsert-capable
    * table). Returns the started query; caller owns its lifecycle.
    * State cost: O(|keys|) in the sink, zero in the stream (stateless
    * aggregation per batch — the merge carries history). */
  def statsMaintenance(
      docs: DataFrame,
      merge: (String, Long, Long) => Unit,
      checkpoint: String) = {
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch
          .groupBy(col("source"))
          .agg(count(lit(1)).as("dn"),
            sum(length(col("text")).cast("long")).as("ds"))
          .collect()
          .foreach(r =>
            merge(r.getString(0), r.getLong(1), r.getLong(2)))
      }
      .start()
  }

  /** Streaming compaction maintenance — the table-ops loop a lakehouse
    * runs continuously: newly-landed small files (a census stream of
    * `(source, doc_id, n_chars)` rows) are appended to a durable listing
    * table, and after every micro-batch the compaction plan is
    * recomputed over the FULL accumulated census and handed to the
    * compactor callback. The plan itself is
    * [[graft.operators.Layout.compactionSummary]] — the exact definition
    * behind the oracle-gated `q_compaction_plan` — so the streamed plan
    * structurally cannot drift from the batch query (StreamingSpec pins
    * the equality on the same census).
    *
    * Scale: the per-batch write is the batch's own size; the replan is
    * the batch query's one-window-one-aggregate pass over the listing
    * table (file METADATA, ~1 row per object — million-object censuses
    * replan in seconds, and the closed-form bin rule means no driver
    * loop). A production deployment would swap the parquet census dir
    * for the table format's manifest and fire the callback into the
    * rewrite job queue. */
  def compactionMaintenance(
      files: DataFrame,
      censusDir: String,
      checkpoint: String,
      target: Long,
      onPlan: DataFrame => Unit) = {
    val spark = files.sparkSession
    files.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // foreachBatch is at-least-once: a retried batch must REWRITE,
        // not re-append, or duplicate census rows would permanently skew
        // every later plan. Each batch owns a batchId-named subdir
        // written with overwrite — replays are idempotent.
        batch
          .select(col("source"), col("doc_id"), col("n_chars"))
          .write.mode("overwrite").parquet(s"$censusDir/batch_$batchId")
        onPlan(graft.operators.Layout.compactionSummary(
          spark.read.option("recursiveFileLookup", "true")
            .parquet(censusDir), target))
      }
      .start()
  }
}
