package graft.sources

import graft.functions.TextFunctions.stableHash60
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-bucketed key-value object store — the reference's primary data
  * plane re-expressed as a partitioned parquet table.
  *
  * Reference semantics (/root/reference, cited file:line):
  *  - placement: `{root}/{short_hash(key) % num_bucket}/{filename}`,
  *    common/src/kv_store/local_kv_store/local_file_kv_store.rs:62-70;
  *  - bucket count 1024, common/src/settings/local_kv_options.rs:23;
  *  - get = whole-object read, local_file_kv_store.rs:49-60 (S1);
  *  - put = create-or-overwrite, local_file_kv_store.rs:19-47 (S2);
  *  - key hash, common/src/kv_store/mod.rs:26-30 — Rust `DefaultHasher`,
  *    unstable across releases, replaced here by the md5-derived
  *    [[stableHash60]] (documented divergence, SURVEY §2.8 F1).
  *
  * Spark design: the bucket id is a physical partition column, so the
  * directory layout IS the reference's `{root}/{bucket}/` layout, and a
  * point `get` prunes to a single directory (partition pruning) before
  * any row is read. At 100 TB / 1024 buckets each partition stays
  * ~100 GB — splittable further by parquet row groups; writes scale out
  * because `put` only shuffles by bucket id.
  *
  * The reference's h2 PUT handler persists only the FIRST body chunk
  * (worker bug, common/src/h2/h2_service.rs:98-104 — `if let` instead of
  * a loop). We implement the correct semantics: a multi-chunk put
  * reassembles all chunks (see [[putChunked]]).
  */
class KvStore(spark: SparkSession, val root: String, numBuckets: Int = 1024) {
  import spark.implicits._

  /** All store file ops go through the Hadoop FileSystem resolved from the
    * root URI — local `file:`, HDFS, and object stores alike (a
    * `java.io.File` path would silently break on anything non-local). */
  private val rootPath = new org.apache.hadoop.fs.Path(root)
  private def fs: org.apache.hadoop.fs.FileSystem =
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("bucket", pmod(stableHash60(col("key")), lit(numBuckets)))

  /** S2: persist (key STRING, value BINARY) rows into the bucketed layout.
    * `mode=append` mirrors create-or-add; last-write-wins resolution
    * happens at read time via the max-version rule in [[read]]. The
    * version is wall-clock epoch-micros per put batch: nanoTime's origin
    * is arbitrary per JVM (a restart could order OLD puts above new
    * ones), and monotonically_increasing_id restarts per job. */
  def put(kv: DataFrame): Unit =
    withBucket(kv.withColumn("put_seq", lit(KvStore.wallClockMicros())))
      .write
      .partitionBy("bucket")
      .mode("append")
      .parquet(root)

  /** Chunked put (S8, done correctly): reassembles (key, chunk_id, chunk)
    * rows into whole values before storing — ALL chunks, unlike the
    * reference's first-chunk-only bug. */
  def putChunked(chunks: DataFrame): Unit = {
    val whole = chunks
      .groupBy($"key")
      .agg(
        sort_array(collect_list(struct($"chunk_id", $"chunk"))).as("parts"))
      .select(
        $"key",
        aggregate(
          transform($"parts", p => p.getField("chunk")),
          lit(Array.emptyByteArray),
          (acc, c) => concat(acc, c)).as("value"))
    put(whole)
  }

  /** Last-write-wins dedup over a (possibly pre-filtered) raw snapshot
    * (single map-side combinable aggregation — no self-join). */
  private def latest(raw: DataFrame): DataFrame =
    raw
      .groupBy($"key")
      .agg(max_by($"value", $"put_seq").as("value"), max($"bucket").as("bucket"))

  /** Raw snapshot; an empty (never-written) store reads as zero rows
    * instead of PATH_NOT_FOUND. */
  private def raw(): DataFrame =
    if (fs.exists(rootPath))
      // a root that exists but holds no data files (e.g. an empty-batch
      // put wrote only _SUCCESS) has no inferable schema — treat it as
      // an empty store rather than failing the read
      try spark.read.parquet(root)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "UNABLE_TO_INFER_SCHEMA" => emptySnapshot()
      }
    else emptySnapshot()

  private def emptySnapshot(): DataFrame = {
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(Seq(
          StructField("key", StringType),
          StructField("value", BinaryType),
          StructField("put_seq", LongType),
          StructField("bucket", IntegerType))))
    }

  /** Full table view with last-write-wins per key. */
  def read(): DataFrame = latest(raw())

  /** S1: whole-object point read. The bucket predicate is applied to the
    * RAW scan (before the dedup aggregate) so it lands in the scan's
    * PartitionFilters and prunes (numBuckets-1)/numBuckets of the table —
    * filtering read() instead would sit above the groupBy and prune
    * nothing. */
  def get(key: String): Option[Array[Byte]] = {
    val bucket = math.floorMod(KvStore.hashOf(key), numBuckets.toLong).toInt
    latest(raw().filter($"bucket" === bucket && $"key" === key))
      .select($"value")
      .collect()
      .headOption
      .map(_.getAs[Array[Byte]](0))
  }

  /** Compaction: rewrite the store keeping only the latest version of
    * each key — the table-retention policy standing in for the
    * reference README's aspirational eviction (README.md:9-12 promises
    * "lock-free eviction"; no such code exists in the reference — see
    * SURVEY §0). Old put versions are dropped; the bucketed layout is
    * preserved. Write-temp-then-swap keeps readers consistent on
    * filesystems with atomic directory rename (local, HDFS); on object
    * stores rename is copy-and-delete, so production there should write
    * each compaction to a fresh versioned root and swap a pointer (e.g.
    * a catalog entry) instead — the FS abstraction below still works,
    * only the swap-visibility guarantee differs. */
  def compact(): Unit = {
    if (!fs.exists(rootPath)) return // never written — nothing to compact
    val tmp = new org.apache.hadoop.fs.Path(root + ".compacting")
    val old = new org.apache.hadoop.fs.Path(root + ".old")
    read()
      .withColumn("put_seq", lit(KvStore.wallClockMicros()))
      .select($"key", $"value", $"put_seq", $"bucket")
      .write
      .partitionBy("bucket")
      .mode("overwrite")
      .parquet(tmp.toString)
    val hfs = fs
    if (hfs.exists(old)) hfs.delete(old, true)
    if (hfs.exists(rootPath)) {
      if (!hfs.rename(rootPath, old)) {
        hfs.delete(tmp, true)
        throw new java.io.IOException(s"compact: cannot move $rootPath aside")
      }
    } // never-written store: nothing to move aside, just install tmp
    if (!hfs.rename(tmp, rootPath)) {
      hfs.rename(old, rootPath) // roll back so the store stays readable
      hfs.delete(tmp, true)
      throw new java.io.IOException(s"compact: cannot install $tmp")
    }
    hfs.delete(old, true)
  }

  /** S11: prefix scan (the etcd `get("services/", prefix)` analog,
    * /root/reference/worker/src/service_registry/etcd.rs:83-107) —
    * returns keys with the prefix stripped, like the registry does. */
  def scanPrefix(prefix: String): DataFrame =
    read()
      .filter($"key".startsWith(prefix))
      .select(
        expr(s"substring(key, ${prefix.length + 1})").as("id"),
        $"value")
}

object KvStore {
  /** Build a store from the config surface (FromConfig / F11) — the same
    * values `LocalFileKVStoreOptions` carries in the reference. */
  def apply(spark: SparkSession,
      options: graft.config.LocalKvOptions): KvStore =
    new KvStore(spark, options.rootPath, options.numBucket)

  /** Wall-clock epoch-micros, strictly increasing across calls in this
    * JVM (two put batches can land in the same microsecond otherwise) —
    * and meaningfully ordered ACROSS JVM restarts, unlike nanoTime. */
  private val lastSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  def wallClockMicros(): Long = {
    val now = java.time.Instant.now()
    val micros = now.getEpochSecond * 1000000L + now.getNano / 1000L
    lastSeq.updateAndGet(prev => math.max(prev + 1, micros))
  }

  /** Driver-side mirror of [[stableHash60]] for bucket computation. */
  def hashOf(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }
}
