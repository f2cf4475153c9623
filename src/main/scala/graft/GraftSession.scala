package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * The reference (beinan/fairy) splits control plane (tokio) from data plane
  * (monoio thread-per-core) — see /root/reference/worker/src/main.rs:30-66.
  * In Spark that split is driver vs executors; all we configure here is the
  * SQL session. Tuned for local[N] testing but with settings that hold on a
  * real cluster (AQE, sensible shuffle partitions, UTC).
  */
object GraftSession {

  /** Build (or reuse) a SparkSession with graft defaults.
    *
    * @param cores parallelism for local mode; shuffle partitions follow it
    *              (on a real cluster you'd size shuffle partitions to
    *              ~2-3x total executor cores instead of the default 200).
    */
  def get(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
      // reader cannot represent natively; read as epoch-nanos BIGINT and
      // convert explicitly (Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Bounded-partial-state aggregates (SmallestKAgg & the sketch
      // family) rely on MAP-SIDE combine to keep data-quadratic streams
      // out of the shuffle. Spark's ObjectHashAggregate abandons hashing
      // after 128 distinct keys by default and SORTS the remaining input
      // — for a quadratic candidate stream that re-creates the very
      // spill the bounded buffer exists to avoid (measured: the dense
      // x1000 sampled-emission leg ENOSPC'd in exactly that sort,
      // scaleprobe-r11h2). Each entry is one grouping key + one capped
      // buffer (~300 B at k=20), so keys/task × 300 B is the real bound:
      // 2^24 keys ≈ 5 GB/task worst case, sized for this box's 96 GB
      // probe heap; on a cluster, keys per task shrink with partition
      // count while aggregate memory grows with executors.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (1 << 24).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply graft configs to an externally built session (Verify/Bench use
    * their own builder per the driver contract). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }
}
