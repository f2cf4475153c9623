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
