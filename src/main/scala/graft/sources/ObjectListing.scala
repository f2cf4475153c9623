package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S5: object-store listing as a DataFrame — the reference's
  * `list_objects(client, bucket)` prints each key + size
  * (/root/reference/client/src/ufs/mod.rs:11-34, list_objects_v2); here
  * the listing IS a relation, so it composes with filters/joins/aggs.
  *
  * Resolved through the Hadoop FileSystem like every other store path, so
  * the same call lists file:, hdfs:, or s3a: roots. The enumeration runs
  * on the driver (one RPC per page, same as the reference's paginated
  * list_objects_v2 loop) — the METADATA is small even when the data is
  * 100 TB; downstream processing of the listed objects is distributed.
  */
object ObjectListing {

  /** List objects under `root` (recursive), as (key, size, mtime_ms).
    * Keys are relative to the root, '/'-separated — bucket-key style. */
  def list(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = fs.getFileStatus(rootPath).getPath.toUri.getPath
    val it = fs.listFiles(rootPath, true)
    val rows = Iterator
      .continually(it)
      .takeWhile(_.hasNext)
      .map(_.next())
      .map { st =>
        val full = st.getPath.toUri.getPath
        val key = full.stripPrefix(base).stripPrefix("/")
        (key, st.getLen, st.getModificationTime)
      }
      .toSeq
    rows.toDF("key", "size", "mtime_ms")
  }
}
