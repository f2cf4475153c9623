package graft

import graft.sources.KvStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

class KvStoreSpec extends SparkSpec {
  import spark.implicits._

  // scheme-qualified `file:` URI so every test exercises the Hadoop
  // FileSystem resolution path (the same code path an hdfs:/s3a: root
  // would take), not implicit local-path handling
  private def freshStore(buckets: Int = 64): KvStore =
    new KvStore(
      spark,
      "file:" + Files.createTempDirectory("kvstore").toString,
      buckets)

  test("put then get returns the exact bytes (identity round-trip)") {
    val store = freshStore()
    val payload = Array.tabulate[Byte](300)(i => (i % 251).toByte)
    store.put(Seq(("k1", payload), ("k2", Array[Byte](0, -1, 127))).toDF("key", "value"))
    assert(store.get("k1").get.toSeq === payload.toSeq)
    assert(store.get("k2").get.toSeq === Seq[Byte](0, -1, 127))
    assert(store.get("absent").isEmpty)
  }

  test("overwrite: last put wins (reference put is create-or-overwrite)") {
    val store = freshStore()
    store.put(Seq(("k", "v1".getBytes)).toDF("key", "value"))
    store.put(Seq(("k", "v2".getBytes)).toDF("key", "value"))
    assert(new String(store.get("k").get) === "v2")
    assert(store.read().filter($"key" === "k").count() === 1)
  }

  test("bucket layout matches hash placement and prunes on point get") {
    val store = freshStore(buckets = 8)
    val keys = (0 until 50).map(i => (s"key$i", s"val$i".getBytes))
    store.put(keys.toDF("key", "value"))
    val placed = store.read().select($"key", $"bucket").as[(String, Int)].collect()
    placed.foreach { case (k, b) =>
      assert(b === math.floorMod(KvStore.hashOf(k), 8L).toInt)
    }
    assert(placed.map(_._2).distinct.length > 1, "keys should spread over buckets")
  }

  test("chunked put reassembles ALL chunks (reference h2 put bug fixed)") {
    val store = freshStore()
    // 3 chunks out of order — the reference would have stored only chunk 0
    val chunks = Seq(
      ("big", 2, "CCC".getBytes),
      ("big", 0, "AAA".getBytes),
      ("big", 1, "BBB".getBytes)).toDF("key", "chunk_id", "chunk")
    store.putChunked(chunks)
    assert(new String(store.get("big").get) === "AAABBBCCC")
  }

  test("compaction drops superseded versions but keeps latest values") {
    val store = freshStore()
    store.put(Seq(("a", "v1".getBytes), ("b", "b1".getBytes)).toDF("key", "value"))
    store.put(Seq(("a", "v2".getBytes)).toDF("key", "value"))
    store.put(Seq(("a", "v3".getBytes)).toDF("key", "value"))
    val rawBefore = spark.read.parquet(store.root).count()
    assert(rawBefore === 4, "3 versions of a + 1 of b before compaction")
    store.compact()
    val rawAfter = spark.read.parquet(store.root).count()
    assert(rawAfter === 2, "one row per live key after compaction")
    assert(new String(store.get("a").get) === "v3")
    assert(new String(store.get("b").get) === "b1")
  }

  test("compaction of a never-written store installs an empty snapshot") {
    val store = freshStore()
    store.compact() // must not throw, must leave a readable store
    assert(store.read().count() === 0)
    store.put(Seq(("k", "v".getBytes)).toDF("key", "value"))
    assert(new String(store.get("k").get) === "v")
  }

  test("config-driven construction uses LocalKvOptions values") {
    val dir = "file:" + Files.createTempDirectory("kvopts").toString
    val store = sources.KvStore(spark, graft.config.LocalKvOptions(
      rootPath = dir, numBucket = 8, chunkSize = 128))
    store.put(Seq(("k1", "v".getBytes)).toDF("key", "value"))
    val bucket = store.read().select($"bucket").head().getInt(0)
    assert(bucket === math.floorMod(KvStore.hashOf("k1"), 8L).toInt)
  }

  test("prefix scan strips the prefix like the etcd registry") {
    val store = freshStore()
    store.put(Seq(
      ("services/10.0.0.1:8080", Array[Byte](1)),
      ("services/10.0.0.2:8080", Array[Byte](1)),
      ("other/x", Array[Byte](1))).toDF("key", "value"))
    val ids = store.scanPrefix("services/").select($"id").as[String].collect().sorted
    assert(ids.toSeq === Seq("10.0.0.1:8080", "10.0.0.2:8080"))
  }
}
