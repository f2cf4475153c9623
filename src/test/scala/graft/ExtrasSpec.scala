package graft

import graft.operators.Extras
import graft.sources.KvStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct is within 5% of exact") {
    Extras.qApproxDistinct.fn(spark, sf).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"approx=$approx exact=$exact")
    }
  }

  test("salted aggregation equals the plain aggregation") {
    val plain = operators.TextOps.qTokenHistogram.fn(spark, sf)
    val salted = Extras.qSaltedHistogram.fn(spark, sf)
    assert(plain.except(salted).count() === 0)
    assert(salted.except(plain).count() === 0)
  }

  test("KV + chunking integration: chunked documents round-trip through the store") {
    val store = new KvStore(spark, Files.createTempDirectory("kvdocs").toString, 64)
    // chunk every doc payload as a streaming transfer would (S7/T1),
    // put through the chunk-reassembly path, read back and digest-check
    val chunkSize = 128
    val docs = Tables
      .documents(spark, sf)
      .filter($"doc_id" < 50)
      .select(concat(lit("doc/"), $"doc_id").as("key"),
        encode($"text", "UTF-8").as("bin"))
    val chunks = docs.select(
      $"key",
      posexplode(
        org.apache.spark.sql.functions.transform(
          sequence(lit(0),
            ceil(length($"bin") / lit(chunkSize.toDouble)).cast("int") - 1),
          i => $"bin".substr(i * chunkSize + 1, lit(chunkSize))))
        .as(Seq("chunk_id", "chunk")))
    store.putChunked(chunks)
    val roundtrip = store
      .read()
      .select($"key", md5($"value").as("got"))
    val expected = docs.select($"key", md5($"bin").as("want"))
    val joined = roundtrip.join(expected, "key")
    assert(joined.count() === 50)
    assert(joined.filter($"got" =!= $"want").count() === 0)
  }
}
