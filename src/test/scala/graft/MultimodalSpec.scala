package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media feature extraction has the contract schema") {
    val df = Multimodal.qMediaFeatures.fn(spark, sf)
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(fields("doc_id") === LongType)
    assert(fields("n_bytes") === IntegerType)
    assert(fields("n_frames") === IntegerType)
    assert(fields("checksum") === LongType)
    assert(fields("features_csv") === StringType)
  }

  test("feature extraction is deterministic and consistent with payload size") {
    val rows = Multimodal.qMediaFeatures
      .fn(spark, sf)
      .filter($"doc_id" < 5)
      .collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val nBytes = r.getAs[Int]("n_bytes")
      val nFrames = r.getAs[Int]("n_frames")
      assert(nFrames === (nBytes + 31) / 32)
      assert(r.getAs[String]("features_csv").split(',').length === math.min(nFrames, 8))
    }
    // determinism: run twice, same checksums
    val again = Multimodal.qMediaFeatures
      .fn(spark, sf)
      .filter($"doc_id" < 5)
      .collect()
    assert(
      rows.map(_.getAs[Long]("checksum")).toSeq ===
        again.map(_.getAs[Long]("checksum")).toSeq)
  }

  test("fixture payloads are ASCII: byte length == char length == n_chars") {
    // qMediaSegments' DuckDB oracle windows the text with substr/ord
    // (codepoint) arithmetic while the Spark side windows the UTF-8
    // BYTE payload; the two agree iff the corpus is ASCII. Pin that
    // assumption here so a non-ASCII testdata generation fails THIS
    // spec loudly instead of silently hash-mismatching the oracle row.
    val offenders = Tables
      .documents(spark, sf)
      .filter(octet_length($"text") =!= length($"text") ||
        $"n_chars" =!= length($"text"))
      .count()
    assert(offenders === 0L)
  }

  test("chunk roundtrip digest equals direct md5 of the text") {
    val direct = Tables
      .documents(spark, sf)
      .select($"doc_id", md5(encode($"text", "UTF-8")).as("digest"))
    val viaChunks = Multimodal.qBinaryRoundtrip.fn(spark, sf)
    assert(viaChunks.except(direct).count() === 0)
    assert(direct.except(viaChunks).count() === 0)
  }
}
