package graft

import graft.operators.CorpusOps
import graft.sources.{EmbeddingIndex, ShingleIndex}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end ingest integration: the 100 TB arrival path assembled from
  * the library pieces it would actually use —
  *
  *   existing corpus  → ShingleIndex.build + EmbeddingIndex.build (once)
  *   arriving batch   → quality gate (CorpusOps.qualityScore)
  *                    → near-dup screen vs the STORED index (matchBatch,
  *                      bucket-pruned: index I/O bounded by the batch)
  *                    → survivors' embeddings appended to the ANN index
  *                      (frozen centroids, no rebuild)
  *
  * Each stage is individually gated elsewhere; this spec asserts the
  * COMPOSITION: stages agree on membership, nothing is lost or double
  * counted, and the grown index remains exactly searchable.
  */
class IngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("quality gate -> index dedup -> index append composes losslessly") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val corpus = docs.filter($"doc_id" % 2 === 0)
    val batch = docs.filter($"doc_id" % 2 === 1)

    val sDir = Files.createTempDirectory("ingest_sh").toString + "/index"
    val shingleIdx = new ShingleIndex(spark, sDir)
    shingleIdx.build(corpus)

    // stage 1: quality gate on the batch (narrow + one per-doc agg)
    val scored = CorpusOps.qualityScore(batch, "doc_id", "text")
    val kept = scored.filter($"keep" === 1).select($"doc_id")
    val keptIds = kept.as[Long].collect().toSet
    assert(keptIds.nonEmpty, "gate must pass something at fixture scale")
    assert(keptIds.size < batch.count(), "gate must also cut something")

    // stage 2: near-dup screen of the kept slice against the STORED corpus
    val dups = shingleIdx
      .matchBatch(batch.join(kept, "doc_id"))
      .select($"new_doc").as[Long].collect().toSet
    assert(dups.subsetOf(keptIds), "dedup only sees gate survivors")

    // stage 3: survivors' embeddings appended to the ANN index
    val survivors = keptIds -- dups
    assert(survivors.nonEmpty, "pipeline must admit something")
    val eDir = Files.createTempDirectory("ingest_emb").toString + "/index"
    val annIdx = new EmbeddingIndex(spark, eDir, nCells = 16)
    annIdx.build(emb.filter($"vec_id" % 2 === 0))
    val batchVecs = emb.filter($"vec_id" % 2 === 1)
      .filter($"vec_id".isin(survivors.toSeq.map(_.asInstanceOf[Any]): _*))
    val nAppend = batchVecs.count()
    annIdx.append(batchVecs)

    // composition invariants
    val stored = spark.read.parquet(eDir)
    val baseCount = emb.filter($"vec_id" % 2 === 0)
      .filter(graft.functions.VectorFunctions.norm($"embedding") =!= 0.0)
      .count()
    val appendedCount = batchVecs
      .filter(graft.functions.VectorFunctions.norm($"embedding") =!= 0.0)
      .count()
    assert(stored.count() === baseCount + appendedCount,
      "append conserved the admitted vectors")
    assert(nAppend === appendedCount,
      "no zero-norm vectors among fixture embeddings")

    // an admitted vector is immediately findable: searching its own
    // embedding with full probes returns itself at cos ~1.0
    val probe = batchVecs.orderBy($"vec_id").select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].head()
    val hit = annIdx.search(probe._2.toArray, k = 1, nProbe = 16)
      .as[(Long, Double)].head()
    assert(hit._1 === probe._1, "appended vector must be its own 1-NN")
    assert(math.abs(hit._2 - 1.0) < 1e-9, "self-similarity must be ~1")

    // a rejected duplicate is NOT in the admitted set
    dups.headOption.foreach { d => assert(!survivors.contains(d)) }
  }
}
