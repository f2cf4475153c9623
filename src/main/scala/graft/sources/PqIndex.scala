package graft.sources

import graft.operators.Quantization
import graft.operators.Quantization.{IvfCells, IvfProbes, PqK, PqM, PqSubDim}
import graft.plans.VectorExpressions.pqAdc
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent IVF-PQ index — the q_ann_ivfpq recipe as a stored artifact
  * an ingest pipeline can append to, instead of an in-query computation.
  * Shares its building blocks with the oracle-gated query
  * ([[graft.operators.Quantization]]), so the stored index and the
  * hash-verified query are one implementation (spec-gated: stored-index
  * search returns the exact ADC rows `ivfPqAdc` produces).
  *
  * Layout:
  * {{{
  *   indexDir/            (vec_id, codes ARRAY<TINYINT>[M]) partitioned by ccid
  *   indexDir.centroids/  (ccid, cv ARRAY<DOUBLE>)   — coarse quantizer
  *   indexDir.codebooks/  (cid, s, cbv ARRAY<DOUBLE>) — residual codebooks
  * }}}
  *
  * At 100 TB the codes table IS the resident index: M one-byte codes per
  * vector (32× smaller than the float vectors, which stay in cold storage
  * for optional re-ranking). Search ranks centroids DRIVER-side (IvfCells
  * rows), builds the per-probe lookup tables DRIVER-side (M·K longs each
  * — the codebooks are M·K rows total), then reads ONLY the probed cell
  * partitions and scores each candidate with one codegen'd
  * [[graft.plans.PqAdcSum]] (M integer loads + adds). Nothing corpus-sized
  * shuffles: the only exchange is the top-k.
  *
  * Append assigns a new batch against the FROZEN sidecars (centroids +
  * codebooks read from disk, broadcast) and appends into the matching cell
  * directories — the corpus on disk is never re-read, and appended vectors
  * land exactly where a full rebuild would put them (spec-gated).
  */
class PqEmbeddingIndex(spark: SparkSession, indexDir: String) {
  import spark.implicits._

  private def centroidDir: String = s"$indexDir.centroids"
  private def codebookDir: String = s"$indexDir.codebooks"

  /** One-pass build from an (vec_id, embedding) DataFrame: seed the coarse
    * quantizer and residual codebooks (replay-stable first-k recipe),
    * code every vector, persist codes + both sidecars. Zero-norm vectors
    * are dropped (they have no cosine cell affinity — the annIvfPairs
    * convention). */
  def build(embeddings: DataFrame): Unit = {
    val cc = Quantization.seedCoarse(embeddings)
    cc.select($"ccid", transform($"cv", _.cast("double")).as("cv"))
      .coalesce(1)
      .write.mode("overwrite").parquet(centroidDir)
    val rsv = Quantization.residualSub(
      Quantization.residualAssign(Quantization.coarseScored(embeddings, cc)))
    val cb = Quantization.residualCodebook(rsv)
    cb.coalesce(1).write.mode("overwrite").parquet(codebookDir)
    writeCodes(rsv, cb, "overwrite")
  }

  /** Incremental append: code a NEW batch against the frozen sidecars and
    * append into the same cell partitions. Caller contract: batch vec_ids
    * must be new (ingest primitive, not an upsert). */
  def append(batch: DataFrame): Unit = {
    val cc = spark.read.parquet(centroidDir)
      .select($"ccid", $"cv",
        graft.functions.VectorFunctions.norm($"cv").as("cn"))
    val cb = spark.read.parquet(codebookDir)
    val rsv = Quantization.residualSub(
      Quantization.residualAssign(Quantization.coarseScored(batch, cc)))
    writeCodes(rsv, cb, "append")
  }

  /** Pack the per-subspace code assignments into one M-byte row per vector
    * (sorted by subspace id — subspace-major, matching the LUT layout). */
  private def writeCodes(rsv: DataFrame, cb: DataFrame, mode: String): Unit =
    Quantization.codeAgainst(rsv, cb)
      .groupBy($"vec_id", $"ccid")
      .agg(transform(array_sort(collect_list(struct($"s", $"cid"))),
        x => x.getField("cid").cast("byte")).as("codes"))
      .write.partitionBy("ccid").mode(mode).parquet(indexDir)

  /** Per-cell balance report (ccid, n_vecs) — probe-cost skew monitor. */
  def stats(): DataFrame =
    spark.read.parquet(indexDir)
      .groupBy($"ccid")
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy($"ccid")

  /** Coarse centroids, driver-side (IvfCells rows — trivially small). */
  private lazy val centroidRows: Array[(Int, Array[Double])] =
    spark.read.parquet(centroidDir)
      .select($"ccid", $"cv")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))

  /** Residual codebooks, driver-side (M·K rows). */
  private lazy val codebookRows: Array[(Int, Int, Array[Double])] =
    spark.read.parquet(codebookDir)
      .select($"cid", $"s", $"cbv")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))

  /** Top-k ADC search probing the `nProbe` best cells only. Returns
    * (vec_id, ad4, adist): ad4 is the integer ADC sum (1e-4 squared-L2
    * units — exactly what `ivfPqAdc` computes), adist the real-valued
    * approximate distance. All driver-side arithmetic below mirrors the
    * engine expressions operation-for-operation (sequential double
    * accumulation, floor(x·10⁴ + 0.5) quantization) so stored-index
    * results are bit-identical to the in-query recipe. */
  def search(query: Array[Float], k: Int, nProbe: Int = IvfProbes): DataFrame = {
    val qd = query.map(_.toDouble)
    var qn2 = 0.0
    var i = 0
    while (i < qd.length) { qn2 += qd(i) * qd(i); i += 1 }
    val qn = math.sqrt(qn2)
    val probes = centroidRows
      .flatMap { case (ccid, cv) =>
        var cn2 = 0.0
        var d = 0.0
        var j = 0
        while (j < cv.length) { cn2 += cv(j) * cv(j); d += qd(j) * cv(j); j += 1 }
        val denom = qn * math.sqrt(cn2)
        if (denom == 0.0) None
        else Some((ccid, cv,
          math.floor(d / denom * 10000.0 + 0.5).toLong))
      }
      .sortBy { case (ccid, _, cs4) => (-cs4, ccid) }
      .take(nProbe)
    val luts = probes.map { case (ccid, cv, _) =>
      val qr = Array.tabulate(PqM * PqSubDim)(i => qd(i) - cv(i))
      val lut = new Array[Long](PqM * PqK)
      codebookRows.foreach { case (cid, s, cbv) =>
        var d = 0.0
        var j = 0
        while (j < PqSubDim) {
          val t = qr(s * PqSubDim + j) - cbv(j)
          d += t * t
          j += 1
        }
        lut(s * PqK + cid) = math.floor(d * 10000.0 + 0.5).toLong
      }
      (ccid, lut)
    }
    val lutDf = broadcast(
      spark.createDataFrame(luts.toIndexedSeq).toDF("ccid", "lut"))
    spark.read.parquet(indexDir)
      .filter($"ccid".isin(probes.map(_._1).toIndexedSeq: _*)) // partition pruning
      .join(lutDf, "ccid")
      .select($"vec_id", pqAdc($"codes", $"lut").as("ad4"))
      .withColumn("adist", $"ad4" / 10000.0)
      .orderBy($"ad4", $"vec_id")
      .limit(k)
  }
}
