package graft.sources

import graft.functions.VectorFunctions.{dot, norm}
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent IVF embedding index — ANN as a stored artifact, not a
  * query. The corpus is assigned once to coarse cells (deterministic
  * centroids: the first `nCells` vectors — replay-stable, no training
  * job) and written partitioned by cell id with unit-normalized vectors.
  *
  * Search ranks centroids DRIVER-side (nCells is tiny), then reads only
  * the `nProbe` matching cell partitions — partition pruning does the
  * fan-out reduction, exactly like the KV store's bucket pruning. Scoring
  * is one codegen'd dot per candidate (vectors pre-normalized at build).
  *
  * At 100 TB: the build is one pass + one shuffle on cell id; each cell
  * partition is independently splittable; search I/O is nProbe/nCells of
  * the index.
  */
class EmbeddingIndex(spark: SparkSession, indexDir: String, nCells: Int = 16) {
  import spark.implicits._

  /** One-pass index build from an (vec_id, embedding) DataFrame: store
    * unit vectors so search is one dot per candidate. */
  def build(embeddings: DataFrame): Unit = {
    EmbeddingIndex
      .assignCells(embeddings, nCells)
      .select($"vec_id", $"unit_vec", $"cell")
      .write
      .partitionBy("cell")
      .mode("overwrite")
      .parquet(indexDir)
    // a stale trained-centroid sidecar from a prior buildTrained on the
    // same dir would otherwise win over the first-k read-back and rank
    // probes against centroids that no longer match the stored cells
    val cPath = new org.apache.hadoop.fs.Path(centroidDir)
    val fs = cPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(cPath)) fs.delete(cPath, true)
  }

  /** TRAINED build: cells come from the spherical k-means loop
    * ([[graft.operators.Curation.lloydTrain]]) instead of the first-k
    * seed quantizer — better-shaped cells mean a query's true neighbors
    * concentrate in fewer cells, so the same nProbe reads buy more
    * recall (spec-asserted ≥ the seeded baseline). The trained unit
    * centroids are persisted to a `.centroids` sidecar dataset (they are
    * no longer derivable from the stored vectors), which [[search]]
    * prefers when present. Returns the per-round cohesion history. */
  def buildTrained(embeddings: DataFrame, maxRounds: Int = 8): Seq[Double] = {
    val res = graft.operators.Curation.lloydTrain(embeddings, nCells, maxRounds)
    res.assignment
      .select($"vec_id", $"unit_vec", $"cell")
      .write
      .partitionBy("cell")
      .mode("overwrite")
      .parquet(indexDir)
    res.centroids
      .select($"cell", $"cv")
      .write
      .mode("overwrite")
      .parquet(centroidDir)
    res.cohesionPerRound
  }

  /** Incremental append: assign a NEW batch of vectors to the EXISTING
    * (frozen) cells and append into the same partition layout — the
    * log-structured ingest path. A growing corpus never rebuilds the
    * index: one broadcast-assign pass over the batch (the corpus on disk
    * is not read at all) plus an append-mode write into the matching
    * cell directories, each of which stays independently splittable.
    * Centroids are read from the trained sidecar when present, else the
    * seeded first-k read-back — identical to what [[search]] probes, so
    * appended vectors land exactly where a full rebuild would put them.
    * Caller contract: batch vec_ids must be new (append is an ingest
    * primitive, not an upsert), and for a SEEDED index they must sort
    * after the first `nCells` stored ids — the seeded centroid read-back
    * is "first k by vec_id", which an id below that range would
    * displace. Trained indexes (centroid sidecar) have no id
    * constraint beyond uniqueness. */
  def append(batch: DataFrame): Unit = {
    val cdf = broadcast(
      spark.createDataFrame(centroidRows.toIndexedSeq)
        .toDF("cell", "cv"))
    val w = Window.partitionBy($"vec_id").orderBy($"cs".desc, $"cell")
    batch
      .select($"vec_id", $"embedding", norm($"embedding").as("vn"))
      .filter($"vn" =!= 0.0)
      .join(cdf, lit(true))
      .select($"vec_id", $"embedding", $"vn", $"cell",
        (dot($"embedding", $"cv") / ($"vn" * norm($"cv"))).as("cs"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select(
        $"vec_id",
        transform($"embedding", x => x / $"vn").as("unit_vec"),
        $"cell")
      .write
      .partitionBy("cell")
      .mode("append")
      .parquet(indexDir)
  }

  /** Per-cell balance report (cell, n_vecs) — the skew monitor for probe
    * cost: search I/O is proportional to the probed cells' sizes, so one
    * overweight cell quietly degrades every query that probes it.
    * Aggregate-sized (nCells rows); one scan of the index. */
  def stats(): DataFrame =
    spark.read
      .parquet(indexDir)
      .groupBy($"cell")
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy($"cell")

  private def centroidDir: String = s"$indexDir.centroids"

  /** Trained indexes read the persisted centroid sidecar; seeded legacy
    * indexes fall back to the first-nCells read-back (centroid i IS
    * stored vector i there). */
  private lazy val centroidRows: Array[(Int, Array[Double])] = {
    val cPath = new org.apache.hadoop.fs.Path(centroidDir)
    val fs = cPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(cPath))
      spark.read
        .parquet(centroidDir)
        .select($"cell", $"cv")
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    else {
      val idx = spark.read.parquet(indexDir)
      idx
        .orderBy($"vec_id")
        .limit(nCells)
        .select($"cell", $"unit_vec")
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    }
  }

  /** Top-k cosine search probing the `nProbe` nearest cells only. */
  def search(query: Array[Float], k: Int, nProbe: Int = 4): DataFrame = {
    val qUnit = EmbeddingIndex.unitQuery(query)
    val probes = EmbeddingIndex.rankProbes(centroidRows, qUnit, nProbe)
    val qCol = array(qUnit.map(v => lit(v)): _*)
    spark.read
      .parquet(indexDir)
      .filter($"cell".isin(probes.toIndexedSeq: _*)) // partition pruning
      .select($"vec_id", dot($"unit_vec", qCol).as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(k)
  }
}

object EmbeddingIndex {
  /** Cell assignment shared by both storage formats. Centroids are the
    * first `nCells` NON-zero-norm vectors — selecting before the norm
    * filter would admit a zero-norm centroid whose NaN similarity sorts
    * above everything (assigning the whole corpus to one cell) while the
    * written index dropped it, misaligning the centroid read-back.
    * Returns (vec_id, unit_vec, cell). */
  private[sources] def assignCells(embeddings: DataFrame,
      nCells: Int): DataFrame = {
    import org.apache.spark.sql.functions.col
    val nonZero = embeddings
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("vn"))
      .filter(col("vn") =!= 0.0)
    val centroids = broadcast(
      nonZero
        .orderBy(col("vec_id"))
        .limit(nCells)
        .select(col("vec_id").cast("int").as("cell"),
          col("embedding").as("cv"), col("vn").as("cn")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cs").desc, col("cell"))
    nonZero
      .join(centroids, lit(true))
      .select(col("vec_id"), col("embedding"), col("vn"), col("cell"),
        (dot(col("embedding"), col("cv")) / (col("vn") * col("cn"))).as("cs"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(
        col("vec_id"),
        transform(col("embedding"), x => x / col("vn")).as("unit_vec"),
        col("cell"))
  }

  private[sources] def unitQuery(query: Array[Float]): Array[Double] = {
    val qNorm = math.sqrt(query.map(x => x.toDouble * x).sum)
    require(qNorm > 0, "zero query vector")
    query.map(_ / qNorm)
  }

  /** Driver-side centroid ranking (nCells entries — trivially small). */
  private[sources] def rankProbes(centroids: Array[(Int, Array[Double])],
      qUnit: Array[Double], nProbe: Int): Array[Int] =
    centroids
      .map { case (cell, cv) =>
        val cn = math.sqrt(cv.map(x => x * x).sum)
        (cell, cv.zip(qUnit).map { case (a, b) => a * b }.sum / cn)
      }
      .sortBy { case (cell, cs) => (-cs, cell) }
      .take(nProbe)
      .map(_._1)
}

/** Int8-quantized variant of [[EmbeddingIndex]] — the 4× smaller storage
  * format for a 100 TB embedding store. Each row keeps the unit vector as
  * signed int8 bytes plus its per-vector scale; scoring is a codegen'd
  * int8×double dot ([[graft.plans.Int8VectorDot]]) times `scale / 127`.
  * Same cell partitioning and probe pruning as the float index; ranking
  * is approximate within the quantization error (spec-bounded recall vs
  * the float index).
  */
class QuantizedEmbeddingIndex(spark: SparkSession, indexDir: String,
    nCells: Int = 16) {
  import spark.implicits._
  import graft.plans.VectorExpressions.{int8Dot, int8Quantize}

  /** One-pass build: the shared cell assignment, storing (int8 bytes,
    * scale) instead of the unit vector. */
  def build(embeddings: DataFrame): Unit =
    EmbeddingIndex
      .assignCells(embeddings, nCells)
      .withColumn("scale", array_max(transform($"unit_vec", abs(_))))
      .select(
        $"vec_id",
        int8Quantize($"unit_vec", $"scale").as("qv"),
        $"scale",
        $"cell")
      .write
      .partitionBy("cell")
      .mode("overwrite")
      .parquet(indexDir)

  private lazy val centroidRows: Array[(Int, Array[Double])] = {
    val idx = spark.read.parquet(indexDir)
    idx
      .orderBy($"vec_id")
      .limit(nCells)
      .select($"cell", $"qv", $"scale")
      .collect()
      .map { r =>
        val scale = r.getDouble(2)
        // driver-side dequantization for probe ranking only
        (r.getInt(0), r.getAs[Array[Byte]](1).map(_ * scale / 127.0))
      }
  }

  /** Top-k approximate cosine search over the quantized cells. */
  def search(query: Array[Float], k: Int, nProbe: Int = 4): DataFrame = {
    val qUnit = EmbeddingIndex.unitQuery(query)
    val probes = EmbeddingIndex.rankProbes(centroidRows, qUnit, nProbe)
    val qCol = array(qUnit.map(v => lit(v)): _*)
    spark.read
      .parquet(indexDir)
      .filter($"cell".isin(probes.toIndexedSeq: _*)) // partition pruning
      .select($"vec_id",
        (int8Dot($"qv", qCol) * $"scale" / 127.0).as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(k)
  }
}
