package graft

import graft.functions.VectorFunctions.{dot, norm}
import graft.sources.EmbeddingIndex
import org.apache.spark.sql.functions._
import java.nio.file.Files

class EmbeddingIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = Files.createTempDirectory("embidx").toString + "/index"
  private lazy val index = {
    val idx = new EmbeddingIndex(spark, dir, nCells = 16)
    idx.build(Tables.embeddings(spark, sf))
    idx
  }

  private def queryVec(id: Long): Array[Float] =
    Tables
      .embeddings(spark, sf)
      .filter($"vec_id" === id)
      .select($"embedding")
      .head()
      .getSeq[Float](0)
      .toArray

  test("index layout: one partition dir per cell, every vector assigned once") {
    index // force build
    val cells = new java.io.File(dir).listFiles
      .map(_.getName).filter(_.startsWith("cell=")).length
    assert(cells > 1 && cells <= 16, s"cells on disk: $cells")
    val idxDf = spark.read.parquet(dir)
    assert(idxDf.count() === Tables.embeddings(spark, sf).count())
    assert(idxDf.select($"vec_id").distinct().count() === idxDf.count())
  }

  test("searching a corpus vector finds itself first with cos 1.0") {
    val top = index.search(queryVec(7), k = 3).collect()
    assert(top.head.getAs[Long]("vec_id") === 7L)
    assert(math.abs(top.head.getAs[Double]("cos_sim") - 1.0) < 1e-9)
  }

  test("probing all cells equals brute-force top-k exactly") {
    val q = queryVec(5)
    val viaIndex = index
      .search(q, k = 10, nProbe = 16)
      .select($"vec_id")
      .as[Long]
      .collect()
      .toSeq
    val qCol = array(q.map(v => lit(v.toDouble / math.sqrt(q.map(x => x.toDouble * x).sum))): _*)
    val brute = Tables
      .embeddings(spark, sf)
      .select($"vec_id", (dot($"embedding", qCol) / norm($"embedding")).as("c"))
      .orderBy($"c".desc, $"vec_id")
      .limit(10)
      .select($"vec_id")
      .as[Long]
      .collect()
      .toSeq
    assert(viaIndex === brute)
  }

  test("search prunes to the probed cell partitions") {
    val df = index.search(queryVec(3), k = 5, nProbe = 2)
    df.collect()
    val scanLine = df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("FileScan")).get
    assert(scanLine.contains("PartitionFilters: [cell"), scanLine)
  }

  test("nProbe dial: recall@10 is high even at nProbe=4") {
    val q = queryVec(11)
    val pruned = index.search(q, 10, nProbe = 4).select($"vec_id").as[Long].collect().toSet
    val full = index.search(q, 10, nProbe = 16).select($"vec_id").as[Long].collect().toSet
    val recall = (pruned & full).size.toDouble / full.size
    info(s"recall@10 at nProbe=4: $recall")
    assert(recall >= 0.5)
  }

  test("Lloyd training: cohesion is monotone; trained index recall >= seeded") {
    val res = graft.operators.Curation
      .lloydTrain(Tables.embeddings(spark, sf), 16, maxRounds = 6)
    info(s"cohesion per round: ${res.cohesionPerRound.map(c => f"$c%.5f")}")
    assert(res.cohesionPerRound.nonEmpty)
    // spherical k-means: both half-steps improve the objective, so the
    // assignment-time cohesion can never decrease (fp epsilon slack)
    res.cohesionPerRound.sliding(2).foreach {
      case Seq(a, b) => assert(b >= a - 1e-9, s"cohesion fell: $a -> $b")
      case _         =>
    }
    // the trained quantizer must not LOSE recall vs the first-k seed at
    // the same probe budget (it should gain: tighter cells concentrate a
    // query's neighborhood in fewer probes)
    val tdir = Files.createTempDirectory("embidxt").toString + "/index"
    val trained = new EmbeddingIndex(spark, tdir, nCells = 16)
    trained.buildTrained(Tables.embeddings(spark, sf), maxRounds = 6)
    def avgRecall(idx: EmbeddingIndex): Double = {
      val qids = Seq(1L, 5L, 7L, 11L, 13L)
      qids.map { qid =>
        val q = queryVec(qid)
        val got =
          idx.search(q, 10, nProbe = 4).select($"vec_id").as[Long].collect().toSet
        val qn = math.sqrt(q.map(x => x.toDouble * x).sum)
        val qCol = array(q.map(v => lit(v.toDouble / qn)): _*)
        val brute = Tables
          .embeddings(spark, sf)
          .select($"vec_id", (dot($"embedding", qCol) / norm($"embedding")).as("c"))
          .orderBy($"c".desc, $"vec_id")
          .limit(10)
          .select($"vec_id")
          .as[Long]
          .collect()
          .toSet
        (got & brute).size / 10.0
      }.sum / qids.size
    }
    val seededRecall = avgRecall(index)
    val trainedRecall = avgRecall(trained)
    info(s"recall@10 nProbe=4: seeded $seededRecall, trained $trainedRecall")
    assert(trainedRecall >= seededRecall,
      s"training must not lose recall: $trainedRecall < $seededRecall")
  }

  test("seeded rebuild removes a stale trained-centroid sidecar") {
    val dir = Files.createTempDirectory("embidxs").toString + "/index"
    val idx = new EmbeddingIndex(spark, dir, nCells = 16)
    idx.buildTrained(Tables.embeddings(spark, sf), maxRounds = 2)
    assert(new java.io.File(dir + ".centroids").exists)
    // rebuilding seeded must drop the sidecar — otherwise search would
    // rank probes against centroids that no longer match the cells
    idx.build(Tables.embeddings(spark, sf))
    assert(!new java.io.File(dir + ".centroids").exists)
    val fresh = new EmbeddingIndex(spark, dir, nCells = 16)
    val top = fresh.search(queryVec(7), k = 1).collect()
    assert(top.head.getAs[Long]("vec_id") === 7L)
  }

  private lazy val qdir = Files.createTempDirectory("embidxq").toString + "/index"
  private lazy val qindex = {
    val idx = new graft.sources.QuantizedEmbeddingIndex(spark, qdir, nCells = 16)
    idx.build(Tables.embeddings(spark, sf))
    idx
  }

  test("quantized index: high recall vs the float index, bounded cos error") {
    val q = queryVec(5)
    val floatTop = index.search(q, 10, nProbe = 16)
      .select($"vec_id", $"cos_sim").as[(Long, Double)].collect()
    val quantTop = qindex.search(q, 10, nProbe = 16)
      .select($"vec_id", $"cos_sim").as[(Long, Double)].collect()
    val recall = (floatTop.map(_._1).toSet & quantTop.map(_._1).toSet).size / 10.0
    info(s"int8 recall@10 vs float index: $recall")
    assert(recall >= 0.8)
    // per-vector cos error bound: |err| <= sum_i |q_i| * (scale/254)
    // ~= dim * scale / 254; unit vectors have scale <= 1, dim 64 →
    // generous envelope 0.15, observed typically << that
    val floatByIds = floatTop.toMap
    quantTop.foreach { case (id, c) =>
      floatByIds.get(id).foreach(f => assert(math.abs(f - c) < 0.15,
        s"vec $id: float $f vs int8 $c"))
    }
  }

  test("quantized index stores ~4x smaller vector payloads") {
    qindex // force build
    def bytes(d: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles.map(walk).sum else f.length()
      walk(new java.io.File(d))
    }
    val fb = bytes(dir)
    val qb = bytes(qdir)
    info(s"float index $fb bytes, int8 index $qb bytes")
    assert(qb < fb, s"quantized index must be smaller: $qb vs $fb")
  }

  test("cell stats conserve the corpus and match the partition layout") {
    index // force build
    val st = index.stats().as[(Int, Long)].collect()
    val nonzero = Tables.embeddings(spark, sf)
      .filter(norm($"embedding") =!= 0.0).count()
    assert(st.map(_._2).sum === nonzero, "stats must cover every vector")
    val dirs = new java.io.File(dir).listFiles
      .map(_.getName).count(_.startsWith("cell="))
    assert(st.length === dirs, "one stats row per cell partition")
  }

  test("incremental append equals a full rebuild (search-identical)") {
    val emb = Tables.embeddings(spark, sf)
    val cut = 100L
    val incDir = Files.createTempDirectory("embidx_inc").toString + "/index"
    val inc = new EmbeddingIndex(spark, incDir, nCells = 16)
    inc.build(emb.filter($"vec_id" < cut))
    inc.append(emb.filter($"vec_id" >= cut))
    // same row count and same per-cell layout as the full build
    val full = spark.read.parquet(dir)
      .groupBy($"cell").count().as[(Int, Long)].collect().sortBy(_._1)
    val grown = spark.read.parquet(incDir)
      .groupBy($"cell").count().as[(Int, Long)].collect().sortBy(_._1)
    assert(grown.toSeq === full.toSeq, "cell layout diverged from rebuild")
    // search answers are identical to the rebuilt index for many queries
    for (q <- Seq(0L, 3L, 7L, 42L, 150L)) {
      val a = index.search(queryVec(q), k = 10, nProbe = 4)
        .as[(Long, Double)].collect().toSeq
      val b = inc.search(queryVec(q), k = 10, nProbe = 4)
        .as[(Long, Double)].collect().toSeq
      assert(a === b, s"query $q diverged after append")
    }
  }

  test("quantized search prunes to the probed cell partitions too") {
    val df = qindex.search(queryVec(3), k = 5, nProbe = 2)
    df.collect()
    val scanLine = df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("FileScan")).get
    assert(scanLine.contains("PartitionFilters: [cell"), scanLine)
  }

  private lazy val pqDir = Files.createTempDirectory("embidxpq").toString + "/index"
  private lazy val pqIndex = {
    val idx = new graft.sources.PqEmbeddingIndex(spark, pqDir)
    idx.build(Tables.embeddings(spark, sf))
    idx
  }

  test("stored IVF-PQ index: search is bit-identical to the q_ann_ivfpq ADC") {
    import graft.operators.Quantization
    val emb = Tables.embeddings(spark, sf)
    val adc = Quantization.ivfPqAdc(emb, nQ = 3)
    for (qid <- 0L to 2L) {
      val expect = adc
        .filter($"qid" === qid)
        .orderBy($"ad4", $"vec_id")
        .limit(10)
        .select($"vec_id", $"ad4")
        .as[(Long, Long)]
        .collect()
        .toSeq
      val got = pqIndex
        .search(queryVec(qid), k = 10)
        .select($"vec_id", $"ad4")
        .as[(Long, Long)]
        .collect()
        .toSeq
      assert(got === expect, s"query $qid diverged from the in-query recipe")
    }
  }

  test("stored IVF-PQ index: codes are M bytes per vector, corpus covered once") {
    pqIndex // force build
    val codesDf = spark.read.parquet(pqDir)
    val nonzero = Tables.embeddings(spark, sf)
      .filter(norm($"embedding") =!= 0.0).count()
    assert(codesDf.count() === nonzero)
    assert(codesDf.select($"vec_id").distinct().count() === nonzero)
    val lens = codesDf.select(size($"codes")).distinct().as[Int].collect()
    assert(lens.toSeq === Seq(graft.operators.Quantization.PqM))
    // sidecars: coarse centroids + M*K residual codebook rows
    assert(spark.read.parquet(pqDir + ".centroids").count() ===
      graft.operators.Quantization.IvfCells)
    assert(spark.read.parquet(pqDir + ".codebooks").count() ===
      graft.operators.Quantization.PqM * graft.operators.Quantization.PqK)
  }

  test("stored IVF-PQ search prunes to the probed cell partitions") {
    val df = pqIndex.search(queryVec(2), k = 5, nProbe = 2)
    df.collect()
    val scanLine = df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("FileScan")).get
    assert(scanLine.contains("PartitionFilters: [ccid"), scanLine)
  }

  test("stored IVF-PQ append equals a full rebuild (search-identical)") {
    val emb = Tables.embeddings(spark, sf)
    // seeds (coarse cells 0..15 + codebook donors 16..31) must be in the
    // base build; everything after streams in through append
    val cut = 200L
    val incDir = Files.createTempDirectory("embidxpq_inc").toString + "/index"
    val inc = new graft.sources.PqEmbeddingIndex(spark, incDir)
    inc.build(emb.filter($"vec_id" < cut))
    inc.append(emb.filter($"vec_id" >= cut))
    val full = spark.read.parquet(pqDir)
      .groupBy($"ccid").count().as[(Int, Long)].collect().sortBy(_._1)
    val grown = spark.read.parquet(incDir)
      .groupBy($"ccid").count().as[(Int, Long)].collect().sortBy(_._1)
    assert(grown.toSeq === full.toSeq, "cell layout diverged from rebuild")
    for (q <- Seq(0L, 2L, 7L, 42L, 150L, 300L)) {
      val a = pqIndex.search(queryVec(q), k = 10)
        .select($"vec_id", $"ad4").as[(Long, Long)].collect().toSeq
      val b = inc.search(queryVec(q), k = 10)
        .select($"vec_id", $"ad4").as[(Long, Long)].collect().toSeq
      assert(a === b, s"query $q diverged after append")
    }
  }
}
