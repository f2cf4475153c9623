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
}
