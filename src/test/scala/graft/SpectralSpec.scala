package graft

import graft.operators.Spectral
import graft.plans.CovarianceAgg
import org.apache.spark.sql.functions._

/** Spectral family: one-pass covariance aggregate (third-engine parity,
  * partition invariance), Jacobi eigendecomposition laws, PCA projection
  * semantics, and plan shape.
  */
class SpectralSpec extends SparkSpec {
  import spark.implicits._

  private val dim = Spectral.Dim

  private lazy val emb = Tables.embeddings(spark, sf)

  /** Plain-Scala two-pass covariance over the collected fixture — the
    * independent third engine the suite uses for non-SQL math. */
  private lazy val (refN, refMean, refCov): (Long, Array[Double], Array[Array[Double]]) = {
    val vecs = emb
      .filter($"embedding".isNotNull && size($"embedding") === dim)
      .select($"embedding")
      .as[Seq[Float]]
      .collect()
      .map(_.map(_.toDouble).toArray)
    val n = vecs.length.toLong
    val mean = Array.tabulate(dim)(i => vecs.map(_(i)).sum / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
    }
    (n, mean, cov)
  }

  test("covariance moments match a plain-Scala two-pass computation") {
    val (n, mean, cov) = Spectral.covarianceMatrix(emb)
    assert(n === refN)
    for (i <- 0 until dim)
      assert(math.abs(mean(i) - refMean(i)) < 1e-9, s"mean($i)")
    for (i <- 0 until dim; j <- 0 until dim)
      assert(math.abs(cov(i)(j) - refCov(i)(j)) < 1e-8, s"cov($i,$j)")
  }

  test("moment aggregate is partition-invariant and skips malformed rows") {
    val base = emb.select($"embedding")
    val poisoned = base
      .unionAll(Seq(Seq(1.0f, 2.0f)).toDF("embedding")) // wrong length
      .unionAll(Seq(Option.empty[Seq[Float]]).toDF("embedding")) // null
    val one = Spectral.moments(poisoned.repartition(1))
      .head().getSeq[Double](0)
    val many = Spectral.moments(poisoned.repartition(7))
      .head().getSeq[Double](0)
    assert(one.length === many.length)
    assert(one.head === refN.toDouble) // poison rows never accumulated
    one.zip(many).zipWithIndex.foreach { case ((a, b), k) =>
      assert(math.abs(a - b) <= 1e-7 * math.max(1.0, math.abs(a)), s"idx $k")
    }
  }

  test("momentIndex maps the upper triangle without collisions") {
    val seen = collection.mutable.Set[Int]()
    for (i <- 0 until dim; j <- i until dim) {
      val t = CovarianceAgg.momentIndex(dim, i, j)
      assert(t >= 1 + dim && t < 1 + dim + dim * (dim + 1) / 2)
      assert(seen.add(t), s"collision at ($i,$j)")
    }
    assert(seen.size === dim * (dim + 1) / 2)
  }

  test("jacobi eigen reconstructs a hand matrix with orthonormal axes") {
    // symmetric 4x4 with known-distinct eigenvalues
    val a = Array(
      Array(4.0, 1.0, 0.5, 0.0),
      Array(1.0, 3.0, 0.0, 0.2),
      Array(0.5, 0.0, 2.0, 0.1),
      Array(0.0, 0.2, 0.1, 1.0))
    val basis = Spectral.jacobiEigen(a)
    val d = 4
    // descending eigenvalues
    assert(basis.values.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    // orthonormality of the axes
    for (p <- 0 until d; q <- 0 until d) {
      val dot = (0 until d).map(i => basis.vectors(p)(i) * basis.vectors(q)(i)).sum
      val want = if (p == q) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"axis dot ($p,$q)")
    }
    // A == V^T diag(values) V (vectors are rows here)
    for (i <- 0 until d; j <- 0 until d) {
      val recon = (0 until d)
        .map(k => basis.vectors(k)(i) * basis.values(k) * basis.vectors(k)(j))
        .sum
      assert(math.abs(recon - a(i)(j)) < 1e-9, s"recon ($i,$j)")
    }
  }

  test("pca projection: component variances equal eigenvalues, decorrelated") {
    val (mean, basis) = Spectral.pcaTrain(emb)
    val k = 4
    val proj = Spectral.pcaProject(emb, mean, basis, k)
    val rows = proj
      .select((0 until k).map(c => col(s"p$c")): _*)
      .as[(Double, Double, Double, Double)]
      .collect()
      .map(t => Array(t._1, t._2, t._3, t._4))
    val n = rows.length
    for (c <- 0 until k) {
      val xs = rows.map(_(c))
      val m = xs.sum / n
      assert(math.abs(m) < 1e-6, s"projected mean p$c should be ~0")
      val v = xs.map(x => (x - m) * (x - m)).sum / n
      val rel = math.abs(v - basis.values(c)) / math.max(basis.values(c), 1e-12)
      assert(rel < 1e-6, s"var(p$c)=$v vs eigenvalue ${basis.values(c)}")
    }
    // distinct components are uncorrelated
    for (c1 <- 0 until k; c2 <- c1 + 1 until k) {
      val cov = rows.map(r => r(c1) * r(c2)).sum / n -
        (rows.map(_(c1)).sum / n) * (rows.map(_(c2)).sum / n)
      assert(math.abs(cov) < 1e-6, s"cov(p$c1,p$c2)=$cov")
    }
    // top-k explains monotonically more variance as k grows
    assert(basis.values.take(8).sum <= basis.values.take(16).sum + 1e-12)
  }

  test("pca projection plan is one narrow pass — no exchange, no join") {
    val (mean, basis) = Spectral.pcaTrain(emb)
    val plan = Spectral.pcaProject(emb, mean, basis, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection should not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"projection should not join:\n$plan")
  }

  test("covariance sketch works as a streaming aggregate (batch parity)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vecs = emb.select($"embedding").as[Seq[Float]].collect().toSeq
    val input = MemoryStream[Seq[Float]]
    input.addData(vecs)
    val q = input.toDF().withColumnRenamed("value", "embedding")
      .agg(graft.plans.CovarianceAgg.covMoments($"embedding", dim).as("m"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("cov_stream").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cov_stream").head().getSeq[Double](0)
    val batch = Spectral.moments(emb).head().getSeq[Double](0)
    assert(streamed.length === batch.length)
    streamed.zip(batch).zipWithIndex.foreach { case ((a, b), k) =>
      assert(math.abs(a - b) <= 1e-7 * math.max(1.0, math.abs(b)), s"idx $k")
    }
  }

  test("cov_moments is reachable from the SQL plane") {
    graft.plans.GraftExtensions.register(spark)
    emb.createOrReplaceTempView("spectral_emb")
    val viaSql = spark
      .sql(s"SELECT cov_moments(embedding, $dim) AS m FROM spectral_emb")
      .head().getSeq[Double](0)
    val viaApi = Spectral.moments(emb).head().getSeq[Double](0)
    assert(viaSql.length === viaApi.length)
    viaSql.zip(viaApi).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-7 * math.max(1.0, math.abs(b)))
    }
  }

  test("typed VecCentroid aggregator matches column-arithmetic centroids") {
    import graft.operators.Spectral.LabeledVec
    val typed = Spectral.qLabelCentroids.fn(spark, sf)
      .as[(Int, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val direct = emb
      .filter($"embedding".isNotNull && size($"embedding") === dim)
      .groupBy($"label")
      .agg(count(lit(1)).as("n"),
        (0 until 4).map(i =>
          round(avg(element_at($"embedding", i + 1)), 6).as(s"c$i")): _*)
      .as[(Int, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(typed.keySet === direct.keySet)
    typed.foreach { case (k, t) =>
      val d0 = direct(k)
      assert(t._2 === d0._2, s"n for label $k")
      Seq(t._3 -> d0._3, t._4 -> d0._4, t._5 -> d0._5, t._6 -> d0._6)
        .foreach { case (a, b) => assert(math.abs(a - b) <= 1e-6, s"label $k") }
    }
    // partition invariance of the typed merge path
    val one = Tables.embeddings(spark, sf).repartition(1).as[LabeledVec]
      .groupByKey(_.label)
      .agg(new graft.functions.TypedAggregators
        .VecCentroid[LabeledVec](dim, _.embedding).toColumn)
      .collect().map(r => r._1 -> r._2.toSeq).toMap
    val many = Tables.embeddings(spark, sf).repartition(7).as[LabeledVec]
      .groupByKey(_.label)
      .agg(new graft.functions.TypedAggregators
        .VecCentroid[LabeledVec](dim, _.embedding).toColumn)
      .collect().map(r => r._1 -> r._2.toSeq).toMap
    one.foreach { case (k, v) =>
      v.zip(many(k)).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(a)))
      }
    }
  }

  test("space-saving heavy hitters work as a streaming aggregate (batch parity)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val toks = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.words($"text")).as("w"))
      .as[String].collect().toSeq
    val input = MemoryStream[String]
    input.addData(toks)
    val q = input.toDF().withColumnRenamed("value", "w")
      .agg(graft.plans.SpaceSavingAgg.spaceSavingTopK($"w", 64).as("top"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("ss_stream").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ss_stream").head().get(0)
    val batch = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.words($"text")).as("w"))
      .agg(graft.plans.SpaceSavingAgg.spaceSavingTopK($"w", 64).as("top"))
      .head().get(0)
    assert(streamed === batch,
      "the mergeable sketch must be batch/stream identical")
  }

  test("q_embed_covariance rows agree with the reference matrix") {
    val rows = Spectral.qEmbedCovariance
      .fn(spark, sf)
      .as[(Long, Long, Double)]
      .collect()
    assert(rows.length === 36) // upper triangle of 8x8
    rows.foreach { case (i, j, c) =>
      val want = math.rint(refCov(i.toInt)(j.toInt) * 1e6) / 1e6
      assert(math.abs(c - want) <= 1e-6, s"cov($i,$j)")
    }
  }
}
