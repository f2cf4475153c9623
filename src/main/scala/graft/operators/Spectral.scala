package graft.operators

import graft.{QueryDef, Tables}
import graft.plans.CovarianceAgg
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spectral decomposition over the embedding corpus: one-pass covariance
  * (via [[graft.plans.CovarianceAgg]]), principal components by
  * driver-side Jacobi eigendecomposition of the aggregate-sized d×d
  * matrix, and corpus projection onto the learned basis — the classical
  * (data-dependent) counterpart to `q_embed_project`'s data-oblivious
  * Johnson–Lindenstrauss reduction.
  *
  * Scale design (100 TB): the ONLY corpus-scale operation is the moment
  * aggregate — a single scan shipping one ~17 KiB buffer per partition
  * (never the d² row blowup a self-join/explode formulation pays). The
  * d×d eigenproblem is O(d³) driver arithmetic on a 64×64 matrix —
  * microseconds, corpus-size-independent — and the projection folds the
  * eigenvector matrix into the plan as literals exactly like the JL sign
  * matrix, one narrow codegen pass.
  */
object Spectral {

  val Dim = 64

  /** Covariance matrix audit — the upper triangle of the first 8×8 block
    * of the embedding covariance (population form E[xy] − E[x]E[y]),
    * derived from the one-pass moment aggregate. The oracle recomputes
    * each entry directly from the vectors; 6-decimal rounding absorbs
    * summation-order ulps per the aggregate-rounding convention. */
  val qEmbedCovariance = QueryDef.sql(
    "q_embed_covariance",
    """WITH grid AS (
      |  SELECT ii.i AS i, jj.j AS j
      |  FROM (SELECT unnest(range(8)) AS i) ii
      |  CROSS JOIN (SELECT unnest(range(8)) AS j) jj
      |  WHERE ii.i <= jj.j),
      |v AS (SELECT embedding FROM embeddings
      |      WHERE embedding IS NOT NULL AND len(embedding) = 64)
      |SELECT i, j,
      |       round(avg(embedding[CAST(i + 1 AS INT)] * embedding[CAST(j + 1 AS INT)])
      |             - avg(embedding[CAST(i + 1 AS INT)])
      |               * avg(embedding[CAST(j + 1 AS INT)]), 6) + 0.0 AS cov
      |FROM v CROSS JOIN grid
      |GROUP BY i, j
      |ORDER BY i, j""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val m = moments(Tables.embeddings(s, d))
    val grid = (for { i <- 0 until 8; j <- i until 8 } yield (i, j))
      .map { case (i, j) => struct(lit(i.toLong).as("i"), lit(j.toLong).as("j")) }
    m.select($"m", explode(array(grid: _*)).as("g"))
      .select($"g.i".as("i"), $"g.j".as("j"),
        (round(covFromMoments($"m", $"g.i", $"g.j"), 6) + 0.0).as("cov"))
      .orderBy($"i", $"j")
  }

  /** Top-10 most correlated embedding-dimension pairs — the redundancy
    * audit read before PCA/PQ subspace splits: all 2016 upper-triangle
    * correlations derived from the SAME one-pass moment aggregate as
    * [[qEmbedCovariance]] (corr = cov_ij/√(cov_ii·cov_jj); population
    * vs sample normalization cancels in the ratio, so the oracle's
    * corr() matches), ranked by |corr| with (i, j) tie-break.
    *
    * Scale: one corpus scan into the fixed-width moment buffer; the
    * 2016-pair grid is a literal exploded over the one-row relation. */
  val qEmbedCorrPairs = QueryDef.sql(
    "q_embed_corr_pairs",
    """WITH grid AS (
      |  SELECT ii.i AS i, jj.j AS j
      |  FROM (SELECT unnest(range(64)) AS i) ii
      |  CROSS JOIN (SELECT unnest(range(64)) AS j) jj
      |  WHERE ii.i < jj.j),
      |v AS (SELECT embedding FROM embeddings
      |      WHERE embedding IS NOT NULL AND len(embedding) = 64),
      |c AS (
      |  SELECT i, j,
      |         corr(embedding[CAST(i + 1 AS INT)],
      |              embedding[CAST(j + 1 AS INT)]) AS r
      |  FROM v CROSS JOIN grid GROUP BY i, j)
      |SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
      |       round(r, 4) + 0.0 AS corr,
      |       CAST(row_number() OVER (ORDER BY round(abs(r), 4) DESC, i, j)
      |            AS INT) AS rank
      |FROM c QUALIFY rank <= 10 ORDER BY rank""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val m = moments(Tables.embeddings(s, d))
    val grid = (for { i <- 0 until Dim; j <- (i + 1) until Dim }
      yield (i, j))
      .map { case (i, j) =>
        struct(lit(i.toLong).as("i"), lit(j.toLong).as("j"))
      }
    val c = m
      .select($"m", explode(array(grid: _*)).as("g"))
      .select($"g.i".as("i"), $"g.j".as("j"),
        (covFromMoments($"m", $"g.i", $"g.j") /
          sqrt(covFromMoments($"m", $"g.i", $"g.i") *
            covFromMoments($"m", $"g.j", $"g.j"))).as("r"))
    val top = c.orderBy(round(abs($"r"), 4).desc, $"i", $"j").limit(10)
    CorpusOps
      .boundedRank(top,
        struct((-round(abs($"r"), 4)).as("nr"), $"i", $"j"), "rank")
      .select($"i".cast("int").as("i"), $"j".cast("int").as("j"),
        (round($"r", 4) + 0.0).as("corr"), $"rank")
      .orderBy($"rank")
  }

  /** One-row moments relation over the (length-guarded) embedding scan. */
  def moments(emb: DataFrame): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    emb.agg(CovarianceAgg.covMoments($"embedding", Dim).as("m"))
  }

  /** cov(i,j) from the flattened moments array (population covariance).
    * Index arithmetic mirrors [[CovarianceAgg.momentIndex]] but in
    * Column form so i/j can be data (the audit grid). */
  private def covFromMoments(m: Column, i: Column, j: Column): Column = {
    val n = element_at(m, 1)
    val sumI = element_at(m, (i + lit(2)).cast("int"))
    val sumJ = element_at(m, (j + lit(2)).cast("int"))
    val tri = i * lit(Dim) - i * (i - lit(1)) / lit(2) + (j - i)
    val prod = element_at(m, (tri + lit(2 + Dim)).cast("int"))
    prod / n - (sumI / n) * (sumJ / n)
  }

  /** Eigendecomposition result: values descending, vectors row-major
    * (vectors(k) is the k-th principal axis), sign-fixed so the
    * largest-magnitude component of each axis is positive. */
  final case class EigenBasis(values: Array[Double], vectors: Array[Array[Double]])

  /** Cyclic Jacobi eigendecomposition of the symmetric d×d matrix —
    * deterministic (fixed sweep order, fixed convergence threshold), so
    * the same corpus yields the bit-identical basis on every run.
    * O(d³) per sweep; converges in ~log(d) sweeps for well-conditioned
    * covariance matrices. Driver-side by design: the input is the
    * AGGREGATE, not the corpus. */
  def jacobiEigen(a0: Array[Array[Double]]): EigenBasis = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-15) rotate(a, v, p, q)
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { k =>
      val col = Array.tabulate(d)(i => v(i)(k))
      // sign convention: largest-|component| positive (ties → first index)
      var mi = 0
      var i = 1
      while (i < d) { if (math.abs(col(i)) > math.abs(col(mi))) mi = i; i += 1 }
      if (col(mi) < 0) col.map(x => -x) else col
    }.toArray
    EigenBasis(values, vectors)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  private def rotate(
      a: Array[Array[Double]], v: Array[Array[Double]], p: Int, q: Int): Unit = {
    val d = a.length
    val apq = a(p)(q)
    val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
    val t = {
      val s = math.signum(theta) match { case 0.0 => 1.0; case x => x }
      s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
    }
    val c = 1.0 / math.sqrt(t * t + 1.0)
    val sn = t * c
    var k = 0
    while (k < d) {
      val akp = a(k)(p); val akq = a(k)(q)
      a(k)(p) = c * akp - sn * akq
      a(k)(q) = sn * akp + c * akq
      k += 1
    }
    k = 0
    while (k < d) {
      val apk = a(p)(k); val aqk = a(q)(k)
      a(p)(k) = c * apk - sn * aqk
      a(q)(k) = sn * apk + c * aqk
      k += 1
    }
    k = 0
    while (k < d) {
      val vkp = v(k)(p); val vkq = v(k)(q)
      v(k)(p) = c * vkp - sn * vkq
      v(k)(q) = sn * vkp + c * vkq
      k += 1
    }
  }

  /** Covariance matrix + mean from the collected one-row moments
    * relation (an aggregate-sized driver fetch, like the IVF centroid
    * reads — never corpus rows). */
  def covarianceMatrix(emb: DataFrame): (Long, Array[Double], Array[Array[Double]]) = {
    val m = moments(emb).head().getSeq[Double](0).toArray
    val n = m(0)
    // an empty (or all-malformed) corpus has no covariance — fail loudly
    // instead of silently propagating NaN into the eigenproblem
    require(n > 0, "covarianceMatrix: no valid vectors in the corpus")
    val mean = Array.tabulate(Dim)(i => m(1 + i) / n)
    val cov = Array.ofDim[Double](Dim, Dim)
    for (i <- 0 until Dim; j <- i until Dim) {
      val prod = m(CovarianceAgg.momentIndex(Dim, i, j))
      val c = prod / n - mean(i) * mean(j)
      cov(i)(j) = c
      cov(j)(i) = c
    }
    (n.toLong, mean, cov)
  }

  /** Train a PCA basis from the corpus: one moment scan + driver Jacobi. */
  def pcaTrain(emb: DataFrame): (Array[Double], EigenBasis) = {
    val (_, mean, cov) = covarianceMatrix(emb)
    (mean, jacobiEigen(cov))
  }

  /** Project the corpus onto the top-k principal axes. The mean and the
    * k×d eigenvector matrix enter the plan as LITERALS (the JL
    * `q_embed_project` recipe), so the projection is one narrow
    * codegen pass over the scan — no join, no shuffle, no model
    * relation. Output: (vec_id, label, p0 … p{k-1}). */
  def pcaProject(
      emb: DataFrame, mean: Array[Double], basis: EigenBasis, k: Int): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    require(k >= 1 && k <= basis.vectors.length)
    val comps = (0 until k).map { c =>
      val axis = basis.vectors(c)
      val terms = (0 until Dim).map { i =>
        (element_at($"embedding", i + 1) - lit(mean(i))) * lit(axis(i))
      }
      terms.reduce(_ + _).as(s"p$c")
    }
    emb.select($"vec_id" +: $"label" +: comps: _*)
  }

  /** Row shape for the typed-Aggregator path. */
  final case class LabeledVec(vec_id: Long, embedding: Seq[Float], label: Int)

  /** Per-label centroids via the TYPED `Aggregator` API
    * ([[graft.functions.TypedAggregators.VecCentroid]]) — the
    * Dataset-side extension surface (KeyValueGroupedDataset.agg with an
    * Encoder-backed mergeable buffer), complementing the Catalyst
    * TypedImperativeAggregates used elsewhere. The oracle recomputes
    * each shown component as a per-dimension average; first four
    * components shown, 6-decimal rounding per the aggregate convention.
    *
    * Scale: identical dataflow to any groupBy — partial buffers are
    * (d doubles, count) per label per partition; merge is vector add. */
  val qLabelCentroids = QueryDef.sql(
    "q_label_centroids",
    """WITH v AS (SELECT label, embedding FROM embeddings
      |           WHERE embedding IS NOT NULL AND len(embedding) = 64)
      |SELECT label, CAST(count(*) AS BIGINT) AS n,
      |       round(avg(embedding[1]), 6) AS c0,
      |       round(avg(embedding[2]), 6) AS c1,
      |       round(avg(embedding[3]), 6) AS c2,
      |       round(avg(embedding[4]), 6) AS c3
      |FROM v GROUP BY label
      |ORDER BY label""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val centroid = new graft.functions.TypedAggregators
      .VecCentroid[LabeledVec](Dim, _.embedding)
      .toColumn.name("centroid")
    val nAgg = new org.apache.spark.sql.expressions.Aggregator[LabeledVec, Long, Long] {
      override def zero: Long = 0L
      override def reduce(b: Long, v: LabeledVec): Long =
        if (v.embedding != null && v.embedding.length == Dim) b + 1 else b
      override def merge(a: Long, b: Long): Long = a + b
      override def finish(b: Long): Long = b
      override def bufferEncoder: org.apache.spark.sql.Encoder[Long] =
        org.apache.spark.sql.Encoders.scalaLong
      override def outputEncoder: org.apache.spark.sql.Encoder[Long] =
        org.apache.spark.sql.Encoders.scalaLong
    }.toColumn.name("n")
    Tables
      .embeddings(s, d)
      .as[LabeledVec]
      .groupByKey(_.label)
      .agg(nAgg, centroid)
      .toDF("label", "n", "centroid")
      .select($"label", $"n",
        round(element_at($"centroid", 1), 6).as("c0"),
        round(element_at($"centroid", 2), 6).as("c1"),
        round(element_at($"centroid", 3), 6).as("c2"),
        round(element_at($"centroid", 4), 6).as("c3"))
      .orderBy($"label")
  }

  def defs: Seq[QueryDef] = Seq(qEmbedCovariance, qEmbedCorrPairs, qLabelCentroids)
}
