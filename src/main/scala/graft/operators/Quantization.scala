package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) over the `embeddings` table — the missing
  * piece between the IVF index ([[Similarity]], [[graft.sources.EmbeddingIndex]])
  * and a true 100 TB ANN deployment. IVF prunes *which* vectors a query
  * scans; PQ shrinks *how much* each scanned vector costs: the 64-dim
  * float vector (256 B) becomes M=8 one-byte codes (8 B, 32× smaller), and
  * query-time distance becomes M lookups into a per-query table (ADC —
  * asymmetric distance computation) instead of a 64-dim float loop. At
  * cluster scale the codes table is the resident index; raw vectors stay
  * in cold storage for optional re-ranking.
  *
  * Codebooks here are SEEDED (subvectors of the first K vectors), the same
  * deterministic-training recipe the IVF index uses for its gate
  * (EmbeddingIndex trains real centroids; the oracle gates the seeded
  * assignment, and specs gate the trained path's invariants).
  *
  * Engine determinism: every distance is quantized to an integer in 1e-4
  * units (floor(d²·10⁴ + 0.5)) BEFORE any ranking or summation, so the
  * ADC sums are exact integer arithmetic and argmin tie-breaks on the
  * centroid id — bit-identical across engines regardless of float
  * summation order.
  *
  * Scale (100 TB): the codebook is M·K = 128 rows (broadcast); code
  * assignment is a single never-shuffled corpus scan; the per-query LUT
  * is nq·M·K rows (broadcast); ADC reduces per (qid, vec) with a
  * map-side-combinable integer sum. Nothing corpus-sized ever moves: the
  * only shuffle is the aggregate-sized per-query top-k.
  */
object Quantization {

  /** Number of subspaces (M): 64 dims → 8 slices of 8. */
  val PqM = 8

  /** Dims per subspace. */
  val PqSubDim = 8

  /** Codes per subspace codebook (K). */
  val PqK = 16

  /** Quantized squared-L2 distance (1e-4 integer units) between two
    * equal-length double-array columns. */
  private def d4(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d),
        _ + _) * 10000.0 + 0.5).cast("long")

  /** (vec_id, s, sv): each vector exploded into its M subvectors. */
  private[graft] def subvectors(emb: DataFrame): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    emb
      .select($"vec_id",
        transform($"embedding", _.cast("double")).as("e"))
      .select($"vec_id",
        explode(sequence(lit(0), lit(PqM - 1))).as("s"), $"e")
      .select($"vec_id", $"s",
        slice($"e", $"s" * PqSubDim + 1, lit(PqSubDim)).as("sv"))
  }

  /** (vec_id, s, cid, dist4): every subvector scored against its
    * subspace's K seeded centroids, argmin rank attached. The codebook
    * side is M·K rows and broadcast. */
  private[graft] def assignment(emb: DataFrame): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val sv = subvectors(emb)
    val codebook = sv
      .filter($"vec_id" < PqK)
      .select($"vec_id".cast("int").as("cid"), $"s", $"sv".as("cv"))
    val w = Window.partitionBy($"vec_id", $"s").orderBy($"dist4", $"cid")
    sv
      .join(broadcast(codebook), "s")
      .select($"vec_id", $"s", $"cid", d4($"sv", $"cv").as("dist4"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .drop("rk")
  }

  /** DuckDB CTE prefix shared by both PQ oracles: subvector explosion,
    * seeded codebook, quantized distances, argmin assignment. */
  private val OracleAssign: String =
    s"""WITH v AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |subs AS (SELECT unnest(range(0, $PqM)) AS s),
       |sv AS (
       |  SELECT vec_id, s,
       |         e[(s * $PqSubDim + 1):(s * $PqSubDim + $PqSubDim)] AS sv
       |  FROM v CROSS JOIN subs),
       |cb AS (
       |  SELECT CAST(vec_id AS INT) AS cid, s, sv AS cv
       |  FROM sv WHERE vec_id < $PqK),
       |d AS (
       |  SELECT sv.vec_id, sv.s, cb.cid,
       |         CAST(floor(list_sum([(sv.sv[i] - cb.cv[i])
       |                              * (sv.sv[i] - cb.cv[i])
       |                              for i in range(1, $PqSubDim + 1)])
       |                    * 10000 + 0.5) AS BIGINT) AS dist4
       |  FROM sv JOIN cb ON sv.s = cb.s),
       |a AS (
       |  SELECT vec_id, s, cid, dist4,
       |         row_number() OVER (PARTITION BY vec_id, s
       |                            ORDER BY dist4, cid) AS rk
       |  FROM d)""".stripMargin

  /** Per-subspace PQ health report: how many of the K codes each
    * subspace actually uses and how much quantization error it carries —
    * the table an index operator reads before trusting a codebook (a
    * subspace using 3 of 16 codes needs retraining; one with max_dist an
    * order of magnitude above the mean hides outlier subvectors). */
  val qPqQuantize = QueryDef.sql(
    "q_pq_quantize",
    s"""$OracleAssign
       |SELECT CAST(s AS INT) AS s,
       |       CAST(count(*) AS BIGINT) AS n_vecs,
       |       CAST(count(DISTINCT cid) AS BIGINT) AS codes_used,
       |       floor(sum(dist4) * 1.0 / count(*) + 0.5) / 10000.0
       |         AS mean_dist,
       |       max(dist4) / 10000.0 AS max_dist
       |FROM a WHERE rk = 1
       |GROUP BY s ORDER BY s""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    assignment(Tables.embeddings(s, d))
      .groupBy($"s")
      .agg(
        count(lit(1)).as("n_vecs"),
        countDistinct($"cid").as("codes_used"),
        (floor(sum($"dist4") * lit(1.0) / count(lit(1)) + lit(0.5))
          / 10000.0).as("mean_dist"),
        (max($"dist4") / lit(10000.0)).as("max_dist"))
      .orderBy($"s")
  }

  /** ADC recall@10: for each query (vec_id < 3), rank the corpus by the
    * PQ-approximated distance (sum over subspaces of the LUT entry for
    * that vector's code) and measure overlap with the exact squared-L2
    * top-10 — the accept/reject measurement run before swapping an index
    * to PQ codes. The LUT is nq·M·K rows; the exact side exists only as
    * the verifier (at production scale it runs on a hash-sampled slice,
    * like q_ann_recall). */
  val qPqRecall = QueryDef.sql(
    "q_pq_recall",
    s"""$OracleAssign,
       |codes AS (SELECT vec_id, s, cid FROM a WHERE rk = 1),
       |q AS (SELECT vec_id AS qid, s, sv FROM sv WHERE vec_id < 3),
       |lut AS (
       |  SELECT q.qid, q.s, cb.cid,
       |         CAST(floor(list_sum([(q.sv[i] - cb.cv[i])
       |                              * (q.sv[i] - cb.cv[i])
       |                              for i in range(1, $PqSubDim + 1)])
       |                    * 10000 + 0.5) AS BIGINT) AS d4
       |  FROM q JOIN cb ON q.s = cb.s),
       |adc AS (
       |  SELECT l.qid, c.vec_id, sum(l.d4) AS ad4
       |  FROM codes c JOIN lut l ON l.s = c.s AND l.cid = c.cid
       |  GROUP BY l.qid, c.vec_id),
       |atop AS (
       |  SELECT qid, vec_id,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY ad4, vec_id) AS rk
       |  FROM adc),
       |qv AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 3),
       |exact AS (
       |  SELECT qv.qid, v.vec_id,
       |         CAST(floor(list_sum([(qv.qe[i] - v.e[i])
       |                              * (qv.qe[i] - v.e[i])
       |                              for i in range(1, ${PqM * PqSubDim} + 1)])
       |                    * 10000 + 0.5) AS BIGINT) AS ed4
       |  FROM qv CROSS JOIN v),
       |etop AS (
       |  SELECT qid, vec_id,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY ed4, vec_id) AS rk
       |  FROM exact)
       |SELECT e.qid,
       |       CAST(count(a.vec_id) AS BIGINT) AS hits,
       |       count(a.vec_id) / 10.0 AS recall
       |FROM etop e
       |LEFT JOIN atop a
       |  ON a.qid = e.qid AND a.vec_id = e.vec_id AND a.rk <= 10
       |WHERE e.rk <= 10
       |GROUP BY e.qid ORDER BY e.qid""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val codes = assignment(emb).select($"vec_id", $"s", $"cid")
    val sv = subvectors(emb)
    val codebook = sv
      .filter($"vec_id" < PqK)
      .select($"vec_id".cast("int").as("cid"), $"s", $"sv".as("cv"))
    val lut = sv
      .filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"s", $"sv")
      .join(broadcast(codebook), "s")
      .select($"qid", $"s", $"cid", d4($"sv", $"cv").as("d4"))
    val adc = codes
      .join(broadcast(lut), Seq("s", "cid"))
      .groupBy($"qid", $"vec_id")
      .agg(sum($"d4").as("ad4"))
    val wA = Window.partitionBy($"qid").orderBy($"ad4", $"vec_id")
    val atop = adc
      .withColumn("rk", row_number().over(wA))
      .filter($"rk" <= 10)
      .select($"qid", $"vec_id")
    val full = emb.select($"vec_id",
      transform($"embedding", _.cast("double")).as("e"))
    val qv = full.filter($"vec_id" < 3).select($"vec_id".as("qid"),
      $"e".as("qe"))
    val wE = Window.partitionBy($"qid").orderBy($"ed4", $"vec_id")
    val etop = full
      .crossJoin(broadcast(qv))
      .select($"qid", $"vec_id", d4($"qe", $"e").as("ed4"))
      .withColumn("rk", row_number().over(wE))
      .filter($"rk" <= 10)
      .select($"qid", $"vec_id")
    val atopR = atop
      .withColumnRenamed("qid", "a_qid")
      .withColumnRenamed("vec_id", "a_vec")
    etop
      .join(atopR,
        $"a_qid" === $"qid" && $"a_vec" === $"vec_id", "left")
      .groupBy($"qid")
      .agg(
        count($"a_vec").as("hits"),
        (count($"a_vec") / 10.0).as("recall"))
      .orderBy($"qid")
  }

  /** Coarse IVF cells for the combined index (matches qAnnIvf's seeded
    * cell count). */
  val IvfCells = 16

  /** Cells probed per query in the combined index. */
  val IvfProbes = 4

  // ---- shared IVF-PQ building blocks -----------------------------------
  // Used by BOTH the oracle-gated q_ann_ivfpq below and the persistent
  // [[graft.sources.PqEmbeddingIndex]], so the stored index and the
  // hash-verified query are one implementation, not two.

  private def toD(c: org.apache.spark.sql.Column) =
    transform(c, _.cast("double"))

  /** (ccid, cv, cn): the seeded coarse quantizer — the first [[IvfCells]]
    * corpus vectors, replay-stable like the IVF index's seed path. */
  private[graft] def seedCoarse(emb: DataFrame): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    import graft.functions.VectorFunctions.norm
    emb.filter($"vec_id" < IvfCells)
      .select($"vec_id".cast("int").as("ccid"), $"embedding".as("cv"),
        norm($"embedding").as("cn"))
  }

  /** (vec_id, embedding, ccid, cv, cs4): every vector scored against every
    * coarse centroid (broadcast — the centroid table is [[IvfCells]] rows
    * at any corpus size). Cosine is quantized to 1e-4 integer units before
    * any ranking; zero-norm pairs are dropped (the annIvfPairs convention:
    * a vector with no magnitude has no cell affinity). */
  private[graft] def coarseScored(emb: DataFrame, cc: DataFrame): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    import graft.functions.VectorFunctions.{dot, norm}
    emb
      .select($"vec_id", $"embedding", norm($"embedding").as("vn"))
      .crossJoin(broadcast(cc))
      .filter($"vn" * $"cn" =!= 0.0)
      .select($"vec_id", $"embedding", $"ccid", $"cv",
        floor(dot($"embedding", $"cv") / ($"vn" * $"cn") * 10000.0 + 0.5)
          .cast("long").as("cs4"))
  }

  /** (vec_id, ccid, r): winning cell per vector (argmax cs4, ties to the
    * lower ccid) plus the double-precision residual v − centroid that PQ
    * codes against. */
  private[graft] def residualAssign(scored: DataFrame): DataFrame = {
    val s = scored.sparkSession
    import s.implicits._
    val wCell = Window.partitionBy($"vec_id").orderBy($"cs4".desc, $"ccid")
    scored
      .withColumn("rk", row_number().over(wCell))
      .filter($"rk" === 1)
      .select($"vec_id", $"ccid",
        zip_with(toD($"embedding"), toD($"cv"), (x, y) => x - y).as("r"))
  }

  /** (vec_id, ccid, s, sv): residuals exploded into their M subvectors. */
  private[graft] def residualSub(asg: DataFrame): DataFrame = {
    val s = asg.sparkSession
    import s.implicits._
    asg
      .select($"vec_id", $"ccid",
        explode(sequence(lit(0), lit(PqM - 1))).as("s"), $"r")
      .select($"vec_id", $"ccid", $"s",
        slice($"r", $"s" * PqSubDim + 1, lit(PqSubDim)).as("sv"))
  }

  /** (cid, s, cbv): residual codebooks seeded from vectors
    * [[IvfCells]]..[[IvfCells]]+[[PqK]]−1 — the coarse seeds themselves
    * have zero residuals and cannot form a codebook. */
  private[graft] def residualCodebook(rsv: DataFrame): DataFrame = {
    val s = rsv.sparkSession
    import s.implicits._
    rsv
      .filter($"vec_id" >= IvfCells && $"vec_id" < IvfCells + PqK)
      .select(($"vec_id" - IvfCells).cast("int").as("cid"), $"s",
        $"sv".as("cbv"))
  }

  /** (vec_id, ccid, s, cid): argmin PQ coding of each residual subvector
    * against the broadcast codebook (quantized distance, ties to the
    * lower cid). */
  private[graft] def codeAgainst(rsv: DataFrame, cb: DataFrame): DataFrame = {
    val s = rsv.sparkSession
    import s.implicits._
    val wCode = Window.partitionBy($"vec_id", $"s").orderBy($"pd4", $"cid")
    rsv
      .join(broadcast(cb), "s")
      .select($"vec_id", $"ccid", $"s", $"cid", d4($"sv", $"cbv").as("pd4"))
      .withColumn("rk", row_number().over(wCode))
      .filter($"rk" === 1)
      .select($"vec_id", $"ccid", $"s", $"cid")
  }

  /** (qid, vec_id, ad4): the full ADC table for queries vec_id < nQ —
    * each query probes its top-[[IvfProbes]] cells and every coded vector
    * living there is scored by the integer LUT sum. This is the scoring
    * core of q_ann_ivfpq, and the parity target the stored
    * [[graft.sources.PqEmbeddingIndex]] is spec-gated against. */
  private[graft] def ivfPqAdc(emb: DataFrame, nQ: Int): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val scored = coarseScored(emb, seedCoarse(emb))
    val rsv = residualSub(residualAssign(scored))
    val cb = residualCodebook(rsv)
    val codes = codeAgainst(rsv, cb)
    val wCell = Window.partitionBy($"vec_id").orderBy($"cs4".desc, $"ccid")
    val probes = scored
      .filter($"vec_id" < nQ)
      .withColumn("rk", row_number().over(wCell))
      .filter($"rk" <= IvfProbes)
      .select($"vec_id".as("qid"), $"ccid",
        zip_with(toD($"embedding"), toD($"cv"), (x, y) => x - y).as("qr"))
    val lut = probes
      .select($"qid", $"ccid",
        explode(sequence(lit(0), lit(PqM - 1))).as("s"), $"qr")
      .select($"qid", $"ccid", $"s",
        slice($"qr", $"s" * PqSubDim + 1, lit(PqSubDim)).as("qsv"))
      .join(broadcast(cb), "s")
      .select($"qid", $"ccid", $"s", $"cid", d4($"qsv", $"cbv").as("d4"))
    codes
      .join(broadcast(lut), Seq("ccid", "s", "cid"))
      .groupBy($"qid", $"vec_id")
      .agg(sum($"d4").as("ad4"))
  }

  /** The full IVF-PQ search, composed end-to-end: a coarse quantizer
    * assigns every vector to its nearest of [[IvfCells]] seeded cells
    * (cosine, the qAnnIvf recipe); the RESIDUAL v − centroid is then
    * PQ-coded against residual codebooks (seeds 16..31 — the coarse
    * seeds themselves have zero residuals and cannot form a codebook);
    * a query probes its top-[[IvfProbes]] cells and ranks ONLY the
    * vectors living there by ADC over the residual LUT. Recall@10 is
    * measured against the corpus-wide exact ranking, so both failure
    * modes — a neighbor in an unprobed cell, and ADC misranking inside
    * a probed cell — count against the index, exactly like a production
    * recall audit. n_scanned shows the pruning: candidates touched vs
    * the full corpus.
    *
    * Scale (100 TB): cells (16 rows), codebooks (128 rows), probes
    * (nq·nprobe rows) and the LUT (nq·nprobe·M·K rows) all broadcast;
    * the corpus is scanned once for assignment and once for coding, and
    * search touches ~nprobe/nCells of the code table with integer ADC
    * sums. The exact side exists only as the verifier (sampled at
    * production scale, like q_ann_recall). */
  /** DuckDB CTE chain shared by the IVF-PQ oracles: coarse assignment,
    * residual coding, probe LUTs, and the per-(query, candidate) integer
    * ADC table `adc(qid, vec_id, ad4)` — the SQL twin of [[ivfPqAdc]].
    * Ends without a trailing comma so consumers append their own CTEs. */
  private val OracleAdcCtes: String =
    s"""v AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |cc AS (
       |  SELECT CAST(vec_id AS INT) AS ccid, e AS cv
       |  FROM v WHERE vec_id < $IvfCells),
       |sc AS (
       |  SELECT v.vec_id, v.e, cc.ccid, cc.cv,
       |         CAST(floor(list_cosine_similarity(v.e, cc.cv) * 10000
       |                    + 0.5) AS BIGINT) AS cs4
       |  FROM v CROSS JOIN cc
       |  WHERE list_sum(list_transform(v.e, x -> x * x)) > 0
       |    AND list_sum(list_transform(cc.cv, x -> x * x)) > 0),
       |asg AS (
       |  SELECT vec_id, ccid, [e[i] - cv[i]
       |                        for i in range(1, ${PqM * PqSubDim} + 1)] AS r
       |  FROM (SELECT vec_id, e, ccid, cv,
       |               row_number() OVER (PARTITION BY vec_id
       |                                  ORDER BY cs4 DESC, ccid) AS rk
       |        FROM sc) WHERE rk = 1),
       |subs AS (SELECT unnest(range(0, $PqM)) AS s),
       |rsv AS (
       |  SELECT vec_id, ccid, s,
       |         r[(s * $PqSubDim + 1):(s * $PqSubDim + $PqSubDim)] AS sv
       |  FROM asg CROSS JOIN subs),
       |cb AS (
       |  SELECT CAST(vec_id - $IvfCells AS INT) AS cid, s, sv AS cbv
       |  FROM rsv
       |  WHERE vec_id >= $IvfCells AND vec_id < ${IvfCells + PqK}),
       |pd AS (
       |  SELECT rsv.vec_id, rsv.ccid, rsv.s, cb.cid,
       |         CAST(floor(list_sum([(rsv.sv[i] - cb.cbv[i])
       |                              * (rsv.sv[i] - cb.cbv[i])
       |                              for i in range(1, $PqSubDim + 1)])
       |                    * 10000 + 0.5) AS BIGINT) AS pd4
       |  FROM rsv JOIN cb ON rsv.s = cb.s),
       |codes AS (
       |  SELECT vec_id, ccid, s, cid FROM (
       |    SELECT vec_id, ccid, s, cid,
       |           row_number() OVER (PARTITION BY vec_id, s
       |                              ORDER BY pd4, cid) AS rk
       |    FROM pd) WHERE rk = 1),
       |pr AS (
       |  SELECT qid, ccid, qr FROM (
       |    SELECT vec_id AS qid, ccid,
       |           [e[i] - cv[i]
       |            for i in range(1, ${PqM * PqSubDim} + 1)] AS qr,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY cs4 DESC, ccid) AS rk
       |    FROM sc WHERE vec_id < 3) WHERE rk <= $IvfProbes),
       |qs AS (
       |  SELECT qid, ccid, s,
       |         qr[(s * $PqSubDim + 1):(s * $PqSubDim + $PqSubDim)] AS qv
       |  FROM pr CROSS JOIN subs),
       |lut AS (
       |  SELECT q.qid, q.ccid, q.s, cb.cid,
       |         CAST(floor(list_sum([(q.qv[i] - cb.cbv[i])
       |                              * (q.qv[i] - cb.cbv[i])
       |                              for i in range(1, $PqSubDim + 1)])
       |                    * 10000 + 0.5) AS BIGINT) AS d4
       |  FROM qs q JOIN cb ON q.s = cb.s),
       |adc AS (
       |  SELECT l.qid, c.vec_id, sum(l.d4) AS ad4
       |  FROM codes c
       |  JOIN lut l ON l.ccid = c.ccid AND l.s = c.s AND l.cid = c.cid
       |  GROUP BY l.qid, c.vec_id)""".stripMargin

  val qAnnIvfPq = QueryDef.sql(
    "q_ann_ivfpq",
    s"""WITH $OracleAdcCtes,
       |scanned AS (SELECT qid, count(*) AS n_scanned FROM adc GROUP BY qid),
       |atop AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY ad4, vec_id) AS rk
       |    FROM adc) WHERE rk <= 10),
       |qv2 AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 3),
       |ex AS (
       |  SELECT qv2.qid, v.vec_id,
       |         CAST(floor(list_sum([(qv2.qe[i] - v.e[i])
       |                              * (qv2.qe[i] - v.e[i])
       |                              for i in range(1, ${PqM * PqSubDim} + 1)])
       |                    * 10000 + 0.5) AS BIGINT) AS ed4
       |  FROM qv2 CROSS JOIN v),
       |etop AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY ed4, vec_id) AS rk
       |    FROM ex) WHERE rk <= 10)
       |SELECT e.qid,
       |       CAST(sc2.n_scanned AS BIGINT) AS n_scanned,
       |       CAST(count(a.vec_id) AS BIGINT) AS hits,
       |       count(a.vec_id) / 10.0 AS recall
       |FROM etop e
       |LEFT JOIN atop a ON a.qid = e.qid AND a.vec_id = e.vec_id
       |JOIN scanned sc2 ON sc2.qid = e.qid
       |GROUP BY e.qid, sc2.n_scanned
       |ORDER BY e.qid""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val toD = (c: org.apache.spark.sql.Column) => transform(c, _.cast("double"))
    val adc = ivfPqAdc(emb, nQ = 3)
    val scanned = adc.groupBy($"qid").agg(count(lit(1)).as("n_scanned"))
    val wT = Window.partitionBy($"qid").orderBy($"ad4", $"vec_id")
    val atop = adc
      .withColumn("rk", row_number().over(wT)).filter($"rk" <= 10)
      .select($"qid", $"vec_id")
    val full = emb.select($"vec_id", toD($"embedding").as("e"))
    val qv = full.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"e".as("qe"))
    val wE = Window.partitionBy($"qid").orderBy($"ed4", $"vec_id")
    val etop = full
      .crossJoin(broadcast(qv))
      .select($"qid", $"vec_id", d4($"qe", $"e").as("ed4"))
      .withColumn("rk", row_number().over(wE)).filter($"rk" <= 10)
      .select($"qid", $"vec_id")
    val atopR = atop
      .withColumnRenamed("qid", "a_qid")
      .withColumnRenamed("vec_id", "a_vec")
    etop
      .join(atopR, $"a_qid" === $"qid" && $"a_vec" === $"vec_id", "left")
      .groupBy($"qid")
      .agg(count($"a_vec").as("hits"), (count($"a_vec") / 10.0).as("recall"))
      .join(broadcast(scanned), "qid")
      .select($"qid", $"n_scanned", $"hits", $"recall")
      .orderBy($"qid")
  }

  /** Shortlist size the rerank stage refines (top-N by ADC). */
  val RerankShortlist = 50

  /** Two-stage retrieval — the full production ANN shape: the IVF-PQ ADC
    * pass produces a cheap [[RerankShortlist]]-deep shortlist per query,
    * then ONLY those ids fetch their full-precision vectors for an exact
    * distance rerank (at cluster scale: point lookups into the cold
    * vector store, ~50 rows per query against a corpus-sized scan).
    * Reported per query: recall@10 of the raw ADC ranking vs recall@10
    * after reranking, against corpus-wide exact truth — the measurement
    * that justifies (or rejects) paying the rerank I/O: ADC misrankings
    * inside the shortlist are repaired, misses outside it are not.
    *
    * Scale (100 TB): everything up to the shortlist is q_ann_ivfpq's
    * dataflow (broadcast codebooks/LUTs, cell-pruned code scan); the
    * rerank joins a (nq·[[RerankShortlist]])-row relation against the
    * vector table by id — broadcast, never a corpus shuffle. The exact
    * side below is the verifier (hash-sampled in production). */
  val qAnnRerank = QueryDef.sql(
    "q_ann_rerank",
    s"""WITH $OracleAdcCtes,
       |short AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY ad4, vec_id) AS rk
       |    FROM adc) WHERE rk <= $RerankShortlist),
       |atop AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY ad4, vec_id) AS rk
       |    FROM adc) WHERE rk <= 10),
       |qv2 AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 3),
       |rr AS (
       |  SELECT s2.qid, s2.vec_id,
       |         CAST(floor(list_sum([(q.qe[i] - v.e[i])
       |                              * (q.qe[i] - v.e[i])
       |                              for i in range(1, ${PqM * PqSubDim} + 1)])
       |                    * 10000 + 0.5) AS BIGINT) AS rd4
       |  FROM short s2
       |  JOIN v ON v.vec_id = s2.vec_id
       |  JOIN qv2 q ON q.qid = s2.qid),
       |rtop AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY rd4, vec_id) AS rk
       |    FROM rr) WHERE rk <= 10),
       |ex AS (
       |  SELECT qv2.qid, v.vec_id,
       |         CAST(floor(list_sum([(qv2.qe[i] - v.e[i])
       |                              * (qv2.qe[i] - v.e[i])
       |                              for i in range(1, ${PqM * PqSubDim} + 1)])
       |                    * 10000 + 0.5) AS BIGINT) AS ed4
       |  FROM qv2 CROSS JOIN v),
       |etop AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY ed4, vec_id) AS rk
       |    FROM ex) WHERE rk <= 10)
       |SELECT e.qid,
       |       CAST(count(a.vec_id) AS BIGINT) AS hits_adc,
       |       CAST(count(r.vec_id) AS BIGINT) AS hits_rerank,
       |       count(a.vec_id) / 10.0 AS recall_adc,
       |       count(r.vec_id) / 10.0 AS recall_rerank
       |FROM etop e
       |LEFT JOIN atop a ON a.qid = e.qid AND a.vec_id = e.vec_id
       |LEFT JOIN rtop r ON r.qid = e.qid AND r.vec_id = e.vec_id
       |GROUP BY e.qid
       |ORDER BY e.qid""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val toD = (c: org.apache.spark.sql.Column) => transform(c, _.cast("double"))
    val adc = ivfPqAdc(emb, nQ = 3)
    val wA = Window.partitionBy($"qid").orderBy($"ad4", $"vec_id")
    val ranked = adc.withColumn("rk", row_number().over(wA))
    val short = ranked.filter($"rk" <= RerankShortlist).select($"qid", $"vec_id")
    val atop = ranked.filter($"rk" <= 10)
      .select($"qid".as("a_qid"), $"vec_id".as("a_vec"))
    val full = emb.select($"vec_id", toD($"embedding").as("e"))
    val qv = full.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"e".as("qe"))
    val wR = Window.partitionBy($"qid").orderBy($"rd4", $"vec_id")
    val rtop = short
      .join(full, "vec_id")
      .join(broadcast(qv), "qid")
      .select($"qid", $"vec_id", d4($"qe", $"e").as("rd4"))
      .withColumn("rk", row_number().over(wR))
      .filter($"rk" <= 10)
      .select($"qid".as("r_qid"), $"vec_id".as("r_vec"))
    val wE = Window.partitionBy($"qid").orderBy($"ed4", $"vec_id")
    val etop = full
      .crossJoin(broadcast(qv.withColumnRenamed("qid", "eqid")))
      .select($"eqid".as("qid"), $"vec_id", d4($"qe", $"e").as("ed4"))
      .withColumn("rk", row_number().over(wE))
      .filter($"rk" <= 10)
      .select($"qid", $"vec_id")
    etop
      .join(atop, $"a_qid" === $"qid" && $"a_vec" === $"vec_id", "left")
      .join(rtop, $"r_qid" === $"qid" && $"r_vec" === $"vec_id", "left")
      .groupBy($"qid")
      .agg(
        count($"a_vec").as("hits_adc"),
        count($"r_vec").as("hits_rerank"),
        (count($"a_vec") / 10.0).as("recall_adc"),
        (count($"r_vec") / 10.0).as("recall_rerank"))
      .orderBy($"qid")
  }

  /** Rerank depths to sweep (shortlist sizes fed to the exact stage). */
  private val RerankDepths = Seq(10, 25, 50, 100)

  /** Rerank-depth sweep — the second production dial after nprobe
    * (q_ann_nprobe_sweep): how much recall each additional exactly-
    * reranked ADC candidate buys. One ADC ranking crossed with the
    * depth relation; per (depth, query), recall@10 of the exact-rerank
    * top-10 against the corpus-wide exact truth. Deeper shortlists are
    * supersets, so recall is monotone in depth (spec-pinned) and the
    * curve's knee is where a deployment stops paying for exact
    * distance evaluations. */
  val qRerankSweep = QueryDef.sql(
    "q_rerank_sweep",
    s"""WITH $OracleAdcCtes,
       |dp AS (SELECT unnest([${RerankDepths.mkString(", ")}]) AS depth),
       |rkd AS (
       |  SELECT qid, vec_id,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY ad4, vec_id) AS rk
       |  FROM adc),
       |qv2 AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 3),
       |rr AS (
       |  SELECT dp.depth, r.qid, r.vec_id,
       |         CAST(floor(list_sum([(q.qe[i] - v.e[i])
       |                              * (q.qe[i] - v.e[i])
       |                              for i in range(1, ${PqM * PqSubDim} + 1)])
       |                    * 10000 + 0.5) AS BIGINT) AS rd4
       |  FROM dp JOIN rkd r ON r.rk <= dp.depth
       |  JOIN v ON v.vec_id = r.vec_id
       |  JOIN qv2 q ON q.qid = r.qid),
       |rtop AS (
       |  SELECT depth, qid, vec_id FROM (
       |    SELECT depth, qid, vec_id,
       |           row_number() OVER (PARTITION BY depth, qid
       |                              ORDER BY rd4, vec_id) AS rk
       |    FROM rr) WHERE rk <= 10),
       |ex AS (
       |  SELECT qv2.qid, v.vec_id,
       |         CAST(floor(list_sum([(qv2.qe[i] - v.e[i])
       |                              * (qv2.qe[i] - v.e[i])
       |                              for i in range(1, ${PqM * PqSubDim} + 1)])
       |                    * 10000 + 0.5) AS BIGINT) AS ed4
       |  FROM qv2 CROSS JOIN v),
       |etop AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY ed4, vec_id) AS rk
       |    FROM ex) WHERE rk <= 10)
       |SELECT dp.depth, e.qid,
       |       CAST(count(r.vec_id) AS BIGINT) AS hits,
       |       count(r.vec_id) / 10.0 AS recall
       |FROM dp CROSS JOIN etop e
       |LEFT JOIN rtop r
       |  ON r.depth = dp.depth AND r.qid = e.qid AND r.vec_id = e.vec_id
       |GROUP BY dp.depth, e.qid
       |ORDER BY dp.depth, e.qid""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val toD = (c: org.apache.spark.sql.Column) => transform(c, _.cast("double"))
    val adc = ivfPqAdc(emb, nQ = 3)
    val wA = Window.partitionBy($"qid").orderBy($"ad4", $"vec_id")
    val ranked = adc.withColumn("rk", row_number().over(wA))
    val depths = RerankDepths.toDF("depth")
    val full = emb.select($"vec_id", toD($"embedding").as("e"))
    val qv = full.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"e".as("qe"))
    val wR = Window.partitionBy($"depth", $"qid").orderBy($"rd4", $"vec_id")
    val rtop = ranked
      .crossJoin(broadcast(depths))
      .filter($"rk" <= $"depth")
      .select($"depth", $"qid", $"vec_id")
      .join(full, "vec_id")
      .join(broadcast(qv), "qid")
      .select($"depth", $"qid", $"vec_id", d4($"qe", $"e").as("rd4"))
      .withColumn("rrk", row_number().over(wR))
      .filter($"rrk" <= 10)
      .select($"depth".as("r_depth"), $"qid".as("r_qid"),
        $"vec_id".as("r_vec"))
    val wE = Window.partitionBy($"qid").orderBy($"ed4", $"vec_id")
    val etop = full
      .crossJoin(broadcast(qv.withColumnRenamed("qid", "eqid")))
      .select($"eqid".as("qid"), $"vec_id", d4($"qe", $"e").as("ed4"))
      .withColumn("rk", row_number().over(wE))
      .filter($"rk" <= 10)
      .select($"qid", $"vec_id")
    depths
      .crossJoin(etop)
      .join(rtop,
        $"r_depth" === $"depth" && $"r_qid" === $"qid" &&
          $"r_vec" === $"vec_id",
        "left")
      .groupBy($"depth", $"qid")
      .agg(count($"r_vec").as("hits"),
        (count($"r_vec") / 10.0).as("recall"))
      .orderBy($"depth", $"qid")
  }

  /** Scalar-quantization bit-depth sweep — the design dial BEFORE
    * choosing int8 ([[Similarity.qEmbedQuantize]]) or PQ: at b ∈ {2, 4,
    * 6, 8} bits per dimension, uniform per-dimension quantization over
    * the corpus [min, max] range, reporting reconstruction RMSE and the
    * mean relative error against each dimension's span. Error should
    * quarter per +2 bits (the 2^-b law); where it stops improving, the
    * embedding's intrinsic noise floor is reached — that's the bit
    * depth to ship.
    *
    * Scale: per-dim min/max is one moment aggregate (64·2 doubles,
    * broadcast); the sweep explodes each scanned vector ×4 bit-depths
    * into a partial aggregate — same constant-blow-up shape as the
    * Poisson bootstrap, corpus never shuffled. */
  val qSqSweep = QueryDef.sql(
    "q_sq_sweep",
    """WITH dims AS (
      |  SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
      |  FROM embeddings
      |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)),
      |rng AS (
      |  SELECT dim, min(x) AS lo, max(x) AS hi FROM dims GROUP BY dim),
      |bits AS (SELECT unnest([2, 4, 6, 8]) AS b),
      |err AS (
      |  SELECT bits.b,
      |         dims.x - (rng.lo + (floor((dims.x - rng.lo)
      |             / (rng.hi - rng.lo) * ((1 << bits.b) - 1) + 0.5))
      |           * (rng.hi - rng.lo) / ((1 << bits.b) - 1)) AS e,
      |         rng.hi - rng.lo AS span
      |  FROM dims JOIN rng USING (dim) CROSS JOIN bits
      |  WHERE rng.hi > rng.lo)
      |SELECT CAST(b AS INT) AS bits,
      |       round(sqrt(avg(e * e)), 6) AS rmse,
      |       round(avg(abs(e) / span), 6) AS rel_err
      |FROM err GROUP BY b ORDER BY bits""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val dims = Tables.embeddings(s, d)
      .select($"vec_id", posexplode($"embedding").as(Seq("dim", "xf")))
      .select($"vec_id", $"dim", $"xf".cast("double").as("x"))
    val rng = dims.groupBy($"dim")
      .agg(min($"x").as("lo"), max($"x").as("hi"))
      .filter($"hi" > $"lo")
    val bits = s.range(1, 5).select(($"id" * 2).cast("int").as("b"))
    val levels = (expr("shiftleft(1, b)") - 1).cast("double")
    val recon = $"lo" + floor(($"x" - $"lo") / ($"hi" - $"lo") * levels
      + 0.5) * ($"hi" - $"lo") / levels
    dims
      .join(broadcast(rng), "dim")
      .crossJoin(broadcast(bits))
      .select($"b", ($"x" - recon).as("e"), ($"hi" - $"lo").as("span"))
      .groupBy($"b")
      .agg(round(sqrt(avg($"e" * $"e")), 6).as("rmse"),
        round(avg(abs($"e") / $"span"), 6).as("rel_err"))
      .select($"b".cast("int").as("bits"), $"rmse", $"rel_err")
      .orderBy($"bits")
  }

  def defs: Seq[QueryDef] =
    Seq(qPqQuantize, qPqRecall, qAnnIvfPq, qAnnRerank, qRerankSweep,
      qSqSweep)
}
