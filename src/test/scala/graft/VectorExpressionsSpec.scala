package graft

import graft.plans.VectorExpressions.vecDot
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("native dot matches the higher-order-function formulation exactly") {
    val df = Tables.embeddings(spark, sf).limit(200)
    val hof = df.select(
      $"vec_id",
      aggregate(
        zip_with($"embedding", $"embedding", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0),
        (acc, v) => acc + v).as("d"))
    val native = df.select($"vec_id", vecDot($"embedding", $"embedding").as("d"))
    // bit-exact: both accumulate double in index order
    assert(native.except(hof).count() === 0)
    assert(hof.except(native).count() === 0)
  }

  test("mixed float/double array sides work (LSH hyperplane case)") {
    val got = Seq((Array(1f, 2f, 3f), Array(0.5, 0.25, 2.0)))
      .toDF("a", "b")
      .select(vecDot($"a", $"b"))
      .head()
      .getDouble(0)
    assert(got === 1 * 0.5 + 2 * 0.25 + 3 * 2.0)
  }

  test("null array yields null; empty arrays yield 0") {
    val df = Seq(
      (Some(Array(1f)), None: Option[Array[Float]]),
      (Some(Array.empty[Float]), Some(Array.empty[Float])))
      .toDF("a", "b")
      .select(vecDot($"a", $"b").as("d"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0) === 0.0)
  }

  test("HashRewriteRule rewrites the composable md5 idiom to the native hash") {
    graft.plans.GraftExtensions.register(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("docs_hrr")
    val df = spark.sql(
      "SELECT doc_id, CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT) AS h FROM docs_hrr")
    assert(
      df.queryExecution.optimizedPlan.toString.toLowerCase.contains("stablehash60"),
      df.queryExecution.optimizedPlan.toString)
    val native = Tables
      .documents(spark, sf)
      .select($"doc_id", graft.functions.TextFunctions.stableHash60($"text").as("h"))
    assert(df.except(native).count() === 0)
    assert(native.except(df).count() === 0)
  }

  test("expression survives both codegen and interpreted paths") {
    val df = Tables.embeddings(spark, sf).limit(10)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp = df.select(vecDot($"embedding", $"embedding").as("d")).collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    val codegen = df.select(vecDot($"embedding", $"embedding").as("d")).collect()
    assert(interp.map(_.getDouble(0)).toSeq === codegen.map(_.getDouble(0)).toSeq)
  }

  test("int8 quantize/dot: codegen == interpreted, no silent fallback") {
    import graft.plans.VectorExpressions.{int8Dot, int8Quantize}
    val df = Tables.embeddings(spark, sf).limit(20)
      .select($"vec_id", $"embedding",
        array_max(transform($"embedding", abs(_))).cast("double").as("scale"))
    def run(): Seq[(Array[Byte], Double)] = df
      .select(
        int8Quantize($"embedding", $"scale").as("qv"),
        (int8Dot(int8Quantize($"embedding", $"scale"), $"embedding")
          * $"scale" / 127.0).as("approx_sq_norm"))
      .collect().map(r => (r.getAs[Array[Byte]](0), r.getDouble(1))).toSeq
    // fallback=false makes a Janino failure FAIL instead of silently
    // falling back to the interpreted path (r1 lesson)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    val codegen = try run() finally
      spark.conf.set("spark.sql.codegen.fallback", "true")
    // wholeStage=false STILL compiles projections via Janino — truly
    // exercising nullSafeEval needs the NO_CODEGEN factory mode
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try run() finally
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    codegen.zip(interp).foreach { case ((qc, dc), (qi, di)) =>
      assert(qc.toSeq === qi.toSeq)
      assert(dc === di)
    }
    // quantized self-dot approximates the true squared norm
    val trueNorms = df.select(vecDot($"embedding", $"embedding")).collect()
    codegen.map(_._2).zip(trueNorms.map(_.getDouble(0))).foreach {
      case (approx, exact) => assert(math.abs(approx - exact) < 0.2 * exact + 0.05)
    }
  }
}
