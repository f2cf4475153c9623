package graft

import org.apache.spark.sql.functions._

/** Bucketing co-location: the 100 TB fact-fact join strategy — write both
  * fact tables bucketed by the join key, and the join plans with ZERO
  * exchanges (each bucket pair joins locally). This is the Spark analog
  * of the reference's hash-bucketed placement
  * (local_file_kv_store.rs:62-70) applied to relational data.
  */
class BucketJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // warehouse.dir is static config, and the in-memory catalog forgets
    // tables across JVMs while their warehouse directories persist —
    // clean both the catalog entries and the on-disk locations
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    val wh = new java.io.File(
      java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir")).getPath)
    Seq("li_b", "ord_b").foreach { t =>
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    Tables
      .lineitem(spark, sf)
      .write
      .bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey")
      .saveAsTable("li_b")
    Tables
      .orders(spark, sf)
      .write
      .bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey")
      .saveAsTable("ord_b")

    val joined = spark
      .table("li_b")
      .join(
        spark.table("ord_b").hint("merge"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(round(sum($"l_quantity"), 2).as("qty"))

    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    val joinIdx = plan.linesIterator.indexWhere(l => l.contains("SortMergeJoin"))
    assert(joinIdx >= 0, s"expected a sort-merge join:\n$plan")
    // no Exchange may feed the join (bucket layout satisfies the
    // distribution requirement on both sides)
    val joinInputs = plan.linesIterator.slice(joinIdx, plan.linesIterator.length)
    val exchangesBelowJoin = plan.linesIterator.toSeq
      .drop(joinIdx)
      .takeWhile(l => !l.contains("HashAggregate") || l.contains("Sort"))
      .count(_.contains("Exchange hashpartitioning"))
    assert(
      exchangesBelowJoin === 0,
      s"bucketed join must not shuffle either side:\n$plan")

    // and the result matches the plain (shuffling) join
    val plain = Tables
      .lineitem(spark, sf)
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(round(sum($"l_quantity"), 2).as("qty"))
    assert(joined.except(plain).count() === 0)
    assert(plain.except(joined).count() === 0)
  }
}
