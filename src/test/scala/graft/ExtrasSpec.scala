package graft

import graft.operators.Extras
import graft.sources.KvStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct (HLL) is within 5% of exact") {
    Tables
      .lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_partkey").as("approx_parts"),
        countDistinct($"l_partkey").as("exact_parts"))
      .collect()
      .foreach { r =>
        val approx = r.getAs[Long]("approx_parts").toDouble
        val exact = r.getAs[Long]("exact_parts").toDouble
        assert(math.abs(approx - exact) / exact < 0.05,
          s"approx=$approx exact=$exact")
      }
  }

  test("KMV sketch estimate is within 15% of exact (k=256)") {
    Extras.qApproxDistinct.fn(spark, sf).collect().foreach { r =>
      val est = r.getAs[Long]("kmv_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(est - exact) / exact < 0.15, s"kmv=$est exact=$exact")
    }
  }

  test("KMV is exact below k and merge-invariant across partitionings") {
    import graft.functions.TextFunctions.stableHash60
    import graft.plans.KmvAgg.kmvDistinct
    // 100 distinct values < k=256 → the sketch set is exhaustive
    val small = spark.range(1000).select(($"id" % 100).cast("string").as("v"))
    def estimate(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(kmvDistinct(stableHash60($"v"), 256).as("e")).head().getLong(0)
    assert(estimate(small) === 100L)
    // same rows, radically different partitionings → same merged result
    val big = spark.range(20000).select(($"id" % 7919).cast("string").as("v"))
    val e1 = estimate(big.repartition(1))
    val e32 = estimate(big.repartition(32, $"v"))
    val eRand = estimate(big.repartition(32))
    assert(e1 === e32)
    assert(e1 === eRand)
  }

  test("salted aggregation equals the plain aggregation") {
    val plain = operators.TextOps.qTokenHistogram.fn(spark, sf)
    val salted = Extras.qSaltedHistogram.fn(spark, sf)
    assert(plain.except(salted).count() === 0)
    assert(salted.except(plain).count() === 0)
  }

  test("KV + chunking integration: chunked documents round-trip through the store") {
    val store = new KvStore(spark, Files.createTempDirectory("kvdocs").toString, 64)
    // chunk every doc payload as a streaming transfer would (S7/T1),
    // put through the chunk-reassembly path, read back and digest-check
    val chunkSize = 128
    val docs = Tables
      .documents(spark, sf)
      .filter($"doc_id" < 50)
      .select(concat(lit("doc/"), $"doc_id").as("key"),
        encode($"text", "UTF-8").as("bin"))
    val chunks = docs.select(
      $"key",
      posexplode(
        org.apache.spark.sql.functions.transform(
          sequence(lit(0),
            ceil(length($"bin") / lit(chunkSize.toDouble)).cast("int") - 1),
          i => $"bin".substr(i * chunkSize + 1, lit(chunkSize))))
        .as(Seq("chunk_id", "chunk")))
    store.putChunked(chunks)
    val roundtrip = store
      .read()
      .select($"key", md5($"value").as("got"))
    val expected = docs.select($"key", md5($"bin").as("want"))
    val joined = roundtrip.join(expected, "key")
    assert(joined.count() === 50)
    assert(joined.filter($"got" =!= $"want").count() === 0)
  }

  test("funnel steps are monotone and strictly ordered") {
    val r = operators.Events.qFunnel.fn(spark, sf).collect().head
    val (viewed, clicked, purchased) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(viewed >= clicked && clicked >= purchased,
      s"funnel must shrink: $viewed/$clicked/$purchased")
    assert(viewed > 0)
    // strict ordering bites: users with a purchase but no prior click
    // must NOT count — compare against the unordered upper bound
    val loose = Tables
      .events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id")
      .distinct()
      .count()
    assert(purchased <= loose)
  }

  test("cohort retention: offset-0 equals cohort size, counts decay-bounded") {
    val rows = operators.Events.qCohortRetention.fn(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_._1)
    val totalUsers = Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    // offset 0 exists for every cohort (a user is active on their first day)
    byCohort.foreach { case (c, rs) =>
      val off = rs.map(_._2)
      assert(off.contains(0L), s"cohort $c lacks offset 0")
      val base = rs.find(_._2 == 0L).get._3
      rs.foreach(r => assert(r._3 <= base,
        s"cohort $c offset ${r._2}: ${r._3} exceeds base $base"))
    }
    // cohorts partition the user population
    assert(byCohort.values.map(_.find(_._2 == 0L).get._3).sum === totalUsers)
  }
}
