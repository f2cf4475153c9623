package graft

import graft.plans.SortedIntersect
import org.apache.spark.sql.functions._

/** Pins [[graft.plans.SortedLongIntersectCount]] — the verify kernel
  * behind the prefix-filter dedup family's hash-array rewrite (r12):
  * set semantics identical to `size(array_intersect)`, codegen and
  * interpreted paths agree, and the rewritten verify produces the
  * same common counts as the string-postings join it replaced. */
class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  test("matches size(array_intersect) on random sorted arrays with duplicates") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(300) {
      // small value domain so overlaps AND duplicate runs are common
      val a = Array.fill(rnd.nextInt(40))(rnd.nextInt(25).toLong).sorted
      val b = Array.fill(rnd.nextInt(40))(rnd.nextInt(25).toLong).sorted
      (a, b)
    }
    val df = rows.toDF("a", "b").select(
      SortedIntersect.count($"a", $"b").as("got"),
      size(array_intersect($"a", $"b")).cast("long").as("want"))
    assert(df.filter($"got" =!= $"want").count() === 0)
  }

  test("empty and disjoint arrays count 0; null yields null") {
    val df = Seq(
      (Some(Array.empty[Long]), Some(Array.empty[Long])),
      (Some(Array(1L, 2L, 3L)), Some(Array(4L, 5L))),
      (Some(Array(1L, 2L, 3L)), None: Option[Array[Long]]))
      .toDF("a", "b")
      .select(SortedIntersect.count($"a", $"b").as("c"))
    val rows = df.collect()
    assert(rows(0).getLong(0) === 0L)
    assert(rows(1).getLong(0) === 0L)
    assert(rows(2).isNullAt(0))
  }

  test("duplicate runs on either side count once (set semantics)") {
    val got = Seq((Array(1L, 1L, 2L, 2L, 2L, 5L), Array(1L, 2L, 2L, 3L)))
      .toDF("a", "b")
      .select(SortedIntersect.count($"a", $"b"))
      .head().getLong(0)
    assert(got === 2L)
  }

  test("expression survives both codegen and interpreted paths") {
    val df = Seq((Array(1L, 3L, 7L, 9L), Array(3L, 4L, 9L, 11L)))
      .toDF("a", "b")
      .select(SortedIntersect.count($"a", $"b").as("c"))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      assert(df.head().getLong(0) === 2L)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(df.head().getLong(0) === 2L)
  }

  test("null ELEMENTS are skipped, both eval paths (r12+r13 ADVICE)") {
    // SQL equality semantics: a null element never matches anything
    // (array_intersect would match null to null — deliberately NOT
    // parity here). sort_array places nulls first, but the function is
    // registered on the SQL plane where callers control element order,
    // so mid-run nulls must also hold: a null interrupting a duplicate
    // run on BOTH sides ([1,null,1] vs [1,null,1]) must not restart the
    // run and count the value twice (r13 ADVICE — the run advance now
    // steps over nulls).
    val df = Seq(
      (Seq[Option[Long]](None, Some(1L), Some(3L), Some(7L)),
        Seq[Option[Long]](None, None, Some(3L), Some(7L), Some(9L))),
      (Seq[Option[Long]](Some(1L), Some(1L), None, Some(2L)),
        Seq[Option[Long]](Some(1L), Some(2L))),
      (Seq[Option[Long]](Some(1L), None, Some(1L)),
        Seq[Option[Long]](Some(1L), None, Some(1L))))
      .toDF("a", "b")
      .select(graft.plans.SortedIntersect.count($"a", $"b").as("c"))
    val want = Seq(2L, 2L, 1L)
    // genuinely interpreted: wholeStage=false alone still compiles
    // expressions through the FALLBACK codegen factory (r13 ADVICE) —
    // NO_CODEGEN is what actually routes through nullSafeEval. Restore
    // the prior conf values rather than hardcoding them.
    val wsKey = "spark.sql.codegen.wholeStage"
    val fmKey = "spark.sql.codegen.factoryMode"
    val ws0 = spark.conf.get(wsKey)
    val fm0 = spark.conf.get(fmKey, "FALLBACK")
    spark.conf.set(wsKey, "false")
    spark.conf.set(fmKey, "NO_CODEGEN")
    try assert(df.collect().map(_.getLong(0)).toSeq === want)
    finally {
      spark.conf.set(wsKey, ws0)
      spark.conf.set(fmKey, fm0)
    }
    assert(df.collect().map(_.getLong(0)).toSeq === want)
  }

  test("mid-run null handled on the codegen nullable path too (r13 ADVICE)") {
    // same rows as the interpreted pin, default confs (codegen path):
    // the nullable-element specialization's run advance must skip nulls
    val got = Seq(
      (Seq[Option[Long]](Some(1L), None, Some(1L), Some(4L)),
        Seq[Option[Long]](Some(1L), None, Some(1L), Some(9L))))
      .toDF("a", "b")
      .select(graft.plans.SortedIntersect.count($"a", $"b").as("c"))
      .head().getLong(0)
    assert(got === 1L)
  }

  test("SQL plane: null elements in a nullable array do not miscount") {
    graft.plans.GraftExtensions.register(spark)
    val got = spark
      .sql("""SELECT sorted_intersect_count(
             |  array(CAST(NULL AS BIGINT), 2L, 8L), array(2L, 8L, 9L)) AS c""".stripMargin)
      .head().getLong(0)
    assert(got === 2L)
  }

  test("a forced 64-bit collision inflates common by exactly one (r12 VERDICT #5)") {
    // The hash-array verify's accepted ~ℓ²/2⁶⁵ error term
    // (Dedup.scala prefixFilterPairs): two DISTINCT shingles whose
    // xxhash64 values collide become one shared array value. Construct
    // the collision directly — doc A's shingles hash to {5,10,20},
    // doc B's to {10,30}, where 10 stands for two DIFFERENT strings —
    // and pin the shape: count = true string-level common (0) + 1.
    // The error is one-sided: common (and so jaccard) can only
    // inflate, i.e. a false MERGE across the 0.8 threshold, never a
    // false split.
    val got = Seq((Array(5L, 10L, 20L), Array(10L, 30L)))
      .toDF("a", "b")
      .select(graft.plans.SortedIntersect.count($"a", $"b"))
      .head().getLong(0)
    val trueStringCommon = 0L
    assert(got === trueStringCommon + 1L)
  }

  test("firstCommon: first common value, null when disjoint (r14 prefix emission)") {
    val df = Seq(
      (Some(Array(1L, 3L, 7L)), Some(Array(2L, 3L, 9L))),
      (Some(Array(5L, 8L)), Some(Array(1L, 2L))),
      (Some(Array.empty[Long]), Some(Array(1L))),
      (Some(Array(4L, 4L, 6L)), Some(Array(4L, 6L))),
      (Some(Array(1L)), None: Option[Array[Long]]))
      .toDF("a", "b")
      .select(SortedIntersect.firstCommon($"a", $"b").as("c"))
    val rows = df.collect()
    assert(rows(0).getLong(0) === 3L)
    assert(rows(1).isNullAt(0), "disjoint arrays yield null")
    assert(rows(2).isNullAt(0), "empty side yields null")
    assert(rows(3).getLong(0) === 4L, "duplicates do not confuse the scan")
    assert(rows(4).isNullAt(0), "null input yields null")
  }

  test("firstCommon: null elements skipped on both eval paths") {
    val df = Seq(
      (Seq[Option[Long]](None, Some(2L), Some(5L)),
        Seq[Option[Long]](None, Some(2L), Some(9L))))
      .toDF("a", "b")
      .select(SortedIntersect.firstCommon($"a", $"b").as("c"))
    assert(df.head().getLong(0) === 2L)
    val wsKey = "spark.sql.codegen.wholeStage"
    val fmKey = "spark.sql.codegen.factoryMode"
    val ws0 = spark.conf.get(wsKey)
    val fm0 = spark.conf.get(fmKey, "FALLBACK")
    spark.conf.set(wsKey, "false")
    spark.conf.set(fmKey, "NO_CODEGEN")
    try assert(df.head().getLong(0) === 2L)
    finally {
      spark.conf.set(wsKey, ws0)
      spark.conf.set(fmKey, fm0)
    }
  }

  test("SQL plane: sorted_intersect_count is registered") {
    graft.plans.GraftExtensions.register(spark)
    val got = spark
      .sql("SELECT sorted_intersect_count(array(1L, 2L, 8L), array(2L, 8L, 9L)) AS c")
      .head().getLong(0)
    assert(got === 2L)
  }

  test("hash-array verify counts equal the string-postings join on fixture docs") {
    import graft.functions.TextFunctions._
    val docs = Tables.documents(spark, sf).limit(400)
    val posts = docs
      .select($"doc_id", words($"text").as("w"))
      .select($"doc_id", explode(array_distinct(shingles($"w", 3))).as("s"))
    // all cross pairs over a small slice: common counted two ways
    val ids = posts.select($"doc_id").distinct().limit(40)
    val pairs = ids.as("x").join(ids.as("y"), $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("d1"), $"y.doc_id".as("d2"))
    val byString = pairs
      .join(posts.as("p1"), $"d1" === $"p1.doc_id")
      .join(posts.as("p2"), $"d2" === $"p2.doc_id" && $"p1.s" === $"p2.s")
      .groupBy($"d1", $"d2").agg(count(lit(1)).as("common"))
    val hashed = posts.groupBy($"doc_id")
      .agg(sort_array(collect_list(xxhash64($"s"))).as("sh"))
    val byHash = pairs
      .join(hashed.as("h1"), $"d1" === $"h1.doc_id")
      .join(hashed.as("h2"), $"d2" === $"h2.doc_id")
      .select($"d1", $"d2",
        SortedIntersect.count($"h1.sh", $"h2.sh").as("common"))
      .filter($"common" > 0)
    assert(byString.except(byHash).count() === 0)
    assert(byHash.except(byString).count() === 0)
    // and the overlap is non-trivial on the fixture slice
    assert(byHash.count() > 0)
  }
}
