package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("stableHash60 is stable across sessions (golden value)") {
    // md5('abc') = 900150983cd24fb0... → first 15 hex digits as decimal.
    val got = Seq("abc").toDF("s").select(stableHash60($"s")).head().getLong(0)
    assert(got === java.lang.Long.parseLong("900150983cd24fb", 16))
    assert(got === 648541476951500027L)
  }

  test("native stableHash60 equals the composable conv(md5) form on real data") {
    val composable =
      conv(substring(md5($"text"), 1, 15), 16, 10).cast("long")
    val diff = graft.Tables
      .documents(spark, sf)
      .select(stableHash60($"text").as("a"), composable.as("b"))
      .filter($"a" =!= $"b")
      .count()
    assert(diff === 0)
  }

  test("minhashBase stays within [0, P)") {
    val vals = Seq("a", "b", "c", "longer string here")
      .toDF("s")
      .select(minhashBase($"s").as("h"))
      .collect()
      .map(_.getLong(0))
    assert(vals.forall(h => h >= 0 && h < MinhashP))
  }

  test("shingles produce n-gram windows; short docs produce none") {
    val got = Seq("a b c d", "a b")
      .toDF("t")
      .select(shingles(words($"t"), 3).as("sh"))
      .collect()
      .map(_.getSeq[String](0))
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq.empty)
  }

  test("TokenizeGenerator equals posexplode(split) and handles edge inputs") {
    val df = Seq("a b  c", "", "   ", "single").toDF("t")
    val viaGen = df.select(graft.plans.TokenizeGenerator.tokenize($"t"))
    val viaSplit = df
      .filter(trim($"t") =!= "")
      .select(posexplode(split(trim($"t"), " +")).as(Seq("p0", "token")))
      .select(($"p0" + 1).cast("int").as("pos"), $"token")
    assert(viaGen.count() === 4) // 3 + 0 + 0 + 1
    assert(viaGen.except(viaSplit).count() === 0)
    assert(viaSplit.except(viaGen).count() === 0)
  }

  test("normText collapses whitespace and lowercases") {
    val got = Seq("  Hello   WORLD  ")
      .toDF("t")
      .select(normText($"t"))
      .head()
      .getString(0)
    assert(got === "hello world")
  }
}
