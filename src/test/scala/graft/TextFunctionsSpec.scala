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

  test("winnowing matches a plain-Scala reference implementation") {
    import graft.operators.CorpusOps
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().take(50)
    def hash60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
    }
    def winnowRef(text: String, w: Int = 4): Set[(Long, Long)] = {
      val words = text.trim.split(" +")
      if (words.length < 3) return Set.empty
      val hs = words.sliding(3).map(_.mkString(" "))
        .map(s => ((hash60(s) % 1099511627776L) + 1099511627776L)
          % 1099511627776L)
        .toArray
      (0 to hs.length - w).flatMap { p =>
        val keys = (p until p + w).map(j => hs(j) * 1048576L + (j + 1))
        val mk = keys.min
        Some((mk % 1048576L, mk / 1048576L)) // (sel_pos, h)
      }.toSet
    }
    val got = CorpusOps
      .winnowSketch(docs.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    docs.foreach { case (id, text) =>
      val expect = winnowRef(text)
      assert(got.getOrElse(id, Set.empty) === expect, s"doc $id sketch")
    }
  }

  test("winnowing guarantees shared fingerprints for shared 6-word runs") {
    import graft.operators.CorpusOps
    // two documents sharing an 8-word run embedded in different contexts:
    // the MOSS guarantee (t = w + k - 1 = 6 words here) says they MUST
    // share at least one selected hash
    val shared = "quick brown foxes jump over seven lazy dogs"
    val crafted = Seq(
      (1L, s"intro words before anything $shared and trailing text"),
      (2L, s"completely different opening here $shared with another end"),
      (3L, "nothing in common with either of the others at all truly"))
      .toDF("doc_id", "text")
    val sk = CorpusOps.winnowSketch(crafted, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert((sk(1L) intersect sk(2L)).nonEmpty,
      "docs sharing an 8-word run must share a fingerprint")
    assert((sk(1L) intersect sk(3L)).isEmpty,
      "unrelated docs must not collide on this fixture")
    // density: ~2/(w+1) of the shingle volume, loosely bounded
    val doc1Shingles = crafted.filter($"doc_id" === 1L)
      .select(explode(shingles(words($"text"), 3))).count()
    assert(sk(1L).size <= doc1Shingles,
      "sketch cannot exceed the shingle count")
    assert(sk(1L).size >= doc1Shingles / 4 - 1, "sketch too sparse")
  }

  test("NfcNormalize: composes combining marks, ASCII passes through, codegen'd") {
    import graft.plans.NfcNormalize.nfcNormalize
    val decomposed = "Café au lait" // e + combining acute
    val composed = "Café au lait"
    val df = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"), (4L, null))
      .toDF("id", "t")
      .select($"id", nfcNormalize($"t").as("n"))
    val out = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === composed, "NFD input must compose to NFC")
    assert(out(2L) === composed)
    assert(out(3L) === "plain ascii")
    assert(out(4L) === null, "null-safe")
    // identical strings after normalization hash identically — the dedup
    // property the expression exists for
    assert(
      df.filter($"id" <= 2).select(md5(encode($"n", "UTF-8"))).distinct().count() === 1)
    // the expression stays inside whole-stage codegen over a real scan
    // (a local literal table constant-folds, so probe the parquet path)
    val scanned = Tables
      .documents(spark, sf)
      .select(nfcNormalize($"text").as("n"))
    val plan = scanned.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [nfcnormalize"), plan)
    assert(scanned.count() > 0)
  }
}
