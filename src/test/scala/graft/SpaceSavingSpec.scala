package graft

import graft.functions.TextFunctions.words
import graft.plans.SpaceSavingAgg
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** SpaceSaving sketch laws, cross-checked against exact counts — the
  * contract that lets a 100 TB monitor ship k counter triples instead of
  * a vocabulary-wide shuffle: est ≥ true ≥ est − err, and every
  * φ-frequent item (true > n/k) is present in the summary, under ANY
  * partitioning of the input.
  */
class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  private def summarize(k: Int, parts: Int): Map[String, (Long, Long)] = {
    val toks = Tables
      .documents(spark, sf)
      .select(explode(words($"text")).as("t"))
      .repartition(parts)
    val arr = toks
      .agg(SpaceSavingAgg.spaceSavingTopK($"t", k).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.est", $"e.err")
      .collect()
    arr.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  private lazy val exact: Map[String, Long] = Tables
    .documents(spark, sf)
    .select(explode(words($"text")).as("t"))
    .groupBy($"t")
    .count()
    .collect()
    .map(r => r.getString(0) -> r.getLong(1))
    .toMap

  test("est >= true >= est - err, under several partitionings") {
    val n = exact.values.sum
    for (parts <- Seq(1, 3, 8)) {
      val sk = summarize(k = 256, parts = parts)
      assert(sk.nonEmpty && sk.size <= 256)
      sk.foreach { case (item, (est, err)) =>
        val t = exact.getOrElse(item, 0L)
        assert(est >= t, s"[$parts parts] $item: est $est < true $t")
        assert(est - err <= t, s"[$parts parts] $item: lower bound ${est - err} > true $t")
      }
      // every phi-heavy item must be tracked (phi = 1/k)
      exact.filter { case (_, c) => c * 256 > n }.keys.foreach { heavy =>
        assert(sk.contains(heavy), s"[$parts parts] heavy '$heavy' missing")
      }
    }
  }

  test("exact regime: k >= distinct items reproduces exact counts") {
    val k = exact.size + 10
    val sk = summarize(k = k, parts = 5)
    assert(sk.size === exact.size)
    sk.foreach { case (item, (est, err)) =>
      assert(est === exact(item), s"$item: $est != ${exact(item)}")
      assert(err === 0L)
    }
  }

  test("sketch contains every token q_heavy_hitters reports, in order") {
    val reported = operators.TextOps.qHeavyHitters
      .fn(spark, sf)
      .select($"token", $"cnt")
      .as[(String, Long)]
      .collect()
    assert(reported.nonEmpty, "fixture must have heavy tokens")
    val sk = summarize(k = 256, parts = 4)
    reported.foreach { case (tok, cnt) =>
      assert(sk.contains(tok), s"heavy '$tok' must be in the sketch")
      assert(sk(tok)._1 >= cnt)
    }
  }

  test("space_saving is callable from SQL via the extensions registry") {
    graft.plans.GraftExtensions.register(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("ss_docs")
    val out = spark
      .sql("""SELECT space_saving(t, 64) AS hh FROM
              (SELECT explode(split(trim(text), ' +')) AS t FROM ss_docs)""")
      .collect()
    assert(out.length === 1)
    val hh = out.head.getSeq[Row](0)
    assert(hh.nonEmpty && hh.length <= 64)
    // output is (est desc, item asc)
    val ests = hh.map(_.getLong(1))
    assert(ests === ests.sortBy(-_))
  }
}
