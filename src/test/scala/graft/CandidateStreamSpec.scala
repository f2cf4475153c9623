package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Structural enforcement of the r11 scale rule: a data-quadratic
  * candidate stream may be STREAMED but never EXCHANGED (SCALE.md
  * "de-quadraticized twice"; VERDICT r11 task #5).
  *
  * The rule was established by audit: every banded self-join in the
  * dedup family (MinHash-LSH, pHash, prefix-filter sampled) emits each
  * candidate pair exactly once via a first-matching-band FILTER, or
  * caps it through a bounded-partial-state aggregate
  * ([[graft.plans.SmallestKAgg]]) — never a `distinct()` or a window,
  * both of which shuffle the raw (clique-quadratic) join output and
  * were the measured dense-x1000 ENOSPCs (scaleprobe-r11e/f). This
  * spec makes the audit structural: it walks each candidate producer's
  * physical plan from the root down to the FIRST binary node (the
  * banded self-join) and asserts every shuffle exchange on that path
  * is legitimized before the join by either
  *  - a graft.plans bounded-state aggregate partial (≤ k rows per
  *    group cross the wire), or
  *  - a Filter (the exchanged stream is then a verified/deduped
  *    derivative, not the raw multi-emission join output).
  * Reverting minhashCandidates (or phashPairs, or the sampled cap) to
  * a `distinct()` IN PLACE OF its emission filter / bounded aggregate
  * inserts HashAggregate→Exchange→HashAggregate above the join with
  * neither legitimizer — this spec goes red. (A distinct DOWNSTREAM of
  * an emission filter passes: that stream is already once-per-pair,
  * the adjudicated output-sized class — SCALE.md:1088.)
  */
class CandidateStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Walks root→first-binary-node; fails on an unlegitimized shuffle. */
  private def assertStreamedNotExchanged(df: DataFrame, what: String): Unit = {
    // the PREPARED physical plan (post-EnsureRequirements — sparkPlan
    // has no Exchange nodes yet), with AQE off so the tree is a plain
    // SparkPlan instead of an adaptive wrapper; structure only, no
    // execution needed
    val root = {
      val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try df.queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
    var sawJoin = false
    def walk(n: SparkPlan, pendingExchange: Boolean): Unit = {
      if (n.children.size == 2) {
        // the banded self-join (the only binary nodes in these plans
        // are joins); everything below is the linear code/sig builder
        sawJoin = true
        assert(!pendingExchange,
          s"$what: shuffle exchange above the candidate self-join with no " +
            s"bounded-aggregate or filter between — the raw candidate " +
            s"stream would cross the wire\n${root.treeString}")
      } else {
        val pending = n match {
          case _: ShuffleExchangeLike => true
          case f: FilterExec => false
          case o: ObjectHashAggregateExec
              if o.aggregateExpressions.exists(
                _.aggregateFunction.getClass.getName
                  .startsWith("graft.plans.")) =>
            false // bounded partial state: ≤ k values per group exchanged
          case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec
              if a.groupingExpressions.isEmpty &&
                a.aggregateExpressions.nonEmpty =>
            false // global aggregate partial: one row per partition
          case _ => pendingExchange
        }
        n.children.foreach(walk(_, pending))
      }
    }
    walk(root, pendingExchange = false)
    assert(sawJoin, s"$what: no join found — guard is vacuous\n${root.treeString}")
  }

  // NO limit(): GlobalLimit outputs SinglePartition, which satisfies
  // every required distribution — EnsureRequirements would then insert
  // no exchanges at all and every guard here would pass vacuously. The
  // walker never executes the plans, so full-table dfs cost nothing.
  private def docs = Tables.documents(spark, sf)

  test("MinHash-LSH candidates: first-matching-band, not distinct (r11 e3fb148)") {
    assertStreamedNotExchanged(
      graft.operators.CorpusOps.minhashCandidates(docs, "doc_id", "text"),
      "minhashCandidates")
  }

  test("pHash near-dup pairs: first-matching-band at both registry dials") {
    assertStreamedNotExchanged(
      graft.operators.Multimodal.phashPairs(docs, 64, 4, 3), "phashPairs 64/4")
    assertStreamedNotExchanged(
      graft.operators.Multimodal.phashPairs(docs, 256, 4, 16), "phashPairs 256/4")
  }

  test("pHash candidate count probe surface: filter + partial agg, no distinct") {
    assertStreamedNotExchanged(
      graft.operators.Multimodal.phashCandidateCount(docs, 64, 4),
      "phashCandidateCount")
  }

  test("sampled prefix-filter cap: bounded-partial-state aggregate, not a window") {
    // The samp stage of qPrefixFilterSampled, reconstructed as in
    // DedupSpec's window-equivalence test: the SmallestKAgg partial
    // must be the ONLY thing between the prefix self-join and its
    // exchange (the window/distinct forms were the r11f ENOSPC).
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.expressions.Window
    val posts = docs
      .select($"doc_id", words($"text").as("w"))
      .select($"doc_id", explode(array_distinct(shingles($"w", 3))).as("s"))
      .repartition(col("s"))
    val dfs = posts.groupBy($"s").agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy($"doc_id")
    val prefix = posts.join(dfs, "s")
      .select($"doc_id", $"s",
        row_number().over(byDoc.orderBy($"df", $"s")).as("r"),
        count(lit(1)).over(byDoc).as("n"))
      .filter($"r" <= $"n" - expr("(n * 4 + 4) div 5") + 1)
      .select($"doc_id", $"s", $"n")
    val samp = prefix.as("a")
      .join(prefix.as("b"),
        $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id" &&
          $"a.n" * 5 >= $"b.n" * 4 && $"b.n" * 5 >= $"a.n" * 4)
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"), $"a.n".as("n1"))
      .groupBy($"d1", $"n1")
      .agg(graft.plans.SmallestKAgg
        .smallestK($"d2", graft.operators.Dedup.PrefixSampleK).as("d2s"))
    assertStreamedNotExchanged(samp, "sampled prefix cap")
  }

  test("the guard itself goes red on a distinct() over a banded join") {
    // Self-test: the pre-r11 reverted shape the rule exists to catch —
    // a banded self-join whose output is deduped by distinct() INSTEAD
    // of an emission filter (distinct-downstream-of-the-filter is the
    // adjudicated output-sized class and rightly passes; the bad form
    // has no filter, so the raw multi-emission stream feeds the
    // distinct's exchange). Must FAIL the walker, else the guard is
    // decorative.
    val t = docs.select($"doc_id", pmod(xxhash64($"text"), lit(16)).as("bkey"))
    val bad = t.as("a").join(t.as("b"), $"a.bkey" === $"b.bkey")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .distinct()
    val caught = intercept[org.scalatest.exceptions.TestFailedException] {
      assertStreamedNotExchanged(bad, "reverted distinct form")
    }
    assert(caught.getMessage.contains("shuffle exchange above"))
  }
}
