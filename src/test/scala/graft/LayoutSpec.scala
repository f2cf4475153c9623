package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Layout/placement contracts: Z-order actually buys file skipping,
  * compaction bins respect their byte-stream cut, and rendezvous routing
  * has the minimal-movement property that makes a node loss a partial
  * re-shard instead of a full shuffle.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("z-order files prune the length predicate; row-order files do not") {
    val rows = Layout.qZorderLayout.fn(spark, sf).collect()
    val byLayout = rows.map(r => r.getString(0) -> r).toMap
    val z = byLayout("zorder")
    val r = byLayout("roworder")
    // both layouts cover the same corpus and match the same rows
    assert(z.getLong(3) === r.getLong(3))
    // the predicate touches a strict subset of z-files...
    assert(z.getLong(2) < z.getLong(1))
    // ...and the z-layout skips a larger share of its files than
    // row-order (doc_id carries no length information, so row-order
    // files nearly all straddle the predicate range)
    val zShare = z.getLong(2).toDouble / z.getLong(1)
    val rShare = r.getLong(2).toDouble / r.getLong(1)
    assert(zShare < rShare, s"zorder $zShare must prune better than roworder $rShare")
  }

  test("compaction bins: contiguous per group, fill respects the byte cut") {
    val target = 4096L
    val plan = Layout
      .compactionPlan(
        Tables.documents(spark, sf),
        $"source",
        $"doc_id",
        $"n_chars",
        target)
      .select($"_grp", $"bin", $"_sz", $"_cum")
    val bins = plan
      .groupBy($"_grp", $"bin")
      .agg(sum($"_sz").as("bytes"), max($"_sz").as("max_item"))
      .collect()
    assert(bins.nonEmpty)
    bins.foreach { b =>
      // a bin holds the bytes of the cut range plus at most the tail of
      // the item straddling its lower boundary
      assert(
        b.getLong(2) <= target + b.getLong(3),
        s"bin ${b.get(0)}/${b.get(1)} overflows: ${b.getLong(2)}")
    }
    // bins are dense 0..max per group (no gaps — contiguous byte stream)
    val perGroup = bins.groupBy(_.getString(0))
    perGroup.foreach { case (g, bs) =>
      val ids = bs.map(_.getLong(1)).sorted
      assert(ids === (0L until ids.length).toArray, s"group $g bins not dense")
    }
  }

  test("rendezvous routing: minimal movement on node loss") {
    val rows = Layout.qRendezvousRoute.fn(spark, sf).collect()
    assert(rows.length === 7) // n3 removed
    // nothing moved between surviving nodes
    rows.foreach(r => assert(r.getLong(3) === 0L, s"survivor keys moved: $r"))
    // n3's keys were redistributed across survivors (gained > 0 somewhere)
    assert(rows.map(_.getLong(2)).sum > 0)
    // placement is deterministic
    val again = Layout.qRendezvousRoute.fn(spark, sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("rendezvous owner spreads keys roughly evenly") {
    val nodes = (0 until 8).map(i => s"n$i")
    val counts = Tables
      .documents(spark, sf)
      .select(Layout.rendezvousOwner(concat(lit("doc/"), $"doc_id"), nodes).as("n"))
      .groupBy($"n")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(counts.keySet.subsetOf(nodes.toSet))
    val total = counts.values.sum
    val mean = total.toDouble / 8
    // HRW over a 60-bit hash: no node should be wildly off the mean
    counts.values.foreach(c => assert(c > mean * 0.4 && c < mean * 2.5, counts))
  }

  test("skew report: shares and percentiles are internally consistent") {
    val rows = Layout.qSkewReport.fn(spark, sf).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val nKeys = r.getLong(1)
      val nRows = r.getLong(2)
      val maxRows = r.getLong(3)
      val share = r.getDouble(4)
      assert(nKeys <= nRows)
      assert(maxRows <= nRows)
      assert(math.abs(share - maxRows.toDouble / nRows) < 1e-4)
      assert(r.getDouble(5) <= maxRows.toDouble)
    }
  }
}
