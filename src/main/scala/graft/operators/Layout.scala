package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.stableHash60
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-layout / placement operators — the decisions that dominate cost at
  * 100 TB before any query runs: how rows are clustered into files
  * (Z-order), how small files are compacted into target-size bins, where
  * shards live when the node set changes (rendezvous hashing), and
  * whether a join key is skewed enough to need salting.
  *
  * These are the Spark-side analogs of the reference's placement layer
  * (hash path routing, /root/reference/common/src/kv_store/mod.rs) lifted
  * from single-key routing to corpus-scale layout planning.
  *
  * Scale design (100 TB):
  *  - Z-order values are pure per-row bit arithmetic fused into the scan;
  *    the only exchange is the final per-file aggregate. On a real
  *    cluster the z-value feeds `repartitionByRange` + sortWithinPartitions
  *    so parquet min/max stats prune on BOTH dimensions.
  *  - The compaction plan is a per-prefix cumulative sum (one window over
  *    data already grouped by its directory prefix) — no global state;
  *    every prefix plans independently, which is exactly how a 100 TB
  *    compactor fans out.
  *  - Rendezvous (HRW) routing needs no coordination state at all: owner
  *    = argmax over nodes of hash(node, key). Node sets are O(100) and
  *    broadcast; re-placement on node loss moves ONLY the lost node's
  *    keys (the minimal-movement property the spec pins).
  *  - The skew report is the pre-join audit: per-key counts aggregate
  *    map-side, and the output is O(relations), not O(keys).
  */
object Layout {

  private val ZBits = 8

  /** Interleaved 16-bit Morton code of two 8-bit dims, emitted as the
    * same closed-form bit expression in both dialects. */
  private def zInterleaveSpark(x: Column, y: Column): Column =
    (0 until ZBits)
      .map { i =>
        (shiftleft(shiftrightunsigned(x, i) % 2, 2 * i + 1)
          + shiftleft(shiftrightunsigned(y, i) % 2, 2 * i))
      }
      .reduce(_ + _)

  private def zInterleaveSql(x: String, y: String): String =
    (0 until ZBits)
      .map { i =>
        s"((($x >> $i) & 1) * ${1L << (2 * i + 1)} + (($y >> $i) & 1) * ${1L << (2 * i)})"
      }
      .mkString(" + ")

  /** Z-order layout audit over `documents`: cluster rows by the Morton
    * interleave of (length bucket, id bucket), cut files of 512
    * z-contiguous rows, and report — for the predicate
    * `n_chars BETWEEN 256 AND 511` (length-bucket 16..31) — how many
    * files a min/max-stats reader must touch under z-order versus the
    * naive row-order layout. Z-order keeps BOTH dims range-local per
    * file, so the length predicate prunes most files even though the
    * layout is also clustered by id; row-order prunes nothing unless
    * ingest order happened to correlate.
    *
    * The audit IS the production decision: at 100 TB you write the
    * corpus `repartitionByRange(zval)` + sortWithinPartitions and let
    * parquet row-group stats do the skipping; this query measures the
    * skipping factor that layout buys before you pay for the rewrite.
    * Files are cut as fixed RANGES of the ordering value (z-range /
    * id-range), exactly what range partitioning produces — deliberately
    * NOT a global row_number window, which would serialize the corpus
    * through one task. */
  val qZorderLayout = QueryDef.sql(
    "q_zorder_layout", {
      val z = zInterleaveSql("xb", "yb")
      s"""WITH dims AS (
         |  SELECT doc_id,
         |         CAST(least(n_chars // 16, 255) AS BIGINT) AS xb,
         |         CAST(doc_id % 256 AS BIGINT) AS yb
         |  FROM documents),
         |n AS (SELECT count(*) AS n_rows FROM dims),
         |files AS (
         |  SELECT xb,
         |         ($z) // 256 AS zfile,
         |         doc_id // (1 + (n_rows - 1) // 256) AS rfile
         |  FROM dims, n),
         |zstats AS (
         |  SELECT zfile, min(xb) AS lo, max(xb) AS hi,
         |         sum(CASE WHEN xb BETWEEN 16 AND 31 THEN 1 ELSE 0 END) AS hit_rows
         |  FROM files GROUP BY zfile),
         |rstats AS (
         |  SELECT rfile, min(xb) AS lo, max(xb) AS hi,
         |         sum(CASE WHEN xb BETWEEN 16 AND 31 THEN 1 ELSE 0 END) AS hit_rows
         |  FROM files GROUP BY rfile),
         |audit AS (
         |  SELECT 'zorder' AS layout, count(*) AS n_files,
         |         CAST(sum(CASE WHEN hi >= 16 AND lo <= 31 THEN 1 ELSE 0 END) AS BIGINT) AS files_touched,
         |         CAST(sum(hit_rows) AS BIGINT) AS rows_matched
         |  FROM zstats
         |  UNION ALL
         |  SELECT 'roworder', count(*),
         |         CAST(sum(CASE WHEN hi >= 16 AND lo <= 31 THEN 1 ELSE 0 END) AS BIGINT),
         |         CAST(sum(hit_rows) AS BIGINT)
         |  FROM rstats)
         |SELECT layout, n_files, files_touched, rows_matched
         |FROM audit ORDER BY layout""".stripMargin
    }
  ) { (s, d) =>
    import s.implicits._
    val dims = Tables
      .documents(s, d)
      .select(
        $"doc_id",
        least(($"n_chars" / 16).cast("long"), lit(255L)).as("xb"),
        ($"doc_id" % 256).cast("long").as("yb"))
    val n = dims.agg(count(lit(1)).as("n_rows"))
    val files = dims
      .crossJoin(broadcast(n))
      .select(
        $"xb",
        (zInterleaveSpark($"xb", $"yb") / 256).cast("long").as("zfile"),
        ($"doc_id" / (lit(1) + ($"n_rows" - 1) / lit(256)).cast("long"))
          .cast("long")
          .as("rfile"))
    def stats(file: Column, name: String) =
      files
        .groupBy(file.as("f"))
        .agg(
          min($"xb").as("lo"),
          max($"xb").as("hi"),
          sum(when($"xb".between(16, 31), 1L).otherwise(0L)).as("hit_rows"))
        .agg(
          count(lit(1)).as("n_files"),
          sum(when($"hi" >= 16 && $"lo" <= 31, 1L).otherwise(0L))
            .as("files_touched"),
          sum($"hit_rows").as("rows_matched"))
        .select(lit(name).as("layout"), $"n_files", $"files_touched", $"rows_matched")
    stats($"zfile", "zorder")
      .unionAll(stats($"rfile", "roworder"))
      .orderBy($"layout")
  }

  /** Sequential compaction plan: within each group (directory prefix /
    * source), walk items in key order and cut output bins on the
    * cumulative byte stream — an item belongs to the bin its LAST byte
    * lands in (bin = floor((cumsum-1)/target)). A closed form, so the
    * whole plan is one per-group window + aggregates: a 100 TB listing
    * plans in a single pass, each prefix independently, no driver loop.
    * Bins can exceed `target` by at most one item's tail — the usual
    * compactor contract (target is a fill goal, not a hard cap). */
  def compactionPlan(
      items: DataFrame,
      group: Column,
      order: Column,
      size: Column,
      target: Long): DataFrame = {
    val w = Window.partitionBy(group).orderBy(order)
    items
      .withColumn("_grp", group)
      .withColumn("_sz", size)
      .withColumn("_cum", sum(size).over(w))
      .withColumn("bin", ((col("_cum") - lit(1)) / target).cast("long"))
  }

  /** Compaction plan over `documents` modeled as a small-file population
    * (each doc = one object of `n_chars` bytes under its source prefix),
    * packed into 32 KiB output bins per source. Per source: how many
    * inputs, how many outputs, and the mean output fill — the
    * read-amplification win a compactor buys. The bin rule is the
    * closed-form cumsum cut (bin = floor((cumsum-1)/target)), identical
    * in both dialects, so the plan is ONE window + ONE aggregate — a
    * 100 TB listing plans in a single pass with no driver loop. */
  val qCompactionPlan = QueryDef.sql(
    "q_compaction_plan",
    """WITH c AS (
      |  SELECT source, n_chars,
      |         (sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id) - 1) // 32768 AS bin
      |  FROM documents),
      |bins AS (
      |  SELECT source, bin, count(*) AS n_inputs, sum(n_chars) AS bytes
      |  FROM c GROUP BY source, bin)
      |SELECT source,
      |       CAST(sum(n_inputs) AS BIGINT) AS n_inputs,
      |       CAST(count(*) AS BIGINT) AS n_bins,
      |       round(avg(bytes) / 32768, 4) AS avg_fill
      |FROM bins GROUP BY source ORDER BY source""".stripMargin
  ) { (s, d) =>
    compactionSummary(Tables.documents(s, d), 32768L)
  }

  /** The per-source compaction summary over a (source, doc_id, n_chars)
    * file census — the ONE definition shared by [[qCompactionPlan]] and
    * the streaming maintenance loop
    * ([[graft.streaming.EventPipelines.compactionMaintenance]]), so the
    * streamed plan structurally cannot drift from the oracle-gated batch
    * query. */
  def compactionSummary(census: DataFrame, target: Long): DataFrame =
    compactionPlan(census, col("source"), col("doc_id"), col("n_chars"),
      target)
      .groupBy(col("_grp").as("source"), col("bin"))
      .agg(count(lit(1)).as("n_inputs"), sum(col("_sz")).as("bytes"))
      .groupBy(col("source"))
      .agg(
        sum(col("n_inputs")).cast("long").as("n_inputs"),
        count(lit(1)).as("n_bins"),
        round(avg(col("bytes")) / target, 4).as("avg_fill"))
      .orderBy(col("source"))

  /** Join-key skew report — the audit run BEFORE choosing a join
    * strategy: per candidate key, distinct-key count, rows, the heaviest
    * key's share, and p99 per-key multiplicity. A top-share over a few
    * percent at 100 TB means the plain hash join stalls on one reducer —
    * salt that key or enable AQE skew handling. Per-key counts aggregate
    * map-side; output is O(#relations). */
  val qSkewReport = QueryDef.sql(
    "q_skew_report",
    """WITH uk AS (
      |  SELECT CAST(user_id AS VARCHAR) AS k FROM events),
      |ok AS (
      |  SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
      |stats AS (
      |  SELECT 'events.user_id' AS rel, count(*) AS cnt
      |  FROM uk GROUP BY k
      |  UNION ALL
      |  SELECT 'lineitem.l_orderkey', count(*) FROM ok GROUP BY k)
      |SELECT rel,
      |       CAST(count(*) AS BIGINT) AS n_keys,
      |       CAST(sum(cnt) AS BIGINT) AS n_rows,
      |       CAST(max(cnt) AS BIGINT) AS max_key_rows,
      |       round(max(cnt) * 1.0 / sum(cnt), 6) AS top_share,
      |       round(quantile_cont(cnt, 0.99), 2) AS p99_key_rows
      |FROM stats GROUP BY rel ORDER BY rel""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    def keyCounts(df: DataFrame, key: Column, rel: String) =
      df.groupBy(key.cast("string").as("k"))
        .agg(count(lit(1)).as("cnt"))
        .select(lit(rel).as("rel"), $"cnt")
    keyCounts(Tables.events(s, d), $"user_id", "events.user_id")
      .unionAll(
        keyCounts(Tables.lineitem(s, d), $"l_orderkey", "lineitem.l_orderkey"))
      .groupBy($"rel")
      .agg(
        count(lit(1)).as("n_keys"),
        sum($"cnt").cast("long").as("n_rows"),
        max($"cnt").cast("long").as("max_key_rows"),
        round(max($"cnt") * lit(1.0) / sum($"cnt"), 6).as("top_share"),
        round(expr("percentile(cnt, 0.99)"), 2).as("p99_key_rows"))
      .orderBy($"rel")
  }

  /** Rendezvous (highest-random-weight) owner of `key` among `nodes` —
    * coordination-free placement: owner = argmax over nodes of
    * stableHash60(node ++ ':' ++ key). */
  def rendezvousOwner(key: Column, nodes: Seq[String]): Column = {
    val scored = nodes.map(n =>
      struct(stableHash60(concat(lit(n), lit(":"), key)).as("h"), lit(n).as("node")))
    array_max(array(scored: _*)).getField("node")
  }

  /** HRW routing audit: place every document key on an 8-node ring, then
    * remove one node and measure movement. Rendezvous hashing moves ONLY
    * the lost node's keys (minimal movement — the property that makes
    * cluster resize at 100 TB a partial re-shard, not a full shuffle);
    * the `moved_from_survivor` column is the proof, pinned to zero.
    * Placement is pure per-row arithmetic over a literal node list —
    * fused into the scan, no join, no shuffle before the final 8-row
    * aggregate. */
  val qRendezvousRoute = QueryDef.sql(
    "q_rendezvous_route", {
      def owner(nodes: Seq[String]) = nodes
        .map(n =>
          s"{'h': CAST(concat('0x', substr(md5('$n:doc/' || doc_id), 1, 15)) AS BIGINT), 'node': '$n'}")
        .mkString("(list_max([", ", ", "])).node")
      val n8 = (0 until 8).map(i => s"n$i")
      s"""WITH placed AS (
         |  SELECT doc_id,
         |         ${owner(n8)} AS owner8,
         |         ${owner(n8.filterNot(_ == "n3"))} AS owner7
         |  FROM documents)
         |SELECT owner7 AS node,
         |       CAST(count(*) AS BIGINT) AS n_keys,
         |       CAST(sum(CASE WHEN owner8 <> owner7 THEN 1 ELSE 0 END) AS BIGINT) AS gained,
         |       CAST(sum(CASE WHEN owner8 <> owner7 AND owner8 <> 'n3' THEN 1 ELSE 0 END) AS BIGINT)
         |         AS moved_from_survivor
         |FROM placed GROUP BY owner7 ORDER BY node""".stripMargin
    }
  ) { (s, d) =>
    import s.implicits._
    val n8 = (0 until 8).map(i => s"n$i")
    val placed = Tables
      .documents(s, d)
      .select(
        $"doc_id",
        rendezvousOwner(concat(lit("doc/"), $"doc_id"), n8).as("owner8"),
        rendezvousOwner(concat(lit("doc/"), $"doc_id"), n8.filterNot(_ == "n3"))
          .as("owner7"))
    placed
      .groupBy($"owner7".as("node"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(when($"owner8" =!= $"owner7", 1L).otherwise(0L)).as("gained"),
        sum(when($"owner8" =!= $"owner7" && $"owner8" =!= "n3", 1L).otherwise(0L))
          .as("moved_from_survivor"))
      .orderBy($"node")
  }

  def defs: Seq[QueryDef] =
    Seq(qZorderLayout, qCompactionPlan, qSkewReport, qRendezvousRoute)
}
