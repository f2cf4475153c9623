package graft.sources

import graft.functions.TextFunctions.{shingles, stableHash60, words}
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent inverted shingle index — the EXISTING-CORPUS side of
  * incremental (cross-corpus) dedup as a STORED artifact, the way
  * [[EmbeddingIndex]] stores the ANN side. `q_crosscorpus_dedup`
  * recomputes the corpus postings per run (fine for a gate); a real
  * 100 TB ingest pipeline builds this index ONCE, then near-dup-checks
  * each arriving batch against it with a bucket-pruned join — the
  * reference's put-path bucket layout (local_file_kv_store.rs:62-70)
  * applied to the dedup plane.
  *
  * Layout: parquet partitioned by `bucket = stable_hash60(shingle) %
  * nBuckets`, rows (s, doc_id, n) with `n` the owning document's
  * distinct-shingle count DENORMALIZED into every posting, so Jaccard
  * needs no second lookup against a doc-stats table at query time.
  *
  * Scale properties:
  *  - a batch touches only the buckets its own shingles hash into —
  *    partition pruning bounds index I/O by the BATCH size, not the
  *    corpus size (spec-asserted on the scan's PartitionFilters);
  *  - `append` is a partition-local parquet append — ingest never
  *    rewrites the index;
  *  - the hot-shingle DF cap is applied on the QUERY side (batch ∪
  *    index posting counts), so appends can't silently revive a shingle
  *    the cap would drop.
  */
class ShingleIndex(spark: SparkSession, indexDir: String, nBuckets: Int = 64) {
  import spark.implicits._

  /** Distinct 3-gram shingle postings (doc_id, s, n) for a documents
    * slice — `n` = that document's distinct-shingle count. */
  private def postings(docs: DataFrame): DataFrame = {
    val ds = docs
      .select($"doc_id", words($"text").as("w"))
      .select($"doc_id", explode(array_distinct(shingles($"w", 3))).as("s"))
    val cnt = ds.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    ds.join(cnt, "doc_id")
  }

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("bucket", pmod(stableHash60($"s"), lit(nBuckets.toLong)))

  /** Build the index from the existing corpus (one pass + one shuffle on
    * the partition write). */
  def build(docs: DataFrame): Unit =
    withBucket(postings(docs))
      .select($"s", $"doc_id", $"n", $"bucket")
      .write
      .partitionBy("bucket")
      .mode("overwrite")
      .parquet(indexDir)

  /** Incremental ingest: append a new slice's postings into the same
    * bucket layout. Partition-local — existing files are untouched. */
  def append(docs: DataFrame): Unit =
    withBucket(postings(docs))
      .select($"s", $"doc_id", $"n", $"bucket")
      .write
      .partitionBy("bucket")
      .mode("append")
      .parquet(indexDir)

  /** Per-bucket balance report: postings, distinct shingles, and distinct
    * documents per bucket — the monitoring surface that catches bucket
    * skew (a boilerplate shingle family hashing into one bucket) before
    * it turns matchBatch's pruned reads into one giant partition.
    * Aggregate-sized output (≤ nBuckets rows); one scan of the index. */
  def stats(): DataFrame =
    spark.read
      .parquet(indexDir)
      .groupBy($"bucket")
      .agg(
        count(lit(1)).as("n_postings"),
        countDistinct($"s").as("n_shingles"),
        countDistinct($"doc_id").as("n_docs"))
      .orderBy($"bucket")

  /** Near-dup-check an arriving batch against the stored corpus: emits,
    * per batch document with a Jaccard ≥ `minJaccard` match, its best
    * indexed match (highest Jaccard, ties to the smallest doc_id) —
    * `q_crosscorpus_dedup`'s semantics, which the spec asserts against
    * that query's oracle-gated output at fixture scale (where the DF cap
    * provably no-ops, so the two definitions coincide).
    *
    * When the cap DOES trigger (production boilerplate), the two
    * definitions diverge by design: the gated query recounts `n` from
    * capped postings, while this index keeps the stored FULL per-doc
    * counts (the capped recount is impossible here — bucket pruning
    * never sees an old document's postings outside the touched buckets).
    * The result is strictly CONSERVATIVE w.r.t. true Jaccard: `common`
    * is undercounted by dropped hot shingles while the denominator uses
    * exact set sizes, so jac_est ≤ true jaccard — a hot shingle can
    * suppress a borderline match but can never mint a false one, the
    * right failure direction for an ingest pre-screen that feeds an
    * exact verify.
    *
    * The index read is pruned to the buckets the BATCH's shingles hash
    * into (driver-side distinct over ≤ nBuckets values), so index I/O
    * scales with the batch. The DF cap is evaluated over the combined
    * (index ∪ batch) posting counts before the join, same bound as
    * [[graft.operators.Dedup.cappedPostings]]. */
  def matchBatch(batch: DataFrame, minJaccard: Double = 0.8,
      dfCap: Int = Dedup.JaccardDfCap): DataFrame = {
    // checkpoint: the batch postings subtree otherwise executes three
    // times (bucket collect, hot-union branch, probe branch) — the same
    // double-execution shape fixed in Dedup.connectedComponents
    val bp = withBucket(postings(batch))
      .select($"doc_id".as("new_doc"), $"s", $"n".as("n_new"), $"bucket")
      .localCheckpoint()
    // the batch's bucket set is ≤ nBuckets values — driver-cheap, and it
    // turns the index read into a partition-pruned scan
    val buckets = bp.select($"bucket").distinct().as[Long].collect()
    val idx = spark.read
      .parquet(indexDir)
      .filter($"bucket".isin(buckets.toIndexedSeq: _*))
      .select($"s", $"doc_id".as("old_doc"), $"n".as("n_old"))
    // query-side DF cap over index ∪ batch postings for the touched
    // buckets: a shingle hot across EITHER side is boilerplate
    val hot = idx
      .select($"s")
      .unionAll(bp.select($"s"))
      .groupBy($"s")
      .agg(count(lit(1)).as("df"))
      .filter($"df" > dfCap)
      .select($"s")
    val w = Window.partitionBy($"new_doc").orderBy($"jac".desc, $"old_doc")
    bp.join(broadcast(hot), Seq("s"), "left_anti")
      .join(idx.join(broadcast(hot), Seq("s"), "left_anti"), "s")
      .groupBy($"new_doc", $"old_doc")
      .agg(count(lit(1)).as("common"), first($"n_new").as("n_new"),
        first($"n_old").as("n_old"))
      .withColumn("jac",
        $"common" * lit(1.0) / ($"n_new" + $"n_old" - $"common"))
      .filter($"jac" >= minJaccard)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"new_doc", $"old_doc".as("dup_of"),
        round($"jac", 4).as("jaccard"))
  }
}
