package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Spark 4 keeps `Dataset.ofRows` and `Dataset.logicalPlan`
  * `private[sql]`. Building a DataFrame over a custom LogicalPlan (the
  * supported extension path for whole-operator semantics) needs both, so
  * this bridge exposes them from an `org.apache.spark.sql` subpackage —
  * same pattern as [[ColumnBridge]], no Spark internals modified.
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** `localCheckpoint()` that also DROPS the origin plan's statistics.
    *
    * `Dataset.localCheckpoint` truncates lineage but copies the
    * checkpointed plan's `Statistics` into the resulting `LogicalRDD`
    * (`originStats`, kept so broadcast decisions survive the cut). For
    * ITERATED checkpoints whose plan joins the previous round's
    * checkpoint with itself — connected components' pointer-jumping
    * `label(label(n))` self-join — that inheritance is an exponential
    * trap: `SizeInBytesOnlyStatsPlanVisitor.visitJoin` estimates a join
    * as the PRODUCT of its children's sizeInBytes, so round N's stats
    * are ~(round N−1)⁴ and the BigInteger's bit-length QUADRUPLES per
    * round. By round ~15 sizeInBytes has ~10⁸ digits and every round's
    * planning spends MINUTES of driver CPU inside Toom-Cook
    * multiplication (jstack: `BigInteger.multiplyToomCook3` under
    * `visitJoin`, all executors idle) — the r9 scale probe measured the
    * 10× embed-dedup corpus DNF'ing at a 900 s wall on 42M candidate
    * pairs of actual work. Dropping `originStats` resets each round's
    * leaves to `defaultSizeInBytes`, so per-round stats are a bounded
    * product of a few Long-sized terms forever; the loop's joins are
    * key-partitioned exchanges either way (never broadcast-eligible), so
    * plan CHOICE is unchanged.
    */
  def localCheckpointFreshStats(df: DataFrame): DataFrame = {
    val spark =
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val ck = df.localCheckpoint()
    ck.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        org.apache.spark.sql.classic.Dataset.ofRows(
          spark,
          lr.copy()(
            session = spark, originStats = None, originConstraints = None))
      case _ => ck
    }
  }
}
