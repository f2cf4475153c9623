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
}
