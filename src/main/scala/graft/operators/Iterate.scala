package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftbridge.DatasetBridge

/** Shared materialization primitive for iterative dataflows (connected
  * components, BFS relaxation, k-core peeling, label propagation).
  *
  * Every loop of this family needs, per round: (a) materialize the new
  * state so round N+1's plan does not replay rounds 1..N, and (b) read a
  * change count to decide termination. Doing those as two actions doubles
  * the driver round-trips — and at blow-up scale the loops are
  * round-overhead-bound (the r9 probe measured the x1000 embed-dedup CC
  * DNF'ing a 2400 s wall on ~120 small jobs). [[matObserve]] fuses them:
  * one eager checkpoint job both materializes the rows and fills the
  * observation's CollectMetrics accumulators, and the driver reads the
  * count from the completed job's metrics without a second scan.
  *
  * The checkpoint is the stats-dropping variant
  * ([[DatasetBridge.localCheckpointFreshStats]]): a plain localCheckpoint
  * inherits the origin plan's sizeInBytes, and a loop whose round plan
  * joins the state with itself raises that estimate to the ~4th power per
  * round until the driver spends minutes in BigInteger multiplication
  * under join-stats estimation (the other r9 probe catch).
  */
object Iterate {

  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Materialize `z` AND evaluate `metric` (an aggregate over `z`'s
    * rows, e.g. `count(when($"label" =!= $"old", lit(1)))`) in the SAME
    * Spark job; returns the checkpointed frame with `dropCols` removed,
    * and the metric value. */
  private[graft] def matObserve(z: DataFrame, metric: Column,
      dropCols: String*): (DataFrame, Long) = {
    val name = s"it_m_${seq.incrementAndGet()}"
    val obs = z.observe(name, metric.as("n"))
    val c = DatasetBridge.localCheckpointFreshStats(obs)
    val n = obs.queryExecution.observedMetrics(name).getLong(0)
    (c.drop(dropCols: _*), n)
  }
}
