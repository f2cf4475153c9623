package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native as-of join — the one temporal operator Spark's logical algebra
  * cannot express directly (SURVEY §2.3 "ABSENT" list; preference order
  * (c): custom LogicalPlan + Strategy + SparkPlan, used only because (a)
  * composition exists but costs an extra full window pass over the
  * unioned streams).
  *
  * Semantics: for every left row, the right row with the same key and the
  * greatest time strictly before (or at, when `strict = false`) the left
  * row's time — LEFT OUTER, so unmatched left rows carry nulls. This is
  * DuckDB/kdb ASOF JOIN; the DuckDB oracle of `q_asof_join` gates the
  * implementation end-to-end.
  *
  * Physical shape (the part that matters at 100 TB): both sides declare
  * `ClusteredDistribution(key)` and per-partition `(key, time)` ordering,
  * so EnsureRequirements co-partitions them exactly like a sort-merge
  * join — ONE exchange per side — and the merge itself is a single
  * forward pass per partition holding ONE candidate row of state. No
  * window buffer, no unioned stream, no per-probe backward scan.
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    strict: Boolean,
    rightTieBreak: Seq[Expression] = Nil)
  extends org.apache.spark.sql.catalyst.plans.logical.BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: logical [[AsofJoin]] → [[AsofJoinExec]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, strict, tb) =>
      AsofJoinExec(lk, rk, lt, rt, strict, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    strict: Boolean,
    rightTieBreak: Seq[Expression],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // same co-partitioning contract as SortMergeJoinExec: cluster each side
  // on its key, sort within partitions by (key, time[, tiebreak…]) — the
  // tiebreak makes "last usable right row wins" deterministic when two
  // right rows share a (key, time); without one, the winner would follow
  // nondeterministic shuffle-fetch order
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))
  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lExprs = Seq(leftKey, leftTime)
    val rExprs = Seq(rightKey, rightTime)
    val lOut = left.output
    val rOut = right.output
    val keyDt = leftKey.dataType
    val timeDt = leftTime.dataType
    val keyCmp = AsofJoinExec.comparator(keyDt)
    val timeCmp = AsofJoinExec.comparator(timeDt)
    val isStrict = strict
    val nRight = rOut.length
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // codegen'd (key, time) extraction — one generated projection call
      // per row instead of two interpreted expression evals
      val lProj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(lExprs, lOut)
      val rProj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(rExprs, rOut)
      // parents (shuffles, sorts, collect) require UnsafeRow — a raw
      // JoinedRow would ClassCastException there, same reason
      // SortMergeJoinExec ends with a result projection
      val resultProj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(outAttrs, outAttrs)
      val joinedRow = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      // single-row state: the lookahead right row (with its key/time
      // projected ONCE — a halted head is re-examined by every subsequent
      // left row) and the best candidate for the key being merged
      var rHead: InternalRow = null
      var rHeadKey: Any = null
      var rHeadTime: Any = null
      var cand: InternalRow = null
      var candKey: Any = null
      def advance(): Unit =
        if (rIter.hasNext) {
          rHead = rIter.next()
          val kt = rProj(rHead)
          // the projection buffer is reused — copy buffer-backed keys out
          rHeadKey =
            if (kt.isNullAt(0)) null else AsofJoinExec.copyKey(kt.get(0, keyDt))
          rHeadTime = if (kt.isNullAt(1)) null else kt.get(1, timeDt)
        } else { rHead = null; rHeadKey = null; rHeadTime = null }
      advance()
      lIter.map { l =>
        val lkt = lProj(l)
        val lk = if (lkt.isNullAt(0)) null else lkt.get(0, keyDt)
        val lt = if (lkt.isNullAt(1)) null else lkt.get(1, timeDt)
        if (lk != null && lt != null) {
          var halt = false
          while (!halt && rHead != null) {
            if (rHeadKey == null) advance() // null keys never match; sorted first
            else {
              val c = keyCmp(rHeadKey, lk)
              if (c < 0) advance() // earlier key — discard
              else if (c > 0) halt = true // later key — stop for this left row
              else if (rHeadTime == null) advance() // null time can never
              // qualify; it sorts FIRST within the key, so skipping it must
              // not halt the scan before the key's real rows
              else {
                val t = timeCmp(rHeadTime, lt)
                val ok = if (isStrict) t < 0 else t <= 0
                if (ok) {
                  // rows are UnsafeRow buffers reused by the iterator —
                  // the kept candidate must be copied out
                  cand = rHead.copy()
                  candKey = rHeadKey
                  advance()
                } else halt = true
              }
            }
          }
        }
        val matched = lk != null && cand != null && keyCmp(candKey, lk) == 0
        resultProj(joinedRow(l, if (matched) cand else nullRight))
      }
    }
  }
}

object AsofJoinExec {
  /** Comparator over the key/time types the operator supports — built
    * from public DataType matches only (AtomicType orderings are
    * private[sql]). */
  private[graft] def comparator(dt: DataType): (Any, Any) => Int = dt match {
    case LongType | TimestampType | TimestampNTZType =>
      (a, b) => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case IntegerType | DateType =>
      (a, b) => java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case ShortType =>
      (a, b) => java.lang.Short.compare(a.asInstanceOf[Short], b.asInstanceOf[Short])
    case DoubleType =>
      (a, b) => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case FloatType =>
      (a, b) => java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
    case StringType =>
      (a, b) => a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    case other =>
      throw new IllegalArgumentException(s"asof join: unsupported type $other")
  }

  private def copyKey(k: Any): Any = k match {
    case s: UTF8String => s.clone()
    case other => other
  }
}
