package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count of DISTINCT common values between two ascending-sorted
  * LONG arrays — the verify kernel of the prefix-filter dedup family.
  *
  * Why it exists (SCALE.md r11 residual #1): the exact-Jaccard verify
  * used to join each candidate pair back to the full shingle postings,
  * so the pair stream crossed its exchange as (pair × common-shingle)
  * STRING rows — Θ(pairs · ℓ · bytes(shingle)) of shuffle, the stage
  * that exceeded one box's scratch on the dense x1000 probe. Carrying
  * each doc's shingle set once as a sorted 64-bit-hash array (~8ℓ B
  * per DOC instead of ~40ℓ B per PAIR) and counting the intersection
  * row-local shrinks that exchange ~7× at the fixture's ℓ≈52.
  *
  * The composable alternative `size(array_intersect(a, b))` allocates
  * and populates a hash set per ROW; this expression is a branch-only
  * merge scan over the two sorted arrays (no allocation, no boxing)
  * and stays inside whole-stage codegen.
  *
  * Duplicate runs on either side count once (set semantics), so the
  * result equals `size(array_intersect(a, b))` for any sorted inputs —
  * pinned by SortedIntersectSpec's property test. Inputs MUST be
  * ascending-sorted (`sort_array`); unsorted inputs undercount.
  *
  * NULL ELEMENTS are skipped — SQL equality semantics, a null never
  * equals anything (unlike `array_intersect`, which matches null to
  * null; r12 ADVICE: the old kernel called getLong unconditionally and
  * silently miscounted nullable arrays reaching the registered SQL
  * function). The duplicate-run advance steps over nulls as well, so a
  * null interrupting a run ([1,null,1] on both sides) still counts the
  * value once, matching the distinct-count contract even on the SQL
  * plane where callers control element order (r13 ADVICE; spec-pinned).
  * The internal pipeline's arrays come
  * from `collect_list(xxhash64(...))` whose element type is
  * non-nullable, so codegen specializes: only a containsNull=true
  * input type pays the per-element null branch; the hot dedup-verify
  * path keeps the branch-free scan.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got $other")
    }

  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xn = elemNullable(left)
    val yn = elemNullable(right)
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      if (xn && x.isNullAt(i)) i += 1
      else if (yn && y.isNullAt(j)) j += 1
      else {
        val xv = x.getLong(i)
        val yv = y.getLong(j)
        if (xv < yv) i += 1
        else if (xv > yv) j += 1
        else {
          c += 1
          // the run advance also steps OVER nulls: a null interrupting a
          // duplicate run ([1,null,1]) must not restart the run and count
          // the value twice (r13 ADVICE; pinned by SortedIntersectSpec) —
          // skipping it here is safe because the main loop skips nulls too
          while (i < n && ((xn && x.isNullAt(i)) || x.getLong(i) == xv)) i += 1
          while (j < m && ((yn && y.isNullAt(j)) || y.getLong(j) == yv)) j += 1
        }
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val c = ctx.freshName("c")
      // specialize: non-nullable element types (the internal
      // collect_list(xxhash64) pipeline) compile the null branches away
      val skipNullX =
        if (elemNullable(left)) s"if ($a.isNullAt($i)) { $i++; continue; }"
        else ""
      val skipNullY =
        if (elemNullable(right)) s"if ($b.isNullAt($j)) { $j++; continue; }"
        else ""
      // run advance steps over nulls too (see nullSafeEval): null-OR-equal
      // on nullable inputs, plain equality on the branch-free specialization
      val xRun =
        if (elemNullable(left)) s"($a.isNullAt($i) || $a.getLong($i) == $xv)"
        else s"$a.getLong($i) == $xv"
      val yRun =
        if (elemNullable(right)) s"($b.isNullAt($j) || $b.getLong($j) == $yv)"
        else s"$b.getLong($j) == $yv"
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0;
         |int $j = 0;
         |long $c = 0L;
         |while ($i < $n && $j < $m) {
         |  $skipNullX
         |  $skipNullY
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else {
         |    $c++;
         |    while ($i < $n && $xRun) { $i++; }
         |    while ($j < $m && $yRun) { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** FIRST common value between two ascending-sorted LONG arrays (null
  * when disjoint) — the exactly-once emission kernel of the
  * prefix-filter candidate join (r14).
  *
  * Why it exists: the prefix-filter self-join emits a candidate pair
  * once per shared prefix shingle; the r13 registry walker's
  * string-taint extension caught that multi-emission being deduped by
  * `distinct()` — a pair-sized exchange with pair-keyed partial maps,
  * the same r11e class the LSH sweep abandoned. With each side
  * carrying its sorted prefix-hash array, keeping only the join row
  * whose key equals THIS expression's value turns the dedup into a
  * stateless FILTER: the first common hash always has a join row
  * (the join key is the hash), so no pair is ever lost.
  *
  * Same merge-scan contract as [[SortedLongIntersectCount]]: inputs
  * ascending-sorted, null ELEMENTS skipped, branch-free codegen
  * specialization for non-nullable element types. */
case class SortedLongFirstCommon(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got $other")
    }

  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xn = elemNullable(left)
    val yn = elemNullable(right)
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    while (i < n && j < m) {
      if (xn && x.isNullAt(i)) i += 1
      else if (yn && y.isNullAt(j)) j += 1
      else {
        val xv = x.getLong(i)
        val yv = y.getLong(j)
        if (xv < yv) i += 1
        else if (xv > yv) j += 1
        else return xv
      }
    }
    null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val skipNullX =
        if (elemNullable(left)) s"if ($a.isNullAt($i)) { $i++; continue; }"
        else ""
      val skipNullY =
        if (elemNullable(right)) s"if ($b.isNullAt($j)) { $j++; continue; }"
        else ""
      // nullSafeCodeGen sets isNull=false before this block runs;
      // disjoint arrays flip it back
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0;
         |int $j = 0;
         |${ev.isNull} = true;
         |while ($i < $n && $j < $m) {
         |  $skipNullX
         |  $skipNullY
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { ${ev.isNull} = false; ${ev.value} = $xv; break; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongFirstCommon =
    copy(left = newLeft, right = newRight)
}

object SortedIntersect {
  /** Column wrapper for [[SortedLongIntersectCount]]. */
  def count(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column wrapper for [[SortedLongFirstCommon]]. */
  def firstCommon(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongFirstCommon(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
