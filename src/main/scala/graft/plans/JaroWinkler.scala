package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a native codegen'd expression — the
  * scoring primitive of fuzzy entity resolution / record linkage
  * (Winkler 1990, "String Comparator Metrics and Enhanced Decision Rules
  * in the Fellegi-Sunter Model of Record Linkage"). Spark ships
  * `levenshtein` but no Jaro–Winkler; a Scala UDF would break
  * whole-stage codegen in the pair-scoring hot path (the one place an ER
  * join burns CPU), so this is an `Expression` whose generated code
  * calls a static helper (same shape as [[NfcNormalize]]).
  *
  * Semantics are pinned to DuckDB's `jaro_winkler_similarity` (verified
  * bit-exact over 12k random + structured pairs) so ER queries are
  * oracle-checkable:
  *  - either side empty → 0.0 (including both empty);
  *  - match window = max(max(|a|,|b|)/2 - 1, 0), greedy left-to-right
  *    first-unflagged matching;
  *  - transpositions t = floor(T/2) where T counts order-mismatched
  *    matched positions (the floor is what distinguishes DuckDB /
  *    rapidfuzz from textbook half-transpositions);
  *  - jaro = (m/|a| + m/|b| + (m-t)/m) / 3, 0.0 when m = 0;
  *  - Winkler prefix bonus j + l·0.1·(1-j) with l = common prefix
  *    capped at 4, applied only when jaro > 0.7 (the boost threshold).
  *
  * Comparison is over UTF-16 code units of the decoded string —
  * identical to DuckDB for ASCII/BMP text (the fixture domain).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"expects (STRING, STRING), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Called from both interpreted eval and generated code. */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb, i + window + 1)
      var j = lo
      var done = false
      while (!done && j < hi) {
        if (!bm(j) && a.charAt(i) == b.charAt(j)) {
          am(i) = true; bm(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var transposed = 0
    var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) transposed += 1
        k += 1
      }
      i += 1
    }
    val t = transposed / 2 // floored — DuckDB/rapidfuzz convention
    val jaro =
      (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro // Winkler boost threshold
    var l = 0
    val maxPrefix = math.min(4, math.min(la, lb))
    while (l < maxPrefix && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaroWinkler(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
