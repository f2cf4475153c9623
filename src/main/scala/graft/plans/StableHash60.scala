package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit stable string hash: the first 15 hex digits of md5 as a
  * long — numerically IDENTICAL to the composable form
  * `conv(substring(md5(s), 1, 15), 16, 10) :: long` (and to the DuckDB
  * oracle's `CAST('0x' || substr(md5(s),1,15) AS BIGINT)`), but computed
  * bytes→long directly: no hex-string materialization, no base-16
  * decimal-string parse, digest instance reused per thread.
  *
  * 15 hex digits = md5 bytes 0..6 in full plus the high nibble of
  * byte 7: `value = (bytes[0..6] big-endian << 4) | (b7 >>> 4)`.
  */
case class StableHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects STRING, got ${child.dataType}")

  override protected def nullSafeEval(v: Any): Any =
    StableHash60.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.StableHash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): StableHash60 =
    copy(child = newChild)
}

object StableHash60 {
  private val mdPool =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Called from both interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val md = mdPool.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  def stableHash60(c: Column): Column =
    ColumnBridge.column(StableHash60(ColumnBridge.expression(c)))
}
