package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonicalization pass a corpus runs before any hashing/dedup, since
  * "é" (U+00E9) and "é" (combining acute) must fingerprint
  * identically. Spark has no built-in Unicode normalizer; a Scala UDF
  * would break whole-stage codegen, so this is an `Expression` whose
  * generated code calls a static helper (same shape as [[StableHash60]]).
  * Matches DuckDB's `nfc_normalize` for the oracle.
  *
  * The helper fast-paths pure-ASCII input (the overwhelming share of a
  * crawled corpus): ASCII is NFC-invariant, so the UTF8String passes
  * through without Java-string materialization.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects STRING, got ${child.dataType}")

  override protected def nullSafeEval(v: Any): Any =
    NfcNormalize.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Called from both interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if (bytes(i) < 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val j = s.toString
      val n = java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC)
      if (n.equals(j)) s else UTF8String.fromString(n)
    }
  }

  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
