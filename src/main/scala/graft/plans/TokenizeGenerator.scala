package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tokenizer as a native Generator (explode-style UDTF) — SURVEY §4
  * custom work item 3. Emits one (pos, token) row per whitespace token,
  * 1-based positions, without materializing the intermediate token
  * array as a column the way `posexplode(split(...))` does.
  *
  * Generators run interpreted (CodegenFallback is the norm — Spark's own
  * explode family breaks whole-stage codegen too); the win here is
  * API-level: tokenization is a single expression users can compose.
  */
case class TokenizeGenerator(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("token", StringType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects STRING, got ${child.dataType}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val s = v.asInstanceOf[UTF8String].toString.trim
      if (s.isEmpty) Iterator.empty
      else
        s.split(" +").iterator.zipWithIndex.map { case (tok, i) =>
          InternalRow(i + 1, UTF8String.fromString(tok))
        }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TokenizeGenerator =
    copy(child = newChild)
}

object TokenizeGenerator {
  /** `tokenize($"text")` — use in a select; the analyzer plans a
    * Generate node producing (pos, token) rows. */
  def tokenize(c: Column): Column =
    ColumnBridge.column(TokenizeGenerator(ColumnBridge.expression(c)))
}
