package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** SimHash sign-accumulator as one typed imperative aggregate.
  *
  * The composable form needs 16 independent `sum(CASE WHEN (h div 2^j) %
  * 2 = 1 THEN 1 ELSE -1 END)` aggregate expressions — 16 buffers and 16
  * expression-tree evaluations per row. This aggregate keeps one
  * `Array[Long](nBits)` buffer and updates all bit counters in a single
  * pass per row, then packs the sign bits into the final hash. Semantics
  * are identical (the DuckDB oracle still computes the 16-sum form).
  *
  * Buffer is mergeable, so map-side partial aggregation ships nBits
  * longs per group regardless of row count.
  */
case class SimhashAgg(
    child: Expression,
    nBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(nBits > 0 && nBits <= 63, "nBits must be in [1, 63]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nBits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < nBits) {
        buf(j) += (((h >>> j) & 1L) * 2L) - 1L
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < nBits) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var hash = 0L
    var j = 0
    while (j < nBits) {
      if (buf(j) > 0) hash |= (1L << j)
      j += 1
    }
    hash
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var j = 0
    while (j < nBits) { out.writeLong(buf(j)); j += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](nBits)
    var j = 0
    while (j < nBits) { buf(j) = in.readLong(); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimhashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimhashAgg =
    copy(child = newChildren.head)
}

object SimhashAgg {
  /** Column API: `simhashAgg($"h", 16)` over grouped hash values. */
  def simhashAgg(c: Column, nBits: Int): Column =
    ColumnBridge.column(
      SimhashAgg(ColumnBridge.expression(c), nBits).toAggregateExpression())
}
