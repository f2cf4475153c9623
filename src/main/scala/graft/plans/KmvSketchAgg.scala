package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** The k-minimum-values SKETCH itself (sorted array of the k smallest
  * distinct 60-bit hashes) as an aggregate — the mergeable summary
  * behind [[KmvAgg]]'s scalar estimate, exposed so set operations can
  * run on sketches instead of corpora: two sources' Jaccard similarity,
  * union/intersection cardinalities, containment — each from two
  * k-long arrays (Beyer et al. 2007, "On synopses for distinct-value
  * estimation under multiset operations", SIGMOD).
  *
  * At 100 TB this is the difference between an audit that shuffles every
  * distinct shingle per source pair (the exact
  * [[graft.operators.CorpusOps.sourceOverlap]] path) and one that ships
  * ≤ k longs per source per partial buffer: partials combine map-side,
  * the final per-source row is ~8·k bytes, and every pairwise estimate
  * is array arithmetic on broadcast-sized rows.
  *
  * Shares [[KmvAgg.Buffer]] (sorted insert / sorted merge), so the
  * result is a pure function of the input hash SET — identical under
  * any partitioning, and expressible in the DuckDB oracle as
  * `(list_sort(list(DISTINCT h)))[:k]`.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvAgg.Buffer] {

  require(k >= 2, "k must be at least 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvAgg.Buffer = new KmvAgg.Buffer(k)

  override def update(buf: KmvAgg.Buffer, input: InternalRow): KmvAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: KmvAgg.Buffer, b2: KmvAgg.Buffer): KmvAgg.Buffer = {
    b1.mergeWith(b2)
    b1
  }

  override def eval(buf: KmvAgg.Buffer): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buf.values, buf.size))

  override def serialize(buf: KmvAgg.Buffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeLong(buf.values(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvAgg.Buffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new KmvAgg.Buffer(k)
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}

object KmvSketchAgg {
  /** Column API: `kmvSketch(stableHash60($"x"), 128)` → sorted BIGINT[]. */
  def kmvSketch(c: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
