package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** One-pass d-dimensional second-moment accumulator over ARRAY<FLOAT>
  * embedding columns: buffer = (n, Σx_i for each dim, Σx_i·x_j for each
  * upper-triangle pair). Everything a covariance matrix / PCA needs, in a
  * single corpus scan.
  *
  * Why a custom aggregate: the DataFrame alternatives either explode the
  * vector TWICE (a d² row blowup — 4096× shuffle volume at d=64, a
  * scale-killer) or collect vectors to the driver. This buffer is
  * d(d+1)/2 + d + 1 doubles (d=64 → ~17 KiB) regardless of corpus size,
  * partial-aggregates map-side, and merges by pure addition — the same
  * mergeable-sketch shape as [[KmvAgg]]/[[HistogramAgg]]. Rows whose
  * array is null or of a different length are skipped (counted only when
  * accumulated), so a mixed-generation corpus cannot poison the matrix.
  *
  * Merge is elementwise `+` — commutative and associative up to IEEE
  * rounding; consumers round derived covariances before comparing across
  * engines, per the suite's aggregate-rounding convention.
  */
case class CovarianceAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CovarianceAgg.Buffer] {

  require(d >= 1, "dimension must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // lazy: child.dataType resolves only after analysis
  private lazy val elementType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case other =>
      throw new IllegalArgumentException(s"expected array input, got $other")
  }

  override def createAggregationBuffer(): CovarianceAgg.Buffer =
    new CovarianceAgg.Buffer(d)

  override def update(
      buf: CovarianceAgg.Buffer, input: InternalRow): CovarianceAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == d) {
        val x = new Array[Double](d)
        var i = 0
        elementType match {
          case FloatType =>
            while (i < d) { x(i) = arr.getFloat(i).toDouble; i += 1 }
          case DoubleType =>
            while (i < d) { x(i) = arr.getDouble(i); i += 1 }
          case other =>
            throw new IllegalStateException(s"unsupported element type $other")
        }
        buf.add(x)
      }
    }
    buf
  }

  override def merge(
      b1: CovarianceAgg.Buffer, b2: CovarianceAgg.Buffer): CovarianceAgg.Buffer = {
    b1.mergeWith(b2)
    b1
  }

  /** [n, sum_0 … sum_{d-1}, prod_{0,0} … prod_{i,j} (i ≤ j, row-major
    * upper triangle)] — the layout [[CovarianceAgg.momentIndex]] maps. */
  override def eval(buf: CovarianceAgg.Buffer): Any = {
    val out = new Array[Double](1 + d + buf.prods.length)
    out(0) = buf.n.toDouble
    System.arraycopy(buf.sums, 0, out, 1, d)
    System.arraycopy(buf.prods, 0, out, 1 + d, buf.prods.length)
    new GenericArrayData(out)
  }

  override def serialize(buf: CovarianceAgg.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    var i = 0
    while (i < d) { out.writeDouble(buf.sums(i)); i += 1 }
    i = 0
    while (i < buf.prods.length) { out.writeDouble(buf.prods(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CovarianceAgg.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new CovarianceAgg.Buffer(d)
    buf.n = in.readLong()
    var i = 0
    while (i < d) { buf.sums(i) = in.readDouble(); i += 1 }
    i = 0
    while (i < buf.prods.length) { buf.prods(i) = in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CovarianceAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CovarianceAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CovarianceAgg =
    copy(child = newChildren.head)
}

object CovarianceAgg {

  /** Accumulator: vector count, per-dim sums, upper-triangle product sums. */
  final class Buffer(d: Int) {
    var n: Long = 0L
    val sums: Array[Double] = new Array[Double](d)
    val prods: Array[Double] = new Array[Double](d * (d + 1) / 2)

    def add(x: Array[Double]): Unit = {
      n += 1
      var i = 0
      var t = 0
      while (i < d) {
        sums(i) += x(i)
        var j = i
        while (j < d) {
          prods(t) += x(i) * x(j)
          t += 1
          j += 1
        }
        i += 1
      }
    }

    def mergeWith(other: Buffer): Unit = {
      n += other.n
      var i = 0
      while (i < sums.length) { sums(i) += other.sums(i); i += 1 }
      i = 0
      while (i < prods.length) { prods(i) += other.prods(i); i += 1 }
    }
  }

  /** Index of Σx_i·x_j (i ≤ j) inside the flattened moments array
    * returned by eval — AFTER the leading [n, d sums]. */
  def momentIndex(d: Int, i: Int, j: Int): Int = {
    require(i <= j && j < d)
    1 + d + (i * d - i * (i - 1) / 2 + (j - i))
  }

  /** Column API: `covMoments($"embedding", 64)` → ARRAY<DOUBLE> moments. */
  def covMoments(c: Column, d: Int): Column =
    ColumnBridge.column(
      CovarianceAgg(ColumnBridge.expression(c), d).toAggregateExpression())
}
