package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Fixed-width bucket-count histogram as a native typed imperative
  * aggregate — the streaming-mergeable form of the reference's
  * Prometheus `response_time` histogram
  * (/root/reference/common/src/metrics.rs:25-26; quantile panels in
  * conf/grafana/dashboards/fairy_dashboard.json). SURVEY §4 custom
  * work item 2.
  *
  * The buffer is a sparse bucket→count map, so partial aggregation
  * (map-side combine) ships at most |distinct buckets| entries per
  * partition regardless of row count, and `merge` makes it valid under
  * any partitioning — including Structured Streaming state-store merges.
  * Output is MAP<INT, BIGINT> (bucket index → count).
  */
case class HistogramAgg(
    child: Expression,
    width: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Int, Long]] {

  require(width > 0, "bucket width must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(IntegerType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[Int, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[Int, Long],
      input: InternalRow): mutable.HashMap[Int, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v match {
        case x: Double => x
        case x: Float => x.toDouble
        case x: Long => x.toDouble
        case x: Int => x.toDouble
        case x: java.math.BigDecimal => x.doubleValue()
        case x: org.apache.spark.sql.types.Decimal => x.toDouble
      }
      val bucket = math.floor(d / width).toInt
      buf.update(bucket, buf.getOrElse(bucket, 0L) + 1L)
    }
    buf
  }

  override def merge(
      b1: mutable.HashMap[Int, Long],
      b2: mutable.HashMap[Int, Long]): mutable.HashMap[Int, Long] = {
    b2.foreach { case (k, n) => b1.update(k, b1.getOrElse(k, 0L) + n) }
    b1
  }

  override def eval(buf: mutable.HashMap[Int, Long]): Any = {
    val sorted = buf.toSeq.sortBy(_._1)
    ArrayBasedMapData(
      sorted.map(_._1).toArray,
      sorted.map(_._2).toArray)
  }

  override def serialize(buf: mutable.HashMap[Int, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, n) => out.writeInt(k); out.writeLong(n) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Int, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Int, Long]
    var i = 0
    while (i < n) {
      val k = in.readInt()
      val c = in.readLong()
      buf.update(k, c)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): HistogramAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HistogramAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HistogramAgg =
    copy(child = newChildren.head)
}

object HistogramAgg {
  /** Column API: `histogramAgg($"value", 50.0)` → MAP<INT,BIGINT>. */
  def histogramAgg(c: Column, width: Double): Column =
    ColumnBridge.column(
      HistogramAgg(ColumnBridge.expression(c), width).toAggregateExpression())
}
