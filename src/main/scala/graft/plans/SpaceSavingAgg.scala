package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** SpaceSaving heavy-hitters sketch (Metwally et al. 2005) as a typed
  * imperative aggregate, with the mergeable-summaries merge of Agarwal
  * et al. 2013: capacity-k counter table; an untracked arrival evicts
  * the minimum counter and inherits its count as error. At 100 TB an
  * exact per-token count shuffles the full vocabulary; this ships at
  * most k (item, est, err) triples per partial buffer and still
  * GUARANTEES (a) est ≥ true ≥ est − err and (b) every item with true
  * frequency > n/k is present in the summary — the two laws the spec
  * pins against exact counts.
  *
  * Output: array<struct<item:string, est:bigint, err:bigint>> sorted by
  * (est desc, item asc). The reported estimates depend on partition
  * boundaries (like every streaming summary), so the ORACLE-gated heavy-
  * hitters query (`q_heavy_hitters`) computes the exact counts and the
  * spec cross-checks this sketch against it — same relation KmvAgg bears
  * to exact distinct counts, inverted.
  */
case class SpaceSavingAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingAgg.Buffer] {

  require(k >= 1, "capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = SpaceSavingAgg.OutType

  override def createAggregationBuffer(): SpaceSavingAgg.Buffer =
    new SpaceSavingAgg.Buffer(k)

  override def update(
      buf: SpaceSavingAgg.Buffer,
      input: InternalRow): SpaceSavingAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(
      b1: SpaceSavingAgg.Buffer,
      b2: SpaceSavingAgg.Buffer): SpaceSavingAgg.Buffer = {
    b1.mergeWith(b2)
    b1
  }

  override def eval(buf: SpaceSavingAgg.Buffer): Any = {
    val rows = buf.sortedEntries.map { case (item, est, err) =>
      new GenericInternalRow(
        Array[Any](UTF8String.fromString(item), est, err))
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: SpaceSavingAgg.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = buf.entries.toSeq
    out.writeInt(entries.size)
    entries.foreach { case (item, est, err) =>
      out.writeUTF(item); out.writeLong(est); out.writeLong(err)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingAgg.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new SpaceSavingAgg.Buffer(k)
    var i = 0
    while (i < n) {
      buf.offer(in.readUTF(), in.readLong(), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingAgg =
    copy(child = newChildren.head)
}

object SpaceSavingAgg {

  val OutType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)

  /** Counter table capped at k entries. `offer(item, c, e)` adds c to the
    * item's counter (creating it if room) or evicts the current minimum,
    * inheriting its count as error — the SpaceSaving invariant that keeps
    * Σest = n and err(x) ≤ min-counter-at-eviction. */
  final class Buffer(k: Int) {
    private val table =
      scala.collection.mutable.HashMap.empty[String, (Long, Long)]

    def entries: Iterator[(String, Long, Long)] =
      table.iterator.map { case (i, (c, e)) => (i, c, e) }

    /** (est desc, item asc) — deterministic for a GIVEN buffer state. */
    def sortedEntries: Seq[(String, Long, Long)] =
      entries.toSeq.sortBy { case (i, c, _) => (-c, i) }

    def offer(item: String, c: Long, e: Long): Unit =
      table.get(item) match {
        case Some((c0, e0)) => table.update(item, (c0 + c, e0 + e))
        case None if table.size < k => table.update(item, (c, e))
        case None =>
          // evict the minimum counter (item-asc tie-break for
          // reproducibility under identical buffer states)
          val (mi, (mc, _)) = table.minBy { case (i, (cc, _)) => (cc, i) }
          table.remove(mi)
          table.update(item, (mc + c, mc + e))
      }

    /** Agarwal et al. 2013 merge: every key of the union scores the sum
      * of its two counters, an untracked side contributing that side's
      * minimum counter (as both count and error); then re-prune to k. */
    def mergeWith(other: Buffer): Unit = {
      if (other.table.isEmpty) return
      val m1 = if (table.size < k) 0L else table.valuesIterator.map(_._1).min
      val m2 =
        if (other.table.size < k) 0L
        else other.table.valuesIterator.map(_._1).min
      val keys = table.keySet ++ other.table.keySet
      val merged = keys.iterator.map { key =>
        val (c1, e1) = table.getOrElse(key, (m1, m1))
        val (c2, e2) = other.table.getOrElse(key, (m2, m2))
        key -> (c1 + c2, e1 + e2)
      }.toSeq
      table.clear()
      merged
        .sortBy { case (i, (c, _)) => (-c, i) }
        .take(k)
        .foreach { case (key, ce) => table.update(key, ce) }
    }
  }

  /** Column API: `spaceSavingTopK($"token", 256)` →
    * array<struct<item,est,err>>. */
  def spaceSavingTopK(c: Column, k: Int): Column =
    ColumnBridge.column(
      SpaceSavingAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
