package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy hitters (Metwally et al. 2005) as a mergeable
  * TypedImperativeAggregate: approximate top-k frequent items in
  * bounded memory.
  *
  * The 100 TB story: exact top-N (q04/ev05/tx02 shape) shuffles one
  * row per DISTINCT key — fine for customers, fatal for
  * high-cardinality keys (URLs, user agents, raw paths in the
  * reference's access logs; ClickHouse ships `topK()` for exactly this
  * surface). SpaceSaving keeps a fixed `capacity`-entry summary per
  * group, updates map-side, and merges summaries across partitions —
  * the shuffle moves `capacity` entries per partition instead of the
  * key space, and the estimates carry their error bound.
  *
  * Guarantees (standard SpaceSaving): est ≥ true ≥ est − err for every
  * tracked item, and any item with true count > N/capacity is in the
  * summary. When `capacity` ≥ distinct items the summary is EXACT
  * (est = true, err = 0) — that is the oracle-parity regime at test
  * scale, the same "exact below the buffer" contract percentile_approx
  * has. Merge follows the mergeable-summaries construction: an item
  * absent from one side contributes that side's minimum count to both
  * the estimate and the error, preserving both bounds.
  *
  * Eviction scans the summary for its minimum — O(capacity) per evicted
  * row. Production implementations keep the Stream-Summary linked
  * bucket structure for O(1) eviction; the aggregate contract (buffer,
  * merge, bounds) is identical, so swapping the inner structure is
  * invisible to callers.
  */
case class SpaceSavingAgg(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {

  require(k >= 1 && capacity >= k, "need capacity >= k >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_topk_agg expects a string column, got $dt")
    }

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  private def minCount(buf: mutable.HashMap[String, (Long, Long)]): Long =
    if (buf.size < capacity) 0L else buf.valuesIterator.map(_._1).min

  private def add(buf: mutable.HashMap[String, (Long, Long)],
                  item: String, c: Long, e: Long): Unit = {
    buf.get(item) match {
      case Some((c0, e0)) => buf.update(item, (c0 + c, e0 + e))
      case None if buf.size < capacity => buf.update(item, (c, e))
      case None =>
        // evict the minimum-count entry; the newcomer inherits its
        // count as an overcount bound (the SpaceSaving invariant)
        val (minItem, (minC, _)) = buf.minBy { case (i, (cc, _)) => (cc, i) }
        buf.remove(minItem)
        buf.update(item, (minC + c, minC + e))
    }
  }

  override def update(buf: mutable.HashMap[String, (Long, Long)],
                      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(b1: mutable.HashMap[String, (Long, Long)],
                     b2: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    val min1 = minCount(b1)
    val min2 = minCount(b2)
    val out = mutable.HashMap.empty[String, (Long, Long)]
    (b1.keysIterator ++ b2.keysIterator).foreach { item =>
      if (!out.contains(item)) {
        val (c1, e1) = b1.getOrElse(item, (min1, min1))
        val (c2, e2) = b2.getOrElse(item, (min2, min2))
        out.update(item, (c1 + c2, e1 + e2))
      }
    }
    if (out.size <= capacity) out
    else {
      // keep the capacity largest estimates (deterministic tie-break)
      val kept = out.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(capacity)
      mutable.HashMap(kept: _*)
    }
  }

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any = {
    val top = buf.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(k)
    new GenericArrayData(top.map { case (i, (c, e)) =>
      InternalRow(UTF8String.fromString(i), c, e)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val entries = buf.toSeq
    val bytes = entries.map { case (i, _) => i.getBytes("UTF-8") }
    val size = 4 + bytes.map(b => 4 + b.length + 16).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.size)
    entries.zip(bytes).foreach { case ((_, (c, e)), ib) =>
      bb.putInt(ib.length); bb.put(ib); bb.putLong(c); bb.putLong(e)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val ib = new Array[Byte](len)
      bb.get(ib)
      buf.update(new String(ib, "UTF-8"), (bb.getLong, bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SpaceSavingAgg =
    copy(child = newChildren.head)
}

object SpaceSavingAgg {
  /** Column API: approximate top-k items of a string column, for agg(). */
  def spaceSavingTopK(c: Column, k: Int, capacity: Int): Column =
    ColumnBridge.column(
      SpaceSavingAgg(ColumnBridge.expression(c), k, capacity).toAggregateExpression())
}
