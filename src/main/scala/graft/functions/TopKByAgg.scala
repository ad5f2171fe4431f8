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

/** EXACT top-k rows per group in bounded memory, as a mergeable
  * TypedImperativeAggregate — the aggregate-side answer to the
  * top-N-per-group problem that a window formulation solves by fully
  * sorting every group on one task.
  *
  * The 100 TB story: `row_number().over(partitionBy(g).orderBy(v))`
  * shuffles and sorts EVERY row of every group; q25's salted two-phase
  * bounds the sort but still moves every row through two windows. This
  * aggregate keeps a k-entry buffer per group, updates map-side (the
  * partial-aggregation path — only k entries per group per partition
  * ever shuffle), and merges buffers associatively. Exactness is
  * unconditional: a true top-k row is top-k within every subset it
  * appears in, so bounded buffers lose nothing (contrast SpaceSavingAgg,
  * whose counts are approximate above capacity — ranking by an
  * EXISTING per-row value needs no counting, hence no error).
  *
  * Ordering: value descending, id ascending on ties — the repo's
  * deterministic tie-break convention (q04/q25).
  *
  * NULL semantics are the SQL AGGREGATE convention: rows with a NULL
  * value or id are ignored, like sum/avg ignore NULL inputs. A window
  * formulation ranks NULL-valued rows last instead — the two agree
  * whenever a group has ≥ k non-null rows; callers mirroring a window
  * oracle on NULL-bearing data must filter NULLs on the window side
  * (q26's oracle does).
  */
case class TopKByAgg(
    value: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Long)]] {

  require(k >= 1, "need k >= 1")

  override def children: Seq[Expression] = Seq(value, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (value.dataType, id.dataType) match {
      case (DoubleType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_top_by expects (double, long), got $other")
    }

  /** true iff a ranks strictly better than b (value desc, id asc).
    * Comparison is the IEEE-754 TOTAL order (java.lang.Double.compare):
    * plain `>` returns false for every NaN comparison, which would pin
    * the worst-scan on a NaN entry and silently drop all later rows,
    * and makes sortWith non-transitive. Total order ranks NaN above
    * +Inf — the same convention Spark's sort uses, so this agrees with
    * the window/salted formulations on NaN-bearing data. -0.0 is
    * normalized to 0.0 on entry so the total order's -0.0 < 0.0
    * distinction can never flip a tie-break against SQL equality.
    */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Long)] =
    mutable.ArrayBuffer.empty

  private def add(buf: mutable.ArrayBuffer[(Double, Long)], e: (Double, Long)): Unit = {
    if (buf.length < k) buf += e
    else {
      // replace the current worst if the newcomer beats it — O(k) per
      // update with k small; a heap drops this to O(log k) without
      // changing the aggregate contract
      var worst = 0
      var i = 1
      while (i < buf.length) { if (better(buf(worst), buf(i))) worst = i; i += 1 }
      if (better(e, buf(worst))) buf(worst) = e
    }
  }

  override def update(buf: mutable.ArrayBuffer[(Double, Long)],
                      input: InternalRow): mutable.ArrayBuffer[(Double, Long)] = {
    val v = value.eval(input)
    val i = id.eval(input)
    if (v != null && i != null) {
      val vd = v.asInstanceOf[Double]
      add(buf, (if (vd == 0.0) 0.0 else vd, i.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(b1: mutable.ArrayBuffer[(Double, Long)],
                     b2: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    b2.foreach(add(b1, _))
    b1
  }

  override def eval(buf: mutable.ArrayBuffer[(Double, Long)]): Any = {
    val sorted = buf.sortWith(better)
    new GenericArrayData(sorted.map { case (v, i) => InternalRow(v, i) }.toArray[Any])
  }

  override def serialize(buf: mutable.ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (v, i) => bb.putDouble(v); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByAgg =
    copy(value = newChildren(0), id = newChildren(1))
}

object TopKByAgg {
  /** Column API: exact top-k (value, id) pairs by value desc / id asc,
    * for agg(). Returns array<struct<value double, id long>> in rank
    * order.
    */
  def topKBy(value: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByAgg(ColumnBridge.expression(value), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
