package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join pre-filter as a native expression.
  *
  * The 100 TB join problem this solves: a fact⋈dim join where the dim
  * is too big to broadcast-HASH-join (the full rows don't fit) but its
  * KEY SET sketches into a few MB. Spark's own runtime row-level
  * filters apply this pattern opportunistically; making it explicit
  * lets a pipeline pre-filter a 100 TB scan down to ~the matching rows
  * BEFORE paying the shuffle — shuffle volume drops by the
  * non-matching fraction, at the cost of fpp false positives that the
  * real join then drops (results are exact; the bloom only PRE-filters).
  *
  * Mirrors where the reference prunes joins by key presence
  * (alt-backend's EXISTS-style unread/tag lookups over article sets).
  *
  * The filter is built driver-side from the key side's distinct keys
  * (Spark's `stat.bloomFilter`) and shipped as ONE broadcast-sized
  * reference object into the generated code — `mightContainLong` per
  * row inside WholeStageCodegen, no join operator at all in the
  * pre-filter stage.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bloom_contains expects a long/int/string key, got $dt")
    }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType => filter.mightContainLong(v.asInstanceOf[Long])
    case IntegerType => filter.mightContainLong(v.asInstanceOf[Int].toLong)
    case StringType => filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => child.dataType match {
      case LongType => s"${ev.value} = $ref.mightContainLong($v);"
      case IntegerType => s"${ev.value} = $ref.mightContainLong((long) $v);"
      case StringType => s"${ev.value} = $ref.mightContainBinary($v.getBytes());"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFunctions {

  /** Build a bloom filter of `keyCol`'s values (driver-side, one pass
    * over the key side) and return the membership-test column for it.
    */
  def bloomOf(keySide: DataFrame, keyCol: String, fpp: Double = 0.01): Column => Column = {
    // sizing only needs an estimate — approx_count_distinct at a tight
    // rsd is one cheap agg, not a full distinct shuffle; the headroom
    // covers the estimator's tail so an undersized filter (realized
    // fpp above the requested one) stays a rare-percentile event, not
    // a few-percent-of-runs one
    val est = keySide.agg(
      org.apache.spark.sql.functions.approx_count_distinct(keyCol, 0.02).as("n"))
      .head().getLong(0)
    val n = math.max(1L, (est * 1.1).toLong)
    val filter = keySide.stat.bloomFilter(keyCol, n, fpp)
    (key: Column) => ColumnBridge.column(
      BloomMightContain(ColumnBridge.expression(key), filter))
  }

  /** Pre-filter `big` to rows whose `bigKey` might appear in
    * `small`'s `smallKey` — a superset of the semi-join (exact up to
    * fpp false positives). Follow with the real join for exact
    * results; the shuffle then moves only ~matching rows.
    */
  def bloomPreFilter(big: DataFrame, bigKey: String,
                     small: DataFrame, smallKey: String,
                     fpp: Double = 0.01): DataFrame =
    big.filter(bloomOf(small, smallKey, fpp)(col(bigKey)))
}
