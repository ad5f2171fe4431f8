package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sampled rolling-window hashes of a string — the signature kernel of
  * recap-worker's HashDedupStage (pipeline/dedup.rs:346-389 +
  * util/text.rs:30 rolling_hash_windows), as ONE native pass:
  *
  *  - byte length < windowSize → [hash(whole)] (text.rs:31);
  *  - char windows < 1 (the ≥-100-bytes-but-<-100-chars CJK quirk) →
  *    [hash(whole)] (the empty-window fallback, dedup.rs:374);
  *  - else step = (windows/maxSample).max(1), indices i·step, cap
  *    maxSample; each window hashed over its UTF-8 byte slice.
  *
  * Values are BIT-IDENTICAL to `xxhash64(substr(body, i·step+1,
  * windowSize))` (same XXH64 kernel, same seed 42, same bytes) — the
  * HOF formulation this replaces — but the char-offset table is built
  * once per row instead of one O(n) UTF-8 scan PER WINDOW, and no
  * per-window UTF8String is allocated: O(n + k·window) vs O(k·n) with
  * k allocations. The sketch-kernel discipline of MinHashSignature
  * (SketchExpressions.scala) applied to window sampling.
  */
case class SampledWindowHashes(child: Expression, windowSize: Int, maxSample: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"expects string, got $dt")
  }

  override def nullSafeEval(input: Any): Any =
    SampledWindowHashes.compute(input.asInstanceOf[UTF8String], windowSize, maxSample)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""${ev.value} = graft.functions.SampledWindowHashes.compute(
         |  $s, $windowSize, $maxSample);""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The per-document window-key HISTOGRAM — [[SampledWindowHashes]]
  * followed by an in-kernel sort + run-length encode, returning
  * array<struct<k:long, cnt:long>>. Keeps the multiset counts the
  * Dice similarity needs without either an explode+groupBy shuffle
  * (corpus×maxSample rows) or an interpreted HOF sort/RLE chain.
  */
case class SampledWindowHistogram(child: Expression, windowSize: Int, maxSample: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("k", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"expects string, got $dt")
  }

  override def nullSafeEval(input: Any): Any =
    SampledWindowHashes.histogram(input.asInstanceOf[UTF8String], windowSize, maxSample)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""${ev.value} = graft.functions.SampledWindowHashes.histogram(
         |  $s, $windowSize, $maxSample);""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SampledWindowHashes {
  /** Seed of Spark's `xxhash64` function — keeps values equal to the
    * composable form.
    */
  val Seed = 42L

  def compute(s: UTF8String, windowSize: Int, maxSample: Int): UnsafeArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nBytes = s.numBytes
    def whole: UnsafeArrayData = UnsafeArrayData.fromPrimitiveArray(
      Array(XXH64.hashUnsafeBytes(base, off, nBytes, Seed)))
    if (nBytes < windowSize) return whole
    // one pass: byte offset of every char boundary (offsets(i) = byte
    // start of char i; offsets(nChars) = nBytes)
    val offsets = new Array[Int](nBytes + 1)
    var b = 0
    var nChars = 0
    while (b < nBytes) {
      offsets(nChars) = b
      b += UTF8String.numBytesForFirstByte(org.apache.spark.unsafe.Platform.getByte(base, off + b))
      nChars += 1
    }
    offsets(nChars) = nBytes
    val nwin = nChars - windowSize + 1
    if (nwin <= 0) return whole
    val step = math.max(nwin / maxSample, 1)
    val nsamp = math.min(maxSample, (nwin - 1) / step + 1)
    val out = new Array[Long](nsamp)
    var j = 0
    while (j < nsamp) {
      val i = j * step
      val from = offsets(i)
      val to = offsets(i + windowSize)
      out(j) = XXH64.hashUnsafeBytes(base, off + from, to - from, Seed)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def histogram(s: UTF8String, windowSize: Int, maxSample: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val keys = compute(s, windowSize, maxSample).toLongArray()
    java.util.Arrays.sort(keys)
    val entries = new java.util.ArrayList[AnyRef](keys.length)
    var i = 0
    while (i < keys.length) {
      var j = i + 1
      while (j < keys.length && keys(j) == keys(i)) j += 1
      entries.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](keys(i), (j - i).toLong)))
      i = j
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(entries.toArray)
  }
}
