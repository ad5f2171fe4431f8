package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hash sketches.
  *
  * The higher-order-function formulations (transform × aggregate) are
  * interpreted per element and allocate a string per permutation-hash —
  * at sf0.1 the minhash signature alone cost ~80 s. These expressions
  * hash each shingle ONCE (XXH64, Spark's own hash kernel) and run the
  * k-permutation / 64-bit-vote loops as tight generated Java over
  * primitive arrays: O(m·k) long arithmetic with zero allocation,
  * inside WholeStageCodegen. Same blocking semantics, ~100× faster —
  * the difference between a sketch you can afford at 100 TB and one
  * you can't.
  */
object Sketches {
  /** splitmix64 — deterministic coefficient stream for the permutation
    * family v_i = h·A_i + B_i (A_i forced odd → bijection on Z/2^64).
    */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  def coefA(k: Int): Array[Long] = Array.tabulate(k)(i => splitmix64(i.toLong * 2) | 1L)
  def coefB(k: Int): Array[Long] = Array.tabulate(k)(i => splitmix64(i.toLong * 2 + 1))

  val SEED = 42L
}

/** MinHash signature of an array<string> of shingles: array<long>, length k. */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  private val A = Sketches.coefA(k)
  private val B = Sketches.coefB(k)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"minhash expects array<string>, got $dt")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    val m = arr.numElements()
    var j = 0
    while (j < m) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Sketches.SEED)
        var i = 0
        while (i < k) { val v = h * A(i) + B(i); if (v < sig(i)) sig(i) = v; i += 1 }
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", A, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", B, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val sig = ctx.freshName("sig"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val v = ctx.freshName("v"); val s = ctx.freshName("s")
      s"""
        long[] $sig = new long[$k];
        java.util.Arrays.fill($sig, Long.MAX_VALUE);
        int $m = $arr.numElements();
        for (int $j = 0; $j < $m; $j++) {
          if ($arr.isNullAt($j)) continue;
          UTF8String $s = $arr.getUTF8String($j);
          long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), ${Sketches.SEED}L);
          for (int $i = 0; $i < $k; $i++) {
            long $v = $h * $aRef[$i] + $bRef[$i];
            if ($v < $sig[$i]) $sig[$i] = $v;
          }
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sig);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** LSH band hashes straight from shingles: minhash signature (k perms)
  * and per-band XXH64 chaining in ONE pass — array<long> of length b.
  *
  * Exists because composing `lshBands(minhashSignature(...))` as
  * higher-order functions re-evaluates the inlined signature expression
  * once per band (16× the whole tokenize→shingle→hash pipeline, ~120 s
  * at sf0.1); this expression is the same math in a single codegen loop.
  */
case class MinHashBands(child: Expression, k: Int, bands: Int) extends UnaryExpression {
  require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
  private val r = k / bands
  private val A = Sketches.coefA(k)
  private val B = Sketches.coefB(k)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"minhash_bands expects array<string>, got $dt")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    val m = arr.numElements()
    var j = 0
    while (j < m) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Sketches.SEED)
        var i = 0
        while (i < k) { val v = h * A(i) + B(i); if (v < sig(i)) sig(i) = v; i += 1 }
      }
      j += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = Sketches.SEED
      var i = b * r
      while (i < (b + 1) * r) { h = XXH64.hashLong(sig(i), h); i += 1 }
      out(b) = h
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", A, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", B, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val sig = ctx.freshName("sig"); val out = ctx.freshName("out")
      val m = ctx.freshName("m"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val v = ctx.freshName("v"); val s = ctx.freshName("s")
      val b = ctx.freshName("b"); val bh = ctx.freshName("bh")
      s"""
        long[] $sig = new long[$k];
        java.util.Arrays.fill($sig, Long.MAX_VALUE);
        int $m = $arr.numElements();
        for (int $j = 0; $j < $m; $j++) {
          if ($arr.isNullAt($j)) continue;
          UTF8String $s = $arr.getUTF8String($j);
          long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), ${Sketches.SEED}L);
          for (int $i = 0; $i < $k; $i++) {
            long $v = $h * $aRef[$i] + $bRef[$i];
            if ($v < $sig[$i]) $sig[$i] = $v;
          }
        }
        long[] $out = new long[$bands];
        for (int $b = 0; $b < $bands; $b++) {
          long $bh = ${Sketches.SEED}L;
          for (int $i = $b * $r; $i < ($b + 1) * $r; $i++) {
            $bh = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($sig[$i], $bh);
          }
          $out[$b] = $bh;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word n-gram shingles of an array<string> of tokens: array<string> of
  * space-joined n-grams (empty when fewer than n tokens).
  *
  * Exists because the higher-order-function formulation re-evaluates the
  * inlined token-split expression per shingle element.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"shingles expects array<string>, got $dt")
  }

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val cnt = math.max(m - n + 1, 0)
    val out = new Array[AnyRef](cnt)
    var i = 0
    while (i < cnt) {
      val parts = new Array[UTF8String](n)
      var o = 0
      while (o < n) { parts(o) = arr.getUTF8String(i + o); o += 1 }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("shingleSep", sep, "UTF8String")
    nullSafeCodeGen(ctx, ev, arr => {
      val m = ctx.freshName("m"); val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val o = ctx.freshName("o"); val parts = ctx.freshName("parts")
      s"""
        int $m = $arr.numElements();
        int $cnt = Math.max($m - ${n - 1}, 0);
        Object[] $out = new Object[$cnt];
        for (int $i = 0; $i < $cnt; $i++) {
          UTF8String[] $parts = new UTF8String[$n];
          for (int $o = 0; $o < $n; $o++) { $parts[$o] = $arr.getUTF8String($i + $o); }
          $out[$i] = UTF8String.concatWs($sepRef, $parts);
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing fingerprints of an array<string> of tokens: XXH64 each
  * token, take the min hash of every w-window, return distinct sorted
  * mins (MOSS scheme). One pass, no per-window array copies (the
  * higher-order-function form sliced the hash array per window).
  */
case class WinnowFingerprints(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"winnow expects array<string>, got $dt")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m == 0) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val hashes = new Array[Long](m)
    var j = 0
    while (j < m) {
      if (arr.isNullAt(j)) hashes(j) = Long.MaxValue // null token never wins a window min
      else {
        val s = arr.getUTF8String(j)
        hashes(j) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Sketches.SEED)
      }
      j += 1
    }
    val cnt = math.max(m - w + 1, 1)
    val mins = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      var mn = hashes(i)
      var o = 1
      while (o < w && i + o < m) { if (hashes(i + o) < mn) mn = hashes(i + o); o += 1 }
      mins(i) = mn
      i += 1
    }
    // drop the null sentinel: a window of all-null tokens must emit no
    // fingerprint, or unrelated null-heavy docs would "share" MaxValue
    val distinct = mins.distinct.filter(_ != Long.MaxValue).sorted
    UnsafeArrayData.fromPrimitiveArray(distinct)
  }

  // Interpreted eval is a tight primitive loop already; the expression
  // exists to avoid the HOF slice-copy blowup. CodegenFallback keeps the
  // surrounding operators in codegen.
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("winnow", this, classOf[WinnowFingerprints].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.nullSafeEval($arr);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Language ID over an array<string> of tokens in ONE pass: count
  * marker-word hits per language, return the first language (in
  * declaration order) whose count is >= all others — identical
  * semantics to the CASE chain the DuckDB oracle runs.
  *
  * Exists because the composed form (one `filter` higher-order
  * function per language profile) re-evaluates the inlined token
  * split per profile and walks the tokens five times, interpreted.
  */
case class LangIdExpr(child: Expression, langs: Seq[String], markerSets: Seq[Seq[String]])
    extends UnaryExpression {
  require(langs.nonEmpty && langs.length == markerSets.length)

  override def dataType: DataType = StringType
  // null input classifies as the LAST language (all-zero counts fall
  // through to it) — matching the replaced when-chain and the oracle's
  // CASE ... ELSE, where null comparisons fail every branch
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"lang_id expects array<string>, got $dt")
  }

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    markerSets.map { ws =>
      val s = new java.util.HashSet[UTF8String]()
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  @transient private lazy val langStrs: Array[UTF8String] =
    langs.map(UTF8String.fromString).toArray

  private def pickWinner(counts: Array[Int]): Int = {
    var i = 0
    while (i < counts.length) {
      var ok = true
      var j = 0
      while (ok && j < counts.length) { if (counts(j) > counts(i)) ok = false; j += 1 }
      if (ok) return i
      i += 1
    }
    counts.length - 1
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return langStrs(langStrs.length - 1)
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Int](sets.length)
    val m = arr.numElements()
    var j = 0
    while (j < m) {
      if (!arr.isNullAt(j)) {
        val t = arr.getUTF8String(j)
        var l = 0
        while (l < sets.length) { if (sets(l).contains(t)) counts(l) += 1; l += 1 }
      }
      j += 1
    }
    langStrs(pickWinner(counts))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("langSets", sets, "java.util.HashSet[]")
    val langsRef = ctx.addReferenceObj("langStrs", langStrs, "UTF8String[]")
    val childGen = child.genCode(ctx)
    val counts = ctx.freshName("counts"); val m = ctx.freshName("m")
    val j = ctx.freshName("j"); val l = ctx.freshName("l"); val t = ctx.freshName("t")
    val win = ctx.freshName("win"); val ok = ctx.freshName("ok"); val k = ctx.freshName("k")
    val n = sets.length
    val code =
      code"""
        ${childGen.code}
        UTF8String ${ev.value};
        if (${childGen.isNull}) {
          ${ev.value} = $langsRef[$n - 1];
        } else {
          int[] $counts = new int[$n];
          int $m = ${childGen.value}.numElements();
          for (int $j = 0; $j < $m; $j++) {
            if (${childGen.value}.isNullAt($j)) continue;
            UTF8String $t = ${childGen.value}.getUTF8String($j);
            for (int $l = 0; $l < $n; $l++) {
              if ($setsRef[$l].contains($t)) $counts[$l]++;
            }
          }
          int $win = $n - 1;
          for (int $l = 0; $l < $n; $l++) {
            boolean $ok = true;
            for (int $k = 0; $ok && $k < $n; $k++) { if ($counts[$k] > $counts[$l]) $ok = false; }
            if ($ok) { $win = $l; break; }
          }
          ${ev.value} = $langsRef[$win];
        }
      """
    ev.copy(code = code, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of an array<string> of tokens (per-bit ±1 votes). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"simhash expects array<string>, got $dt")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val m = arr.numElements()
    var j = 0
    while (j < m) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Sketches.SEED)
        var b = 0
        while (b < 64) { votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1); b += 1 }
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes"); val m = ctx.freshName("m")
      val j = ctx.freshName("j"); val b = ctx.freshName("b")
      val h = ctx.freshName("h"); val s = ctx.freshName("s"); val sig = ctx.freshName("sig")
      s"""
        int[] $votes = new int[64];
        int $m = $arr.numElements();
        for (int $j = 0; $j < $m; $j++) {
          if ($arr.isNullAt($j)) continue;
          UTF8String $s = $arr.getUTF8String($j);
          long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), ${Sketches.SEED}L);
          for (int $b = 0; $b < 64; $b++) { $votes[$b] += (((($h >>> $b) & 1L) == 1L) ? 1 : -1); }
        }
        long $sig = 0L;
        for (int $b = 0; $b < 64; $b++) { if ($votes[$b] > 0) $sig |= (1L << $b); }
        ${ev.value} = $sig;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Length of the longest common subsequence of two array<string> token
  * sequences — the kernel of ROUGE-L
  * (recap-worker/recap-worker/src/evaluation/rouge.rs:13-37 computes
  * the same DP per candidate/reference pair).
  *
  * Tokens are hashed once (XXH64) so the O(m·n) DP inner loop compares
  * longs, not byte arrays, and runs over a two-row int table inside
  * codegen — O(min(m,n)) memory per row, no allocation besides the two
  * rows. A 2⁻⁶⁴ hash collision could overcount by one token; acceptable
  * for a similarity metric (and unobservable after 4-decimal rounding
  * at realistic document lengths). Null tokens equal each other.
  */
case class LcsLength(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"graft_lcs expects two array<string>, got $l / $r")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = LcsLength.hashTokensJava(a.asInstanceOf[ArrayData])
    var y = LcsLength.hashTokensJava(b.asInstanceOf[ArrayData])
    if (x.length < y.length) { val t = x; x = y; y = t } // y is the short side
    val n = y.length
    if (n == 0) return 0
    val prev = new Array[Int](n + 1)
    val cur = new Array[Int](n + 1)
    var i = 0
    while (i < x.length) {
      var j = 0
      while (j < n) {
        cur(j + 1) =
          if (x(i) == y(j)) prev(j) + 1
          else math.max(cur(j), prev(j + 1))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, n + 1)
      i += 1
    }
    prev(n)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // case-class companions get no static forwarders — generated Java
    // must go through the module instance
    val cls = classOf[LcsLength].getName + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs"); val ys = ctx.freshName("ys")
      val prev = ctx.freshName("prev"); val cur = ctx.freshName("cur")
      val tmp = ctx.freshName("tmp"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      s"""
        long[] $xs = $cls.hashTokensJava($a);
        long[] $ys = $cls.hashTokensJava($b);
        if ($xs.length < $ys.length) { long[] $tmp = $xs; $xs = $ys; $ys = $tmp; }
        int $n = $ys.length;
        int[] $prev = new int[$n + 1];
        int[] $cur = new int[$n + 1];
        for (int $i = 0; $i < $xs.length; $i++) {
          for (int $j = 0; $j < $n; $j++) {
            $cur[$j + 1] = ($xs[$i] == $ys[$j])
              ? $prev[$j] + 1
              : Math.max($cur[$j], $prev[$j + 1]);
          }
          System.arraycopy($cur, 0, $prev, 0, $n + 1);
        }
        ${ev.value} = $prev[$n];
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane (signed random projection) LSH band values of a
  * float/double embedding: `bands` values, each packing `rowsPerBand`
  * sign bits of deterministic Rademacher (±1) hyperplane projections —
  * Charikar's SRP scheme, the embedding-space analog of MinHash bands.
  * Two vectors agree on one hyperplane bit with probability
  * 1 − θ/π (θ = angle), so a band of r bits collides with p^r and the
  * OR over b bands amplifies recall: r is THE block-size knob — at
  * 100 TB r grows with log N so per-band buckets (≤ 2^r) keep
  * shrinking, which label/source blocking can never do.
  *
  * The band index is packed into the high bits of each value, so one
  * explode + equi-join on the single long column blocks correctly.
  * Hyperplane components come from splitmix64(hp·2^20 + dim) bits —
  * deterministic, no stored matrix, any dimensionality.
  */
case class RpSignBands(child: Expression, bands: Int, rowsPerBand: Int) extends UnaryExpression {
  require(bands >= 1 && rowsPerBand >= 1 && rowsPerBand <= 32)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"graft_rp_bands expects array<float|double>, got $dt")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bits = 0L
      var t = 0
      while (t < rowsPerBand) {
        val hp = b * rowsPerBand + t
        var dot = 0.0
        var i = 0
        while (i < n) {
          val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          val sign = if ((Sketches.splitmix64(hp.toLong * 1048576L + i) & 1L) == 1L) 1.0 else -1.0
          dot += sign * v
          i += 1
        }
        bits = (bits << 1) | (if (dot > 0) 1L else 0L)
        t += 1
      }
      out(b) = (b.toLong << 32) | bits
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, arr => {
      val out = ctx.freshName("out"); val n = ctx.freshName("n")
      val b = ctx.freshName("b"); val t = ctx.freshName("t"); val i = ctx.freshName("i")
      val bits = ctx.freshName("bits"); val dot = ctx.freshName("dot")
      val hp = ctx.freshName("hp"); val v = ctx.freshName("v")
      s"""
        int $n = $arr.numElements();
        long[] $out = new long[$bands];
        for (int $b = 0; $b < $bands; $b++) {
          long $bits = 0L;
          for (int $t = 0; $t < $rowsPerBand; $t++) {
            int $hp = $b * $rowsPerBand + $t;
            double $dot = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              double $v = (double) $arr.$get($i);
              $dot += (((graft.functions.Sketches.splitmix64((long) $hp * 1048576L + $i) & 1L) == 1L) ? $v : -$v);
            }
            $bits = ($bits << 1) | (($dot > 0) ? 1L : 0L);
          }
          $out[$b] = ((long) $b << 32) | $bits;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LcsLength {
  /** Static entry for the generated code path. */
  def hashTokensJava(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) Long.MinValue
        else {
          val s = arr.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Sketches.SEED)
        }
      i += 1
    }
    out
  }
}
