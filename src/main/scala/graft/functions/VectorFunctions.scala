package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, IntegerType, ShortType}

/** Cosine similarity over two float/double array columns as a native
  * Catalyst expression with whole-stage codegen — the hot inner loop of
  * every similarity/ANN operator (SURVEY §2 sim01–sim04).
  *
  * Mirrors the vector-retrieval side of the reference's RAG stack
  * (knowledge-augur / knowledge-embedder: cosine top-k over stored
  * article embeddings). A Scala UDF here would box every element of
  * every array on every comparison; this expression reads primitives
  * straight out of Tungsten `ArrayData` inside the generated loop, so a
  * brute-force scan stays a single WholeStageCodegen stage.
  *
  * Accumulation is sequential over array order, in doubles — the exact
  * formula the DuckDB oracles replicate (zip → double multiply →
  * ordered sum), so results hash-match after rounding.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType | ByteType | ShortType | IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_cosine expects array<numeric> inputs, got ${left.dataType} / ${right.dataType}")
  }

  /** ArrayData accessor for the element type — ByteType and friends
    * support quantized (int8) embeddings scored without dequantizing
    * to a float array first.
    */
  private def getter(dt: DataType): String = dt match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(ByteType, _) => "getByte"
    case ArrayType(ShortType, _) => "getShort"
    case ArrayType(IntegerType, _) => "getInt"
    case _ => "getDouble"
  }

  private def read(x: ArrayData, i: Int, get: String): Double = get match {
    case "getFloat" => x.getFloat(i).toDouble
    case "getByte" => x.getByte(i).toDouble
    case "getShort" => x.getShort(i).toDouble
    case "getInt" => x.getInt(i).toDouble
    case _ => x.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lg = getter(left.dataType); val rg = getter(right.dataType)
    val nx = x.numElements(); val ny = y.numElements()
    val n = math.min(nx, ny)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = read(x, i, lg)
      val yi = read(y, i, rg)
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    // norms run over the FULL arrays — a truncated embedding must score
    // lower, not silently renormalize to 1 (and the DuckDB oracle's
    // self-zips are full-length)
    while (i < nx) { val xi = read(x, i, lg); na += xi * xi; i += 1 }
    i = n
    while (i < ny) { val yi = read(y, i, rg); nb += yi * yi; i += 1 }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = getter(left.dataType)
    val rGet = getter(right.dataType)
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val denom = ctx.freshName("denom")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      s"""
        int $nx = $x.numElements();
        int $ny = $y.numElements();
        int $n = Math.min($nx, $ny);
        double $dot = 0.0, $na = 0.0, $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double xi = (double) $x.$lGet($i);
          double yi = (double) $y.$rGet($i);
          $dot += xi * yi; $na += xi * xi; $nb += yi * yi;
        }
        for (int $i = $n; $i < $nx; $i++) { double xi = (double) $x.$lGet($i); $na += xi * xi; }
        for (int $i = $n; $i < $ny; $i++) { double yi = (double) $y.$rGet($i); $nb += yi * yi; }
        double $denom = Math.sqrt($na) * Math.sqrt($nb);
        if ($denom == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $denom; }
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column API for the native expression. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Register every graft SQL function in an existing session. */
  def register(spark: SparkSession): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[CosineSimilarity].getName, name), builder)
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` installs the
  * graft SQL functions cluster-wide (the production path;
  * `VectorFunctions.register` is the ad-hoc path). Integer literals
  * parameterize k/bands/window where the expression needs them.
  */
object GraftExtensions {
  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  /** Arity guard: a clean, named error instead of the raw
    * IndexOutOfBoundsException `es(1)` would throw when a SQL caller
    * passes too few arguments.
    */
  private def arity(name: String, min: Int, max: Int)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      if (es.length < min || es.length > max)
        throw new IllegalArgumentException(
          s"$name expects " +
          (if (min == max) s"$min argument(s)" else s"between $min and $max arguments") +
          s", got ${es.length}")
      b(es)
    }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> arity("graft_cosine", 2, 2)(es => CosineSimilarity(es(0), es(1))),
    "graft_minhash" -> arity("graft_minhash", 1, 2)(es =>
      MinHashSignature(es(0), if (es.length > 1) intArg(es(1), "k") else 64)),
    "graft_minhash_bands" -> arity("graft_minhash_bands", 1, 3)(es => MinHashBands(es(0),
      if (es.length > 1) intArg(es(1), "k") else 64,
      if (es.length > 2) intArg(es(2), "bands") else 16)),
    "graft_shingles" -> arity("graft_shingles", 2, 2)(es => WordShingles(es(0), intArg(es(1), "n"))),
    "graft_simhash" -> arity("graft_simhash", 1, 1)(es => SimHash64(es(0))),
    "graft_winnow" -> arity("graft_winnow", 1, 2)(es =>
      WinnowFingerprints(es(0), if (es.length > 1) intArg(es(1), "w") else 4)),
    "graft_lang_id" -> arity("graft_lang_id", 1, 1)(es => LangIdExpr(es(0),
      TextFunctions.langMarkers.map(_._1), TextFunctions.langMarkers.map(_._2))),
    "graft_simhash_agg" -> arity("graft_simhash_agg", 1, 1)(es =>
      SimHashAgg(es(0)).toAggregateExpression()),
    "graft_topk_agg" -> arity("graft_topk_agg", 1, 3)(es => SpaceSavingAgg(es(0),
      if (es.length > 1) intArg(es(1), "k") else 10,
      if (es.length > 2) intArg(es(2), "capacity") else 256).toAggregateExpression()),
    "graft_lcs" -> arity("graft_lcs", 2, 2)(es => LcsLength(es(0), es(1))),
    "graft_top_by" -> arity("graft_top_by", 2, 3)(es => TopKByAgg(es(0), es(1),
      if (es.length > 2) intArg(es(2), "k") else 10).toAggregateExpression()),
    "graft_rp_bands" -> arity("graft_rp_bands", 1, 3)(es => RpSignBands(es(0),
      if (es.length > 1) intArg(es(1), "bands") else 16,
      if (es.length > 2) intArg(es(2), "rowsPerBand") else 8)))
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[CosineSimilarity].getName, name),
        builder))
    }
}
