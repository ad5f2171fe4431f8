package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.functions.TextFunctions._
import graft.functions.HashFunctions._
import graft.functions.VectorFunctions

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens / shingles") {
    val df = Seq("a b c d").toDF("text")
    assert(df.select(tokenCount(col("text"))).head.getInt(0) == 4)
    val sh2 = df.select(shingles(col("text"), 2)).head.getSeq[String](0)
    assert(sh2 == Seq("a b", "b c", "c d"))
    val sh1 = df.select(shingles(col("text"), 1)).head.getSeq[String](0)
    assert(sh1 == Seq("a", "b", "c", "d"))
  }

  test("tokensMixed: CJK chars become single tokens, ASCII words lowercase") {
    // the reference's own ROUGE fixture string (rouge.rs tests)
    val got = Seq("生成AIがビジネスを変える").toDF("t")
      .select(tokensMixed(col("t"))).head.getSeq[String](0)
    assert(got == Seq("生", "成", "ai", "が", "ビ", "ジ", "ネ", "ス", "を", "変", "え", "る"), got.toString)
    // mixed text: punctuation separates, ASCII runs stay words
    val mixed = Seq("Sparkで集計! fast JOIN 123x").toDF("t")
      .select(tokensMixed(col("t"))).head.getSeq[String](0)
    assert(mixed == Seq("spark", "で", "集", "計", "fast", "join", "123x"), mixed.toString)
    // whitespace tokenizer degenerates to ONE token on Japanese —
    // the failure tokensMixed exists to fix
    val ws = Seq("生成AIがビジネスを変える").toDF("t")
      .select(tokenCount(col("t"))).head.getInt(0)
    assert(ws == 1)
    // char-bigram shingles over the mixed tokens: the CJK blocking key
    val bi = Seq("日本語です").toDF("t")
      .select(shinglesOfTokens(tokensMixed(col("t")), 2)).head.getSeq[String](0)
    assert(bi == Seq("日 本", "本 語", "語 で", "で す"), bi.toString)
  }

  test("minhash near-dup blocking works on Japanese text via tokensMixed bigrams") {
    // two near-identical Japanese docs + one unrelated: the near-dups
    // must share an LSH band, the unrelated doc must not
    val df = Seq(
      (1L, "東京で大規模な花火大会が開催された週末の夜空"),
      (2L, "東京で大規模な花火大会が開催された週末の夜に"),
      (3L, "機械学習モデルの蒸留による推論高速化の手法")).toDF("id", "text")
    val bands = df.select(col("id"),
        explode(minhashBands(shinglesOfTokens(tokensMixed(col("text")), 2))).as("band"))
    val pairs = bands.as("a").join(bands.as("b"), "band")
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"near-dups share no band: $pairs")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L), s"unrelated doc blocked: $pairs")
  }

  test("langId picks marker-majority language deterministically") {
    val df = Seq(
      ("the a fast slow slow", "en"),
      ("data row table data", "es"),
      ("key hash merge key", "de"),
      ("x y z", "en") // no markers at all → all-zero tie → first lang
    ).toDF("text", "expected")
    val got = df.select(col("expected"), langId(col("text")).as("got")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
    // null text falls through to the last language, like the oracle's
    // CASE ... ELSE (null comparisons fail every branch)
    val n = Seq(Option.empty[String]).toDF("text").select(langId(col("text"))).head
    assert(!n.isNullAt(0) && n.getString(0) == "zh", n.toString)
  }

  test("sentence segmentation splits on terminal punctuation") {
    val got = Seq("First one. Second!  Third?Trailing not split. ")
      .toDF("t").select(TextFunctions.sentences(col("t"))).head.getSeq[String](0)
    assert(got == Seq("First one.", "Second!", "Third?Trailing not split."), got.toString)
    // sentence-level exact dedup composes: same sentence hashes equal
    val h = Seq("A b c. D e f.", "D e f. Zzz.")
      .toDF("t")
      .select(explode(TextFunctions.sentences(col("t"))).as("s"))
      .groupBy(xxhash64(col("s"))).count()
      .filter(col("count") > 1).count()
    assert(h == 1) // "D e f." appears in both docs
  }

  test("stripHtml removes tags/scripts and decodes entities") {
    val html = """<html><head><style>body{color:red}</style></head>
      <body><script>alert("x")</script><h1>Title</h1>
      <p>A &amp; B &lt;tag&gt; &quot;quoted&quot;&nbsp;end</p></body></html>"""
    val got = Seq(html).toDF("h").select(stripHtml(col("h"))).head.getString(0)
    assert(got == """Title A & B <tag> "quoted" end""", got)
    // double-escaped text must decode exactly one level, not two
    val dbl = Seq("<p>&amp;lt;b&amp;gt;</p>").toDF("h")
      .select(stripHtml(col("h"))).head.getString(0)
    assert(dbl == "&lt;b&gt;", dbl)
  }

  test("minhash: identical docs share full signature; disjoint docs don't") {
    val df = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"),
      (2L, "w1 w2 w3 w4 w5 w6"),
      (3L, "z1 z2 z3 z4 z5 z6")).toDF("id", "text")
    val sigs = df.select(col("id"), minhashSignature(shingles(col("text"), 3)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    assert(sigs(1L).length == 64)
  }

  test("simhash: identical text → distance 0, small perturbation → small distance") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota")).toDF("id", "text")
    val sigs = df.select(col("id"), simhash64(tokens(col("text"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) <= 20)
  }

  test("simhash aggregate equals per-array simhash bit-for-bit") {
    import graft.functions.SimHashAgg.simhashAgg
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six seven")).toDF("id", "text")
    val viaArray = docs.select(col("id"), simhash64(tokens(col("text"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaAgg = docs.select(col("id"), explode(tokens(col("text"))).as("t"))
      .groupBy("id").agg(simhashAgg(col("t")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaArray == viaAgg, s"$viaArray vs $viaAgg")
  }

  test("winnowing fingerprints: containment shares prints") {
    val df = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h x y z")).toDF("id", "text")
    val fps = df.select(col("id"), winnowFingerprints(tokens(col("text"))).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty)
  }

  test("LcsLength and RpSignBands: codegen/interpreted agreement") {
    import graft.functions.TextFunctions.lcsLen
    val toks = Seq(
      (Seq("a", "b", "c", "a"), Seq("b", "a", "c")),
      (Seq.empty[String], Seq("x")),
      (Seq("猫", "犬"), Seq("犬", "猫"))).toDF("a", "b")
    val rnd = new scala.util.Random(3)
    val vecs = Seq.fill(6)(Array.fill(16)(rnd.nextGaussian().toFloat)).map(Tuple1(_)).toDF("v")
    def lcsVals = toks.select(lcsLen(col("a"), col("b"))).collect().map(_.getInt(0)).toSeq
    def bandVals = vecs.select(rpSignBands(col("v"), 4, 8)).collect().map(_.getSeq[Long](0)).toSeq
    val (lcsGen, bandsGen) = (lcsVals, bandVals)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(lcsVals == lcsGen)
      assert(bandVals == bandsGen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // band values embed the band index → values from different bands
    // can never collide across bands
    bandsGen.foreach(bs => assert(bs.map(_ >>> 32).toSeq == Seq(0L, 1L, 2L, 3L), bs.toString))
  }

  test("cosineSim: exact values, nulls, and codegen/interpreted agreement") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f), -1.0)).toDF("a", "b", "want")
    df.collect() // materialize
    val got = df.select(VectorFunctions.cosineSim(col("a"), col("b")).as("cos"), col("want")).collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
    // zero vector → null
    val z = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
      .select(VectorFunctions.cosineSim(col("a"), col("b"))).head
    assert(z.isNullAt(0))
    // interpreted path (no codegen) must match
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val got2 = df.select(VectorFunctions.cosineSim(col("a"), col("b"))).collect().map(_.getDouble(0))
      assert(got2.sameElements(got.map(_.getDouble(0))))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("cosineSim: length mismatch uses full norms (truncated vec scores lower)") {
    val r = Seq((Array(3.0f, 4.0f), Array(3.0f)))
      .toDF("a", "b").select(VectorFunctions.cosineSim(col("a"), col("b"))).head.getDouble(0)
    assert(math.abs(r - 0.6) < 1e-12, s"expected 9/(5*3)=0.6, got $r") // not silently 1.0
  }

  test("winnow fingerprints tolerate null tokens") {
    val r = Seq(1).toDF("x")
      .select(winnowFingerprints(array(lit("a"), lit(null).cast("string"), lit("b")), 2))
      .head.getSeq[Long](0)
    assert(r.nonEmpty && !r.contains(Long.MaxValue))
  }

  test("graft SQL function registration covers the full native surface") {
    VectorFunctions.register(spark)
    val r = spark.sql("SELECT graft_cosine(array(1.0F, 2.0F), array(1.0F, 2.0F)) AS c").head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(spark.sql("SELECT graft_simhash(array('a','b'))").head.getLong(0) ==
           spark.sql("SELECT graft_simhash(array('a','b'))").head.getLong(0))
    assert(spark.sql("SELECT size(graft_minhash(array('x'), 32))").head.getInt(0) == 32)
    assert(spark.sql("SELECT graft_shingles(array('a','b','c'), 2)").head.getSeq[String](0)
      == Seq("a b", "b c"))
    assert(spark.sql("SELECT graft_lang_id(array('the','a'))").head.getString(0) == "en")
    assert(spark.sql("SELECT size(graft_winnow(array('a','b','c','d','e')))").head.getInt(0) >= 1)
    // the aggregate form, via SQL GROUP BY, equals the per-array form
    val agg = spark.sql(
      "SELECT graft_simhash_agg(t) FROM (SELECT explode(array('a','b','c')) AS t)").head.getLong(0)
    val arr = spark.sql("SELECT graft_simhash(array('a','b','c'))").head.getLong(0)
    assert(agg == arr)
    // SpaceSaving top-k over SQL: exact in the under-capacity regime
    val hh = spark.sql(
      "SELECT graft_topk_agg(t, 2, 16) FROM (SELECT explode(array('x','x','y','x','z')) AS t)")
      .head.getSeq[org.apache.spark.sql.Row](0)
    assert(hh.map(r => (r.getString(0), r.getLong(1))) == Seq(("x", 3L), ("y", 1L)))
  }

  test("round-2 SQL functions (graft_lcs, graft_rp_bands) are registered") {
    VectorFunctions.register(spark)
    assert(spark.sql("SELECT graft_lcs(array('a','b','c'), array('b','c','d'))").head.getInt(0) == 2)
    assert(spark.sql("SELECT size(graft_rp_bands(array(1.0F, -2.0F), 8, 4))").head.getInt(0) == 8)
  }

  test("graft_top_by SQL aggregate returns exact rank-ordered (value, id) pairs") {
    VectorFunctions.register(spark)
    val top = spark.sql(
      """SELECT graft_top_by(v, id, 2) FROM (
           SELECT * FROM VALUES (1.0D, 10L), (3.0D, 7L), (3.0D, 5L), (2.0D, 1L) AS t(v, id))""")
      .head.getSeq[org.apache.spark.sql.Row](0)
    assert(top.map(r => (r.getDouble(0), r.getLong(1))) == Seq((3.0, 5L), (3.0, 7L)))
  }
}
