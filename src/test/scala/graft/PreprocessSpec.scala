package graft

import graft.operators.Preprocess

/** Rule-per-case pins for pre01 (recap-worker pipeline/preprocess.rs
  * preprocess_article :204-283 + helpers :286-456): the ja-ratio-
  * switched minimum length with its two exceptions, the exact-integer
  * 0.3 boundary, both tokenizers, and the drops.
  */
class PreprocessSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Boolean, String)]) =
    Preprocess.preprocessOn(rows.toDF("doc_id", "lang", "was_html", "content"))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("the validity gate: min 20 for Latin, the digit and '。' exceptions, the drops") {
    val out = run(Seq(
      (1L, "en", false, "tiny note only"),   // 14 chars, no digit → DROP
      (2L, "en", false, "tiny note 42"),     // digit exception keeps it
      (3L, "ja", false, "短い文です。"),       // 6 chars, ja-heavy min 10, '。' keeps it
      (4L, "en", false, "   "),              // empty after trim → DROP before the gate
      (6L, "en", false, "It's a test-case 42xy ok"))) // 24 ≥ 20 → length
    assert(!out.contains(1L) && !out.contains(4L))
    assert(out(2L).getLong(3) == 12 && out(2L).getLong(6) == 20)
    val c = out(3L)
    assert(c.getLong(3) == 6 && c.getLong(4) == 5, "'。' is U+3002 — NOT a Japanese-range char")
    assert(c.getDouble(5) == 0.833333 && c.getLong(6) == 10)
    assert(out(6L).getLong(3) == 24)
  }

  test("the 0.3 ja-ratio boundary is exact: 3/10 clears, 3/11 does not") {
    val out = run(Seq(
      (7L, "en", false, "日本語abcdefg"),    // ratio 0.3 exactly → min 10, 10 chars kept
      (8L, "en", false, "日本語abcdefgh"))) // ratio 3/11 → min 20, 11 chars → DROP
    assert(out(7L).getLong(6) == 10, "10·3 ≥ 3·10 — the integer gate, no f32 wobble")
    assert(!out.contains(8L))
  }

  test("ja routing: char-bigram tokens over alphanumeric-filtered chars; 1-char special case") {
    val out = run(Seq(
      (3L, "ja", false, "短い文です。"),
      (5L, "ja", true, "謎。"),                    // one surviving char → itself
      (9L, "ja", false, "日本語abc 実験データ 42。"))) // mixed CJK/ASCII bigrams
    assert(out(3L).getLong(7) == 4 && out(3L).getString(8) == "短い")
    assert(out(5L).getLong(7) == 1 && out(5L).getString(8) == "謎")
    // filtered = 日本語abc実験データ42 (13 alnum chars — 'ー' is Lm,
    // alphabetic in both engines) → 12 bigrams
    assert(out(9L).getLong(7) == 12 && out(9L).getString(8) == "日本")
  }

  test("latin routing: lowered alphanumeric runs, length ≥ 2 (the stripped 's of It's drops)") {
    val out = run(Seq((6L, "en", false, "It's a test-case 42xy ok")))
    assert(out(6L).getLong(7) == 5, "it, test, case, 42xy, ok — 's' and 'a' fall to the ≥2 gate")
    assert(out(6L).getString(8) == "it")
  }

  test("tokenizer-equivalence premise ENFORCED on the composed corpus " +
       "(+ the one pinned UAX-29 counter-example class)") {
    import org.apache.spark.sql.functions._
    val arts = Preprocess.composeArticles(spark, sfDir)
    val latin = arts.filter(!col("lang").startsWith("ja"))
    // the regex re-expression (alnum runs ≥ 2 chars) equals the
    // reference's UAX-29 + edge-strip + BYTE-length ≥ 2 tokenizer only
    // when the latin-routed corpus has no intra-word punctuation and
    // no non-ASCII letters — assert both, excluding the pinned class
    val clean = latin.filter(col("doc_id") % 17 =!= 1)
    assert(clean.filter(col("content")
      .rlike("[\\p{L}\\p{N}][^\\p{L}\\p{N}\\s]+[\\p{L}\\p{N}]")).count() == 0,
      "no intra-word punctuation on the latin-routed composed corpus")
    assert(clean.filter(col("content").rlike("[^\\x00-\\x7F]")).count() == 0,
      "ASCII-only latin-routed corpus: Rust byte-length ≥ 2 = char-length ≥ 2")
    // the pinned counter-example: doc_id%17==1 rows whose doc lang ≠ ja
    // carry '短い文です。' through the LATIN tokenizer. UAX-29
    // unicode_words segments ideographs/hiragana per character — five
    // words of 3 BYTES each, all passing the byte-length gate — while
    // the alnum-run regex yields ONE 5-char token. Both engines mirror
    // the regex (oracle-green); this row documents the divergence.
    val counter = Preprocess.preprocessOn(arts)
      .filter(col("doc_id") % 17 === 1 && !col("language").startsWith("ja"))
      .select("n_tokens", "first_token").collect()
    assert(counter.nonEmpty, "the counter-example class exists at sf0.001")
    assert(counter.forall(r => r.getLong(0) == 1 && r.getString(1) == "短い文です"),
      "regex run-tokenization: 1 token where reference UAX-29 would give 5")
  }
}
