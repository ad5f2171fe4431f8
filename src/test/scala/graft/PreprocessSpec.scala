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
}
