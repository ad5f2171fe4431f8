package graft

import org.apache.spark.sql.functions._
import graft.operators.LangDetect

/** Rule-per-case pins for ld01 — pre-processor
  * utils/language_detector.go DetectLanguage (:24-54) +
  * isJapaneseLetter (:56-66).
  */
class LangDetectSpec extends SparkSpec {
  import spark.implicits._

  private def det(texts: String*): Seq[String] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t").orderBy("id")
      .select(LangDetect.detect(col("t")).as("d"))
      .collect().map(_.getString(0)).toSeq

  test("the reference's own tuning examples: sushi-in-English stays en, dense Japanese stays ja (:45-47)") {
    assert(det("The word 寿司 is popular", "東京オリンピック 2028 開催地決定") ==
      Seq("en", "ja"))
  }

  test("whitespace-only and <2-letter texts are und; digits are not letters (:26-28, :40-42)") {
    assert(det("", "   \t\n ", "42 7 100", "a", "ab") ==
      Seq("und", "und", "und", "und", "en"))
  }

  test("the jp*3 >= total boundary is inclusive; exactly one third of CJK flips to ja (:50)") {
    // 1 jp + 2 latin: 3 >= 3 -> ja; 1 jp + 3 latin: 3 < 4 and en>jp -> en
    assert(det("寿 ab", "寿 abc") == Seq("ja", "en"))
  }

  test("katakana (incl. halfwidth), hiragana and Han all count as Japanese scripts (unicode.Is tables, :56-66)") {
    assert(det("カタカナ", "ひらがな", "漢字文字", "ｶﾀｶﾅ") ==
      Seq("ja", "ja", "ja", "ja"))
  }

  test("Latin-1 letters beyond ASCII count as English letters (IsLetter && r < 0x100): café, naïve") {
    assert(det("café naïve résumé") == Seq("en"))
  }

  test("en requires en > jp strictly; a 50/50 below the ja bar is und (:51-53 — unreachable when jp*3>=total covers jp>=1/3, pinned: en>jp fails only at jp==en which ja already took)") {
    // jp=1, en=2: ja (3>=3). jp=0, en=0 handled above. jp=1 en=1: ja.
    assert(det("寿a") == Seq("ja"))
  }
}
