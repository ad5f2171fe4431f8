package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** ld01: the in-house article language detector — pre-processor's
  * `DetectLanguage` (pre-processor/app/utils/language_detector.go
  * :24-66), production-wired at driver/backend_api/article_driver.go:57
  * (title+"\n"+content on every fetched article) and
  * service/language_backfill.go:96 (title-only backfill). This is the
  * DETERMINISTIC in-house heuristic, distinct from tx05's composed
  * n-gram class and from the env-blocked langdetect/lingua runtimes —
  * found by the round-16 third-pass basename diff.
  *
  * Reference rules, in order:
  *  - all-whitespace text → "und" (strings.TrimSpace);
  *  - jpLetters = runes in the Unicode Hiragana/Katakana/Han SCRIPTS
  *    (unicode.Is on the script tables — includes halfwidth katakana
  *    and the Han extensions; Spark spells the property
  *    `\p{IsHiragana}`, RE2 `\p{Hiragana}` — same Unicode script
  *    data, BMP-composed pin);
  *  - enLetters = letters below U+0100 (unicode.IsLetter && r<0x100 =
  *    exactly [A-Za-zªµºÀ-ÖØ-öø-ÿ], spelled out because RE2 has no
  *    class intersection);
  *  - fewer than 2 total letters → "und";
  *  - jp·3 ≥ total → "ja" (the reference's own comment: CJK is
  *    information-dense — "The word 寿司 is popular" stays English,
  *    "東京オリンピック 2028 開催地決定" stays Japanese; exact
  *    integer cross-multiplication);
  *  - en > jp → "en"; else "und".
  *
  * The entry runs on the RAW documents.text — no composition needed;
  * the planted boundary rows live in the spec.
  *
  * Scale: two counting regex projections per row, fused into the scan —
  * zero shuffles.
  */
object LangDetect {

  private val JpClass = "[\\p{IsHiragana}\\p{IsKatakana}\\p{IsHan}]"
  private val EnClass = "[A-Za-zªµºÀ-ÖØ-öø-ÿ]"

  /** DetectLanguage(:24-54) as a column. */
  def detect(text: Column): Column = {
    val jp = length(text) - length(regexp_replace(text, JpClass, ""))
    val en = length(text) - length(regexp_replace(text, EnClass, ""))
    val total = jp + en
    when(text.isNull || text.rlike("^\\s*$"), "und")
      .when(total < 2, "und")
      .when(jp * 3 >= total, "ja")
      .when(en > jp, "en")
      .otherwise("und")
  }

  /** ld01 adapter: the detector over document text, with four planted
    * classes exercising every outcome on real rows (pre01's mixed-ja
    * composition precedent — the synthetic corpus alone is
    * English-dominant): dense Japanese (ja), the reference's own
    * sushi-in-English case (en), whitespace-only (und), digits-only
    * (und via the <2-letter rule).
    */
  def ld01(s: SparkSession, dir: String): DataFrame = {
    val cls = col("doc_id") % 5
    val body = when(cls === 0, concat(lit("東京オリンピック開催地決定の記事 "), substring(col("text"), 1, 30)))
      .when(cls === 1, concat(lit("The word 寿司 is popular. "), col("text")))
      .when(cls === 2, lit("   \t  "))
      .when(cls === 3, lit("42 7 100 "))
      .otherwise(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"), detect(body).as("detected"))
  }

  /** DuckDB twin — RE2 script-property spellings. */
  val ld01OracleSql: String =
    s"""SELECT doc_id,
         CASE WHEN text IS NULL OR regexp_matches(text, '^\\s*$$') THEN 'und'
              WHEN jp + en < 2 THEN 'und'
              WHEN jp * 3 >= jp + en THEN 'ja'
              WHEN en > jp THEN 'en'
              ELSE 'und' END AS detected
       FROM (SELECT doc_id, text,
               length(text) - length(regexp_replace(text,
                 '[\\p{Hiragana}\\p{Katakana}\\p{Han}]', '', 'g')) AS jp,
               length(text) - length(regexp_replace(text,
                 '[A-Za-zªµºÀ-ÖØ-öø-ÿ]', '', 'g')) AS en
             FROM (SELECT doc_id,
                     CASE doc_id % 5
                       WHEN 0 THEN '東京オリンピック開催地決定の記事 ' || substr(text, 1, 30)
                       WHEN 1 THEN 'The word 寿司 is popular. ' || text
                       WHEN 2 THEN '   ' || chr(9) || '  '
                       WHEN 3 THEN '42 7 100 '
                       ELSE text END AS text
                   FROM documents))"""
}
