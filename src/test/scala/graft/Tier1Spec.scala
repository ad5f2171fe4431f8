package graft

import org.apache.spark.sql.functions._
import graft.operators.Tier1

/** Rule-per-case specs for ti01 — one planted row per
  * tier1_classifier.go rule, including every ordering subtlety the Go
  * ladder encodes (URL pattern list order, placeholder-before-
  * truncation, marker list order, img-dominant vs plain length).
  */
class Tier1Spec extends SparkSpec {
  import spark.implicits._

  private val longBody = "word " * 200 // 1000 chars, well past the floor

  private def classify(url: String, content: String): (Boolean, String) = {
    val r = Tier1.tier1GateOn(
      Seq((1L, url, content)).toDF("doc_id", "url", "content")).head()
    (r.getBoolean(1), r.getString(2))
  }

  test("url rules: list order, case-insensitive, and precedence over every content rule") {
    assert(classify("https://x.com/gallery/1", s"<p>$longBody</p>") ==
      (false, "non-article URL pattern: /gallery/"))
    // mixed case matches via lower()
    assert(classify("https://x.com/CrossWord/2", s"<p>$longBody</p>") ==
      (false, "non-article URL pattern: /crossword/"))
    // /crosswords/ is checked before /gallery/ when both occur
    assert(classify("https://x.com/crosswords/a/gallery/b", "test") ==
      (false, "non-article URL pattern: /crosswords/"))
    // /crosswords/ does NOT contain /crossword/ as a path segment match
    assert(classify("https://x.com/crosswords/3", "x")._2 ==
      "non-article URL pattern: /crosswords/")
  }

  test("placeholder: trimmed exacts, prefixes, and precedence over the truncation suffix") {
    assert(classify("https://x.com/a/1", "  test  ") == (false, "placeholder content"))
    assert(classify("https://x.com/a/1", "Discussion") == (false, "placeholder content"))
    assert(classify("https://x.com/a/1", "What to Read Next and more text") ==
      (false, "placeholder content"))
    // はじめに続きをみる starts with the placeholder prefix AND ends with
    // the 続きをみる marker — the Go ladder checks placeholder first
    assert(classify("https://x.com/a/1", "はじめに続きをみる") == (false, "placeholder content"))
    // but 'test' embedded mid-text is NOT a placeholder
    assert(classify("https://x.com/a/1", s"<p>a test of $longBody</p>")._1)
  }

  test("truncation markers: list order and both case variants") {
    assert(classify("https://x.com/a/1", s"<p>$longBody 続きをみる</p>") ==
      (false, "truncated content (ends with 続きをみる)"))
    assert(classify("https://x.com/a/1", s"<p>$longBody 続きを読む</p>") ==
      (false, "truncated content (ends with 続きを読む)"))
    assert(classify("https://x.com/a/1", s"<p>${longBody}Read more</p>") ==
      (false, "truncated content (ends with Read more)"))
    assert(classify("https://x.com/a/1", s"<p>${longBody}Read More</p>") ==
      (false, "truncated content (ends with Read More)"))
    assert(classify("https://x.com/a/1", s"<p>$longBody...</p>") ==
      (false, "truncated content (ends with ...)"))
    // … alone (not part of ...) falls through to the … marker
    assert(classify("https://x.com/a/1", s"<p>$longBody…</p>") ==
      (false, "truncated content (ends with …)"))
  }

  test("img-dominant fires only when images exist AND text is short; rich text with images passes") {
    assert(classify("https://x.com/a/1", "<p>short</p><img src=\"a.jpg\">") ==
      (false, "img-dominant content with insufficient text"))
    // images + long text → Tier-1 (the :126 branch requires BOTH)
    assert(classify("https://x.com/a/1", s"<p>$longBody</p><IMG src=\"a.jpg\">")._1)
    // no images + short → the plain length reason
    assert(classify("https://x.com/a/1", "<p>short</p>") ==
      (false, "content length below minimum"))
  }

  test("length counts tag-stripped whitespace-collapsed characters, floor at exactly 500") {
    // 499 'a's → rejected; 500 → Tier-1
    assert(classify("https://x.com/a/1", "<p>" + "a" * 499 + "</p>") ==
      (false, "content length below minimum"))
    assert(classify("https://x.com/a/1", "<p>" + "a" * 500 + "</p>")._1)
    // 300 doubled-space words collapse below the floor: raw length is
    // far past 500, normalized length is not
    val padded = Array.fill(150)("ab").mkString("   ")
    assert(padded.length > 500)
    assert(classify("https://x.com/a/1", s"<p>$padded</p>") ==
      (false, "content length below minimum"))
    // tags do not count toward length
    assert(classify("https://x.com/a/1", "<div><span>" + "b" * 120 + "</span></div>") ==
      (false, "content length below minimum"))
  }

  test("composition at sf0.001: verdicts partition the corpus and every planted cohort appears") {
    val out = Tier1.tier1Gate(spark, sfDir).collect()
    assert(out.length == Tables.documents(spark, sfDir).count())
    val reasons = out.map(_.getString(2)).toSet
    assert(reasons.contains("non-article URL pattern: /crosswords/"))
    assert(reasons.contains("placeholder content"))
    assert(reasons.exists(_.startsWith("truncated content")))
    assert(reasons.contains("img-dominant content with insufficient text"))
    assert(reasons.contains("content length below minimum"))
    out.foreach(r => assert(r.getBoolean(1) == r.getString(2).isEmpty))
  }
}
