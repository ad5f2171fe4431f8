package graft

import graft.operators.ContentInspect
import org.apache.spark.sql.functions._

/** Raw-content HTML inspection: one case per reference rule
  * (scripts/inspect_article_content.py:96).
  */
class ContentInspectSpec extends SparkSpec {
  import spark.implicits._

  private def inspect(content: String): org.apache.spark.sql.Row =
    ContentInspect.inspectOn(Seq((1L, content)).toDF("doc_id", "content"))
      .collect().head

  test("empty content returns the all-zero/false row (:98)") {
    val r = inspect("")
    assert(!r.getBoolean(1) && r.getInt(2) == 0 && r.getDouble(3) == 0.0 &&
      !r.getBoolean(4) && !r.getBoolean(5) && r.getDouble(6) == 0.0 &&
      r.getString(7) == "" && r.getString(8) == "")
  }

  test("html_ratio counts joined tag characters; is_html gates STRICTLY above 0.3 (:112,:123)") {
    // '<i>' ×3 = 9 tag chars over 30 → exactly 0.3 → NOT html
    val boundary = "<i>" * 3 + "x" * 21
    assert(boundary.length == 30)
    val b = inspect(boundary)
    assert(!b.getBoolean(1) && b.getDouble(3) == 30.0)
    assert(inspect("<i>" * 3 + "x" * 20).getBoolean(1), "9/29 > 0.3 flips it")
  }

  test("starts_with_html checks the STRIPPED prefix and forces is_html (:116)") {
    val r = inspect("  <html lang=\"en\">" + "plain words " * 10)
    assert(r.getBoolean(4) && r.getBoolean(1),
      "leading whitespace doesn't mask the prefix; low tag ratio doesn't matter")
    assert(!inspect("<div>x</div>").getBoolean(4), "'<div' is not an html prefix")
    assert(inspect("<!DOCTYPE html>x").getBoolean(4))
  }

  test("has_meaningful_text: stripped tag-free share strictly above 0.5 (:120)") {
    assert(inspect("<span></span>" + "y" * 14).getBoolean(5),
      "14 text chars of 27 total > 0.5")
    assert(!inspect("<span></span>" + "y" * 13).getBoolean(5),
      "13 of 26 is exactly 0.5 — strict")
  }

  test("samples: first 200 always, last 200 only when length EXCEEDS 200 (:130)") {
    val exact = "a" * 200
    val r = inspect(exact)
    assert(r.getString(7) == exact && r.getString(8) == "",
      "exactly 200 chars → no tail sample")
    val long = "b" * 201
    val r2 = inspect(long)
    assert(r2.getString(7) == "b" * 200 && r2.getString(8) == "b" * 200)
  }

  test("composition plants every branch at sf0.001") {
    val out = ContentInspect.ic01(spark, sfDir).cache()
    assert(out.filter(col("starts_with_html")).count() > 0)
    assert(out.filter(col("is_html") && !col("starts_with_html")).count() > 0,
      "the tag-ratio-only html case exists")
    assert(out.filter(!col("is_html") && col("html_tag_count") > 0).count() > 0,
      "light markup stays non-html")
    assert(out.filter(col("html_ratio_pct") === 0.0 && length(col("sample_start")) > 0).count() > 0)
    out.unpersist()
  }
}
