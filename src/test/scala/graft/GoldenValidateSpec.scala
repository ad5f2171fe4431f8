package graft

import graft.operators.GoldenValidate
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Golden-dataset validation: one case per reference rule
  * (recap-worker/scripts/validate_golden_dataset.py:42).
  */
class GoldenValidateSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("id", "expected_genres", "primary_genre", "difficulty",
    "language_pairing", "source", "content_ja", "content_en", "content",
    "style", "terminology_density", "boundary_pair", "secondary_genres")

  private def item(id: String = "i1",
                   expected: Seq[String] = Seq("sports"),
                   primary: String = "sports",
                   difficulty: String = "baseline",
                   pairing: String = "none",
                   source: String = "s",
                   ja: String = "body", en: String = null, c: String = null,
                   style: String = null, density: String = null,
                   bp: Seq[String] = Seq("a", "b"),
                   sg: Seq[String] = Seq("sports")) =
    (id, expected, primary, difficulty, pairing, source, ja, en, c,
      style, density, bp, sg)

  private def checks(items: (String, Seq[String], String, String, String, String,
    String, String, String, String, String, Seq[String], Seq[String])*): Map[String, Row] =
    GoldenValidate.itemChecksOn(items.toSeq.toDF(cols: _*))
      .collect().map(r => r.getString(0) -> r).toMap

  test("missing required fields count per field; defaults keep processing (:88,:98)") {
    val r = checks(item(), item(id = "i2", primary = null, source = null))("i2")
    assert(r.getInt(1) == 2, "primary_genre and source both missing")
    assert(r.getString(13) == "baseline" && r.getString(15) == "",
      "the get() defaults feed the distributions")
  }

  test("content rule: blank-after-strip strings don't count (:92-96)") {
    val m = checks(
      item(id = "a", ja = "   ", en = null, c = null),
      item(id = "b", ja = null, en = "text", c = null))
    assert(m("a").getBoolean(2) && !m("b").getBoolean(2))
  }

  test("whitelists: defaulted difficulty/pairing validate; None style/density are VALID (:100-135)") {
    val m = checks(
      item(id = "a", difficulty = "impossible", pairing = "both"),
      item(id = "b", difficulty = null, pairing = null),
      item(id = "c", style = "fancy", density = "ultra"),
      item(id = "d", style = "headline", density = "low"))
    assert(m("a").getBoolean(3) && m("a").getBoolean(4))
    assert(!m("b").getBoolean(3) && !m("b").getBoolean(4),
      "missing fields default to valid values — the error is n_missing_required's")
    assert(m("c").getBoolean(8) && m("c").getBoolean(9))
    assert(!m("d").getBoolean(8) && !m("d").getBoolean(9))
  }

  test("genre warnings, boundary_pair and secondary_genres rules (:110-143)") {
    val m = checks(
      item(id = "a", primary = "mystery", expected = Seq("sports", "weird")),
      item(id = "b", expected = Seq()),
      item(id = "c", difficulty = "boundary", bp = Seq("x")),
      item(id = "d", difficulty = "hard", sg = Seq()),
      item(id = "e", difficulty = "baseline", bp = Seq("x"), sg = Seq()))
    assert(m("a").getBoolean(5) && m("a").getInt(7) == 1)
    assert(m("b").getBoolean(6))
    assert(m("c").getBoolean(10) && m("d").getBoolean(11))
    assert(!m("e").getBoolean(10) && !m("e").getBoolean(11),
      "pair/secondary rules only apply to their difficulty")
  }

  test("vg02: exact below-target gates, duplicate ids are ONE error (:73,:160-186)") {
    // 20 items: 11 baseline (55% — NOT < 55), 5 boundary (25%), 4 hard
    // (20%); parallel 4/20 = 20% < 25 → warning; two ids collide
    val items = (0 until 11).map(i => item(id = s"b$i", primary = "sports")) ++
      (0 until 5).map(i => item(id = s"n$i", difficulty = "boundary")) ++
      (0 until 4).map(i => item(id = if (i < 2) "dup" else s"h$i",
        difficulty = "hard", pairing = if (i < 4) "parallel" else "none"))
    val r = GoldenValidate.reportOn(items.toDF(cols: _*)).collect().head
    assert(r.getLong(0) == 20)
    assert(r.getDouble(4) == 55.0 && !r.getBoolean(8),
      "exactly 55% baseline is NOT below the 55 floor (strict <)")
    assert(r.getDouble(7) == 20.0 && r.getBoolean(11), "20% parallel < 25 warns")
    assert(r.getBoolean(12), "duplicate ids detected")
    assert(r.getLong(2) == 30, "every EXPECTED genre is under 100 here")
    assert(r.getLong(13) == 30 + 1, "30 genre-minimum errors + ONE duplicates error")
    assert(!r.getBoolean(15))
  }

  test("composition: every flag fires and the report is deterministic at sf0.001") {
    val f = GoldenValidate.vg01(spark, sfDir).cache()
    for (c <- Seq("no_content", "invalid_difficulty", "invalid_pairing",
                  "unexpected_primary", "empty_expected", "invalid_style",
                  "invalid_density", "bad_boundary_pair", "missing_secondary", "dup_id"))
      assert(f.filter(col(c) === true).count() > 0, s"flag $c never fires")
    assert(f.filter(col("n_missing_required") > 0).count() > 0)
    f.unpersist()
    val r = GoldenValidate.vg02(spark, sfDir).collect().head
    assert(r.getLong(13) > 0 && !r.getBoolean(15))
  }
}
