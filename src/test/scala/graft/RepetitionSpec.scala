package graft

import graft.operators.Repetition

/** LLM-output repetition detection: one planted case per reference
  * rule (news-creator utils/repetition_detector.py).
  */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def detect(s: String): (Int, Int, Int, Int, Int, Int, Double, Boolean) = {
    val r = Repetition.detectOn(Seq((1L, s)).toDF("out_id", "t"), "t").collect().head
    (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6),
      r.getDouble(7), r.getBoolean(8))
  }

  test("word repeats: 3+ consecutive, case-insensitive; two is not a run") {
    assert(detect("padding text here go Go gO onwards")._1 == 1)
    assert(detect("padding text here go Go onwards")._1 == 0)
  }

  test("html/attr/url runs need the SAME tag/attribute/url three times") {
    assert(detect("body </p></p></p> tail")._2 == 1)
    assert(detect("body <a><b><a> tail")._2 == 0, "alternating tags are not a run")
    assert(detect("""body k="v" k="v" k="v" tail""")._3 == 1)
    assert(detect("x http://a.io/1 http://a.io/1 http://a.io/1")._5 == 1)
    assert(detect("x http://a.io/1 http://a.io/2 http://a.io/3")._5 == 0)
  }

  test("short-string runs skip the common-word allowlist; word repeats still count them") {
    val the = detect("filler content the the the goes on")
    assert(the._1 == 1 && the._4 == 0,
      "'the the the' is a word repeat but NOT a short-string repeat (:63)")
    val zz = detect("filler content zz zz zz goes on")
    assert(zz._1 == 1 && zz._4 == 1)
  }

  test("char runs need 4+; the under-10-chars gate zeroes the score but the flag logic stays") {
    assert(detect("waiting----- done")._6 == 1)
    assert(detect("waiting--- done")._6 == 0)
    val tiny = detect("aaaa")
    assert(tiny._6 == 1 && tiny._7 == 0.0 && !tiny._8,
      "texts under 10 stripped chars return score 0 (:26)")
  }

  test("overall score is the MAX family score, not a sum; counts cap at 1.0") {
    val both = detect("pad pad pad </p></p></p> tail")
    assert(both._7 == 0.3 && both._8, "max(0.2 word, 0.3 html) — severe family decides")
    val many = detect("a1 a1 a1 b2 b2 b2 c3 c3 c3 d4 d4 d4 e5 e5 e5 f6 f6 f6")
    assert(many._7 == 1.0, "6 word patterns × 0.2 caps at 1.0")
  }

  test("composition: both verdicts and every family fire at sf0.001") {
    val out = Repetition.rp01(spark, "/root/testdata/sf0.001").cache()
    assert(out.filter("has_repetition").count() > 0)
    assert(out.filter("NOT has_repetition AND score > 0").count() > 0,
      "sub-threshold repetition exists")
    for (c <- Seq("n_word", "n_html", "n_attr", "n_short", "n_url", "n_char"))
      assert(out.filter(s"$c > 0").count() > 0, s"$c never fires")
    out.unpersist()
  }
}
