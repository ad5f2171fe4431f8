package graft

import graft.operators.ArticleSizes
import org.apache.spark.sql.functions._

/** Article size distribution: the token estimate, truncated
  * percentiles and context-fit shares
  * (news-creator/app/scripts/analyze_article_sizes.py:112).
  */
class ArticleSizesSpec extends SparkSpec {
  import spark.implicits._

  private def sizes(contents: String*): org.apache.spark.sql.Row =
    ArticleSizes.sizesOn(contents.toSeq.toDF("content")).collect().head

  test("token estimate: max(1, len·3 // 4), empty text floors at 1 (:72)") {
    val r = sizes("", "x", "abcd")
    // lens 0,1,4 → tokens 1,1,3
    assert(r.getLong(4) == 1 && r.getLong(5) == 3)
  }

  test("percentiles interpolate then TRUNCATE (:145)") {
    // chars 10,20,30,40 → P75 position = 3·0.75 = 2.25 → 30 + 0.25·10
    // = 32.5 → int() → 32
    val r = sizes("a" * 10, "a" * 20, "a" * 30, "a" * 40)
    val p75 = r.getLong(r.fieldIndex("char_p75"))
    assert(p75 == 32L, s"got $p75")
    assert(r.getLong(r.fieldIndex("char_p50")) == 25L)
    assert(r.getLong(r.fieldIndex("char_p99_9")) == 39L, "39.97 truncates to 39")
  }

  test("context-fit rates: share of token estimates within limit, 2 dp (:156)") {
    // 3 articles: tokens 7500 (fits 8K-500), 12000, 45000 → 8K fit 1/3
    val r = sizes("a" * 10000, "a" * 16000, "a" * 60000)
    assert(r.getDouble(r.fieldIndex("fit_8K")) == 33.33)
    assert(r.getDouble(r.fieldIndex("fit_16K")) == 66.67)
    assert(r.getDouble(r.fieldIndex("fit_60K")) == 100.0)
  }

  test("means are exact micro-unit chains (:139)") {
    val r = sizes("a" * 10, "a" * 21)
    assert(r.getDouble(3) == 15.5 && r.getLong(1) == 10 && r.getLong(2) == 21)
    // tokens 7 and 15 → mean 11.0
    assert(r.getDouble(6) == 11.0)
  }

  test("composition at sf0.001") {
    val r = ArticleSizes.as01(spark, sfDir).collect().head
    assert(r.getLong(0) > 0)
    assert(r.getDouble(r.fieldIndex("fit_60K")) == 100.0,
      "synthetic docs all fit the large context")
    assert(r.getLong(r.fieldIndex("char_p10")) <= r.getLong(r.fieldIndex("char_p99_9")))
  }
}
