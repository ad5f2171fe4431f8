package graft

import graft.operators.RecapCoverage
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recap coverage: the char_wb gram rule, the cosine/mean pipeline,
  * and the job rollup, one planted case per reference rule
  * (scripts/compute_recap_coverage.py).
  */
class RecapCoverageSpec extends SparkSpec {
  import spark.implicits._

  private def grams(w: String): Seq[String] =
    Seq(w).toDF("w").select(RecapCoverage.charWbGrams(col("w")).as("g"))
      .collect().head.getSeq[String](0)

  test("char_wb grams: sliding per size within the padded word; short words stop larger sizes") {
    assert(grams("ab") == Seq(" a", "ab", "b ", " ab", "ab ", " ab "),
      "padded ' ab ' (L=4): 3+2+1 grams, the 4-gram is the whole padded word")
    assert(grams("a") == Seq(" a", "a ", " a "),
      "1-char word: 2-grams slide, the 3-gram is the whole padded word, 4-grams SKIP (sklearn's offset==0 break)")
    assert(grams("abc").size == 4 + 3 + 2)
  }

  private def cov(rows: (Long, String, String, Long, String)*): DataFrame =
    RecapCoverage.coverageOn(
      rows.toSeq.toDF("job_id", "genre", "kind", "tid", "text"))

  private def row(df: DataFrame, job: Long, genre: String) =
    df.filter(col("job_id") === job && col("genre") === genre).collect().head

  test("identical bullet/centroid → coverage 1.0; disjoint → 0.0; per-bullet max then mean (:175)") {
    val out = cov(
      (0L, "g0", "b", 1L, "alpha beta"),
      (0L, "g0", "c", 2L, "alpha beta"),   // cos 1 with bullet 1
      (0L, "g0", "b", 3L, "zzzz"),         // shares no gram with any centroid → max 0
      (0L, "g1", "b", 4L, "qqqq"),
      (0L, "g1", "c", 5L, "wwww"))
    val g0 = row(out, 0L, "g0")
    assert(g0.getDouble(2) == 0.5, "mean of per-bullet maxima: (1.0 + 0.0) / 2")
    assert(g0.getLong(3) == 2 && g0.getLong(4) == 1)
    assert(row(out, 0L, "g1").getDouble(2) == 0.0, "disjoint grams → zero coverage")
  }

  test("empty centroid set → coverage 0.0 with the row kept (:164)") {
    val out = cov(
      (0L, "g0", "b", 1L, "alpha"),
      (0L, "g2", "b", 2L, "alpha"))        // no 'c' rows for g2
    val g2 = row(out, 0L, "g2")
    assert(g2.getDouble(2) == 0.0 && g2.getLong(4) == 0)
  }

  test("job rollup: population std over genre coverages, 0.0 for a single genre (:212)") {
    val out = cov(
      (0L, "g0", "b", 1L, "alpha beta"), (0L, "g0", "c", 2L, "alpha beta"),
      (0L, "g1", "b", 3L, "qqqq"), (0L, "g1", "c", 4L, "wwww"),
      (1L, "g0", "b", 5L, "solo text"), (1L, "g0", "c", 6L, "solo text"))
    val j0 = row(out, 0L, "g0")
    assert(j0.getDouble(5) == 0.5 && j0.getDouble(6) == 0.5,
      "avg and np.std of [1.0, 0.0] are both 0.5")
    assert(j0.getDouble(7) == 0.0 && j0.getDouble(8) == 1.0)
    assert(j0.getLong(9) == 2)
    val j1 = row(out, 1L, "g0")
    assert(j1.getDouble(6) == 0.0, "one genre → std 0.0")
    assert(j1.getDouble(2) == 1.0)
  }

  test("idf weighting: a shared rare gram outweighs shared common grams") {
    // bullet b1 shares the RARE word with c1 and only common filler
    // with c2 → max cosine comes from c1
    val out = RecapCoverage.coverageOn(Seq(
      (0L, "g0", "b", 1L, "filler rareword"),
      (0L, "g0", "c", 2L, "filler rareword"),
      (0L, "g0", "c", 3L, "filler other"),
      (0L, "g0", "c", 4L, "filler more")).toDF("job_id", "genre", "kind", "tid", "text"))
    assert(row(out, 0L, "g0").getDouble(2) == 1.0,
      "the identical-text centroid dominates the max")
  }

  test("composition exercises both empty-centroid and populated groups at sf0.001") {
    val out = RecapCoverage.qe06(spark, sfDir).cache()
    assert(out.filter(col("genre") === "g2" && col("n_centroids") === 0).count() > 0,
      "g2 keeps no centroids by composition")
    assert(out.filter(col("coverage") > 0).count() > 0,
      "overlapping corpus slices produce real coverage")
    assert(out.filter(col("n_bullets") === 0).count() == 0)
    out.unpersist()
  }
}
