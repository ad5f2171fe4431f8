package graft

import graft.operators.GenreWeights
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Genre-weight trainer: one planted case per reference rule
  * (scripts/compute_genre_weights_statistically.py).
  */
class GenreWeightsSpec extends SparkSpec {
  import spark.implicits._

  private def samples(rows: (String, String)*): DataFrame =
    rows.toSeq.toDF("genre", "text")

  private def weightRow(df: DataFrame, genre: String, term: String) =
    df.filter(col("genre") === genre && col("term") === term).collect().head

  test("matching: token-exact singles, plural expansion, raw-substring multi-words, once per sample") {
    val w = GenreWeights.weightsOn(samples(
      ("ai", "transformers rock the arts"),       // plural → transformer, art
      ("ai", "economy economy economy"),          // three occurrences count ONCE
      ("tech", "restock markets opened"),         // 'stock market' as RAW substring (:278)
      ("tech", "transformer banks")))             // exact token
    assert(weightRow(w, "ai", "transformer").getLong(2) == 1)
    assert(weightRow(w, "ai", "art").getLong(2) == 1)
    assert(weightRow(w, "ai", "economy").getLong(2) == 1,
      "feature_counts is += 1 per SAMPLE, not per occurrence (:279)")
    assert(weightRow(w, "tech", "stock market").getLong(2) == 1,
      "multi-word entries match by substring, no word boundary (:277)")
    assert(weightRow(w, "tech", "transformer").getLong(2) == 1)
  }

  test("CJK tokens match through the explicit unicode class") {
    val w = GenreWeights.weightsOn(samples(
      ("world", "明日は 人工知能 投資 の未来"),
      ("world", "人工知能と投資の話")))          // contiguous run = ONE token → no match
    assert(weightRow(w, "world", "人工知能").getLong(2) == 1,
      "space-delimited CJK terms tokenize and match")
    assert(weightRow(w, "world", "投資").getLong(2) == 1)
  }

  test("invalid genres are skipped entirely; genre labels lowercase first (:265)") {
    val w = GenreWeights.weightsOn(samples(
      ("AI", "transformer"),                       // lowers to valid 'ai'
      ("unmapped", "transformer economy treaty"))) // skipped: counts NOWHERE
    assert(weightRow(w, "ai", "transformer").getLong(2) == 1)
    assert(w.agg(sum("cnt")).collect().head.getLong(0) == 1,
      "the invalid-genre sample contributes no counts")
    assert(weightRow(w, "ai", "transformer").getLong(3) == 1,
      "genre_totals counts only valid samples — total_docs excludes skips")
  }

  test("idf and weight match the hand case; unseen terms take idf = 1.0 (:301)") {
    // total_docs = 2; transformer in 1 genre → idf = 1 + ln(3/2);
    // crossword nowhere → dwt = 0 → idf = 1.0 exactly
    val w = GenreWeights.weightsOn(samples(
      ("ai", "transformer"), ("tech", "plain words")))
    val t = weightRow(w, "ai", "transformer")
    val idf6 = math.round((1.0 + math.log(3.0 / 2.0)) * 1e6) / 1e6
    assert(t.getDouble(4) == idf6)
    assert(t.getDouble(5) == math.round(1.0 * idf6 * 1.5 * 1e3) / 1e3,
      "weight = round(tf · idf · 1.5, 3) with tf = cnt/total_g (:308)")
    assert(weightRow(w, "tech", "crossword").getDouble(4) == 1.0)
    assert(weightRow(w, "tech", "crossword").getDouble(5) == 0.0)
  }

  test("zero-sample genre: tf denominator floors at 1, weight 0, full matrix row present") {
    val w = GenreWeights.weightsOn(samples(("ai", "transformer")))
    assert(w.count() == GenreWeights.genres.size.toLong * GenreWeights.vocab.size,
      "the output is the FULL genres×vocab matrix")
    val o = weightRow(w, "other", "transformer")
    assert(o.getLong(2) == 0 && o.getLong(3) == 0 && o.getDouble(5) == 0.0)
  }

  test("embedding means average ONLY matched lookup terms; default is uniform 0.167 (:335)") {
    val e = GenreWeights.embeddingBiasOn(samples(
      ("ai", "transformer treaty"),   // dims: (1+0)/2, (0+.3)/2, (0+.8)/2
      ("tech", "investment")))        // investment has NO embedding → default
    val ai = e.filter(col("genre") === "ai").orderBy("dim_idx").collect()
    assert(ai.map(_.getLong(2)).toSeq == Seq.fill(6)(2L), "hits = matched embed terms")
    assert(ai.map(_.getDouble(3)).toSeq == Seq(0.5, 0.15, 0.4, 0.0, 0.0, 0.0))
    val tech = e.filter(col("genre") === "tech").orderBy("dim_idx").collect()
    assert(tech.map(_.getDouble(3)).toSeq == Seq.fill(6)(0.167),
      "a genre whose matches carry no embeddings falls back to the uniform default")
  }

  test("bias = round(-0.3 + freq·0.2, 3) over valid-sample frequency (:353)") {
    val e = GenreWeights.embeddingBiasOn(samples(
      ("ai", "x"), ("ai", "y"), ("tech", "z"), ("unmapped", "skipped")))
    def bias(g: String) =
      e.filter(col("genre") === g && col("dim_idx") === 0).collect().head.getDouble(4)
    assert(bias("ai") == math.round((-0.3 + 2.0 / 3 * 0.2) * 1e3) / 1e3,
      "total excludes the invalid-genre sample")
    assert(bias("tech") == math.round((-0.3 + 1.0 / 3 * 0.2) * 1e3) / 1e3)
    assert(bias("other") == -0.3, "zero-frequency genre sits at the floor")
  }

  test("composition exercises every rule at sf0.001") {
    val w = GenreWeights.gw01(spark, sfDir).cache()
    for (t <- GenreWeights.vocab if t != "crossword")
      assert(w.filter(col("term") === t && col("cnt") > 0).count() > 0,
        s"planted term '$t' never matched")
    assert(w.filter(col("term") === "crossword" && col("cnt") > 0).count() == 0,
      "crossword is the never-planted idf=1.0 term")
    assert(w.filter(col("genre") === "other" && col("total_g") > 0).count() == 0,
      "'other' is unreachable by composition")
    w.unpersist()
  }
}
