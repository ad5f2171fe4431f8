package graft

import graft.operators.Golden
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-set evaluation: one planted case per reference rule
  * (recap-worker evaluation/golden.rs + evaluation/metrics.rs +
  * pipeline/genre_keywords.rs). Every expected value is hand-computed
  * from the reference semantics.
  */
class GoldenSpec extends SparkSpec {
  import spark.implicits._

  private def scores(text: String): Map[String, Int] =
    Golden.genreScoresOn(Seq((1L, text)).toDF("job_id", "t"), "t")
      .collect().map(r => r.getString(1) -> r.getInt(2)).toMap

  test("score_text: ASCII keywords need word boundaries — api does NOT fire inside rapid") {
    assert(scores("rapid api growth") == Map("software_dev" -> 1))
    assert(scores("rapid growth") == Map.empty)
    // multi-word keyword boundaries apply to the whole phrase: 'big
    // data' inside 'big database' fails the trailing boundary, and
    // 'data' inside 'database' fails both
    assert(scores("big database") == Map.empty)
    assert(scores("big data lake") == Map("ai_data" -> 2)) // big data + data
  }

  test("score_text: presence not occurrence, case-insensitive, CJK contains") {
    assert(scores("api api api") == Map("software_dev" -> 1),
      "a keyword present three times scores once (genre_keywords.rs:593 'found')")
    assert(scores("API and Machine Learning on DATA") ==
      Map("software_dev" -> 1, "ai_data" -> 2))
    assert(scores("導入した機械学習です") == Map("ai_data" -> 1),
      "non-ASCII keywords are plain contains — no boundaries (genre_keywords.rs:618)")
  }

  test("score_text: a negative keyword suppresses its genre entirely") {
    assert(scores("cloud api") == Map("software_dev" -> 2))
    assert(scores("cloud api game") == Map.empty,
      "negatives are checked FIRST and skip the genre (genre_keywords.rs:583)")
    // the negative is plain contains too: 'esports' (sports negative)
    // inside a longer run still fires
    assert(scores("tournament of esportsmania") == Map.empty)
  }

  /** The 8-run hand-computed EvaluationSummary fixture: every skip
    * path and accuracy tier fires exactly once.
    */
  private val runs: DataFrame = Seq(
    // (job, cohort, genre, quality, diagnostics, summary, reference)
    (1L, "good", Some("sports"), Some(0.5), """{"noise_ratio": 0.10}""",
      Some("tournament championship olympics now"),
      Some("tournament championship olympics now")),
    (2L, "good", Some("sports"), None, """{"retries": 1}""",
      Some("museum exhibition festival and tournament championship"),
      Some("tournament run")),
    (3L, "good", Some("ai_data"), Some(0.25), """{"noise_ratio": 0.30}""",
      Some("museum exhibition festival then health vaccine then data"),
      Some("data only here")),
    (4L, "good", Some("economics_macro"), Some(0.75), "{}",
      Some("inflation gdp economy on stock view"), Some("")),
    (5L, "bad", None, None, "{}", Some("ai data"), Some("ai data")),
    (6L, "bad", Some("health_medicine"), None, "{}", None, Some("x")),
    (7L, "bad", Some("software_dev"), None, "{}", Some("   "), Some("x")),
    (8L, "bad", Some("culture_arts"), None, "{}", Some("!!! ???"), Some("alpha")))
    .toDF("job_id", "cohort", "genre", "quality_score", "diagnostics",
      "summary_text", "reference_summary")

  test("gd01: counts, scalar means, classification block, ROUGE-1 means") {
    val row = Golden.gd01On(runs).collect().head
    val m = row.getValuesMap[Any](row.schema.fieldNames)
    assert(m("total_samples") == 8L && m("good_samples") == 4L && m("bad_samples") == 4L)
    assert(m("avg_quality_score") == 0.5, "mean over the three non-null scores")
    assert(m("avg_noise_ratio") == 0.2, "extracted from diagnostics JSON; absent keys skip")
    // classified runs: 1,2,3,4,7,8 (5 has no genre, 6 no summary; the
    // whitespace-only and punctuation-only summaries still classify)
    assert(m("n_classified") == 6L)
    // correct: run1 (rank1), run2 (rank2), run3 (rank3 — museum
    // frame 3 > health 2 > data 1); runs 4 (negative-suppressed),
    // 7, 8 predict nothing
    assert(m("accuracy") == 0.5)
    assert(m("top2_accuracy") == 0.333333, "run3's rank-3 hit counts for top-3, not top-2")
    // per-label: sports tp=2 sup=2; ai tp=1 sup=1; culture fp=2 fn=1
    // sup=1; health fp=1 sup=0; econ fn=1 sup=1; software fn=1 sup=1
    assert(m("macro_precision") == 0.333333 && m("macro_recall") == 0.333333 &&
      m("macro_f1") == 0.333333)
    assert(m("weighted_f1") == 0.5, "(1e6·2 + 1e6·1) / 6 support")
    // rouge-qualified: 1,2,3,5,8 (4's reference is trim-empty, 6 null
    // summary, 7 whitespace summary); 8 pushes all-zero scores
    assert(m("n_rouge") == 5L)
    assert(m("rouge1_p") == 0.458333 && m("rouge1_r") == 0.566667 &&
      m("rouge1_f") == 0.486364)
  }

  test("gd01: clipped multiset counts, not distinct sets") {
    // cand 'a a b' vs ref 'a b b': clipped matches = min(2,1)+min(1,2)
    // = 2 (a set intersection would also say 2 but a bag union differs;
    // the asymmetric counts pin the clipping): p=r=2/3
    val one = Seq((1L, "good", Some("sports"), Option.empty[Double], "{}",
      Some("a a b"), Some("a b b")))
      .toDF("job_id", "cohort", "genre", "quality_score", "diagnostics",
        "summary_text", "reference_summary")
    val row = Golden.gd01On(one).collect().head
    val m = row.getValuesMap[Any](row.schema.fieldNames)
    assert(m("rouge1_p") == 0.666667 && m("rouge1_r") == 0.666667)
  }

  test("gd02: per-genre + overall ROUGE with order-sensitive ROUGE-L") {
    val rf = Seq(
      (1L, "good", Some("sports"), Option.empty[Double], "{}",
        Some("a b c"), Some("c b a")),
      (2L, "good", Some("Sports"), Option.empty[Double], "{}",
        Some("x y"), Some("x y")),
      (3L, "bad", Option.empty[String], Option.empty[Double], "{}",
        Some("k m"), Some("k m")))
      .toDF("job_id", "cohort", "genre", "quality_score", "diagnostics",
        "summary_text", "reference_summary")
    val out = Golden.gd02On(rf).collect()
      .map(r => r.getString(0) -> r.getValuesMap[Any](r.schema.fieldNames)).toMap
    assert(out.keySet == Set("sports", "__overall__"),
      "genre keys lowercase; the genre-less run only reaches __overall__")
    val s = out("sports")
    assert(s("n_pairs") == 2L && s("rouge1_p") == 1.0 && s("rouge1_f") == 1.0)
    assert(s("rouge_l_p") == 0.666667 && s("rouge_l_f") == 0.666667,
      "LCS of 'a b c' vs 'c b a' is 1 — order matters where unigrams saturate")
    val o = out("__overall__")
    assert(o("n_pairs") == 3L && o("rouge_l_p") == 0.777778)
  }

  test("kw02/composition: the planted corpus exercises every rule at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val runs = Golden.composeGoldenRuns(spark, dir)
    // every genre appears in the presence scores
    val kw = Golden.kw02(spark, dir)
    assert(kw.select("genre").distinct().count() == Golden.genres.size)
    // every Option skip path has members
    assert(runs.filter(col("genre").isNull).count() > 0)
    assert(runs.filter(col("summary_text").isNull).count() > 0)
    assert(runs.filter(trim(col("summary_text")) === "").count() > 0)
    assert(runs.filter(col("reference_summary") === "").count() > 0)
    assert(runs.filter(col("quality_score").isNull).count() > 0)
    assert(runs.filter(!col("diagnostics").contains("noise_ratio")).count() > 0)
  }
}
