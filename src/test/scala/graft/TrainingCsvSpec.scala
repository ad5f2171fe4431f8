package graft

import graft.operators.TrainingCsv
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-set builder: pair extraction gates and the exact dedup
  * (recap-subworker/scripts/build_30class_training_csv.py).
  */
class TrainingCsvSpec extends SparkSpec {
  import spark.implicits._

  private val long = "x" * 100
  private def golden(rows: (String, String, String)*): DataFrame =
    rows.toSeq.toDF("primary_genre", "content_ja", "content_en")
  private def silver(rows: (String, String, String, String)*): DataFrame =
    rows.toSeq.toDF("label", "genre", "content", "text")
  private def emptySilver = silver()

  private def counts(g: DataFrame, s: DataFrame): Map[String, Long] =
    TrainingCsv.buildOn(g, s).filter(col("count") > 0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("golden pairs: both languages count, falsy genres and short content skip (:39-50)") {
    val c = counts(golden(
      ("sports", long, long + "b"),     // two pairs
      ("sports", "short", null),        // under 80 → nothing
      (null, long, long),               // falsy genre → nothing
      ("", long, long)), emptySilver)
    assert(c == Map("sports" -> 2L))
  }

  test("silver fallbacks: label||genre, content||text, same gates (:52-60)") {
    val c = counts(golden(), silver(
      (null, "education", long, "t"),       // genre fallback
      ("sports", null, null, long + "z"),   // text fallback
      (null, null, long, "t"),              // no genre at all → skip
      ("law_crime", null, null, "short")))  // fallback text under 80 → skip
    assert(c == Map("education" -> 1L, "sports" -> 1L))
  }

  test("exact (content, genre) dedup across sources (:121)") {
    val c = counts(
      golden(("sports", long, null), ("sports", long, null)),  // same pair twice
      silver(("sports", null, long, null),                      // same again via silver
        ("education", null, long, null)))                       // same content, other genre
    assert(c == Map("sports" -> 1L, "education" -> 1L),
      "duplicates collapse per (content, genre), not per content")
  }

  test("canonical genres never observed emit count-0 rows (:129)") {
    val out = TrainingCsv.buildOn(golden(("sports", long, null)), emptySilver)
    assert(out.count() == 30, "the full canonical frame is present")
    assert(out.filter(col("count") === 0 && col("canonical")).count() == 29)
    assert(out.filter(col("genre") === "sports").collect().head.getLong(1) == 1)
  }

  test("composition: planted duplicates collapse and non-canonical golden genres flag at sf0.001") {
    val out = TrainingCsv.td01(spark, sfDir).cache()
    assert(out.filter(col("genre") === "mystery" && !col("canonical")).count() == 1,
      "vg01's unexpected primary genre flows through as non-canonical")
    val dupGenres = out.filter(col("count") > 0 && col("canonical")).count()
    assert(dupGenres > 20)
    out.unpersist()
  }
}
