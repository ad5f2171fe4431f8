package graft

import org.apache.spark.sql.functions._
import graft.operators.OutputQuality

/** qe01/qe02: the recap-evaluator metric battery — the JSON round-trip
  * (both bullet shapes, malformed input) and the redundancy pair math
  * are verified here against hand-written fixtures; the oracle checks
  * the composed end-to-end rates.
  */
class OutputQualitySpec extends SparkSpec {
  import spark.implicits._

  test("qe01 parses both body shapes, malformed JSON scores zero like an empty output") {
    val rows = Seq(
      // top-level bullets: 1 of 2 grounded, repaired
      (1L, "a", """{"bullets":[{"text":"x y","source_sentence_ids":[7]},""" +
        """{"text":"z w","source_sentence_ids":[]}],""" +
        """"metadata":{"json_repair_attempted":true,"is_degraded":false,"model":"m"}}"""),
      // nested summary.bullets (the second accepted shape): fully
      // grounded, produced by the fallback model
      (2L, "a", """{"summary":{"bullets":[{"text":"x","source_sentence_ids":[1,2]}]},""" +
        """"metadata":{"json_repair_attempted":false,"is_degraded":false,""" +
        """"model":"low-evidence-extractive"}}"""),
      // malformed JSON: no bullets resolvable -> grounding 0, no flags
      (3L, "a", """{"bullets": [oops"""),
      // degraded output
      (4L, "b", """{"bullets":[{"text":"t","source_sentence_ids":[]}],""" +
        """"metadata":{"json_repair_attempted":false,"is_degraded":true,"model":"m"}}"""))
    val out = OutputQuality.outputQualityOn(rows.toDF("output_id", "source", "body_json"))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_outputs") == 3L)
    // per-output grounded fractions 0.5, 1.0, 0.0 -> mean 0.5
    assert(a.getAs[Double]("grounding_rate") == 0.5)
    assert(a.getAs[Double]("repair_rate") == 0.3333)
    assert(a.getAs[Double]("fallback_rate") == 0.3333)
    val b = out("b")
    assert(b.getAs[Double]("grounding_rate") == 0.0)
    assert(b.getAs[Double]("fallback_rate") == 1.0)
  }

  private def body(bullets: Seq[String]): String =
    s"""{"bullets":[${bullets.map(t => s"""{"text":"$t","source_sentence_ids":[]}""").mkString(",")}],""" +
      """"metadata":{"json_repair_attempted":false,"is_degraded":false,"model":"m"}}"""

  test("qe02 redundancy: restated bullets score 1, disjoint 0, fewer than two non-empty 0") {
    val rows = Seq(
      (1L, "dup", body(Seq("alpha beta gamma", "alpha beta gamma"))),
      (2L, "disjoint", body(Seq("alpha beta", "gamma delta"))),
      (3L, "single", body(Seq("alpha beta"))),
      // empty bullets are skipped before pairing (the reference filters
      // them): the two non-empty copies still pair to 1.0
      (4L, "empty_mid", body(Seq("alpha beta", "", "alpha beta"))))
    val out = OutputQuality.summaryRedundancyOn(rows.toDF("output_id", "source", "body_json"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Double]("redundancy")).toMap
    assert(out("dup") == 1.0)
    assert(out("disjoint") == 0.0)
    assert(out("single") == 0.0)
    assert(out("empty_mid") == 1.0)
  }

  test("qe01/qe02 composed view round-trips: parsed bullet counts match the composition rule") {
    val composed = OutputQuality.composeOutputs(spark, sfDir)
    assert(composed.filter(col("body_json").contains("\"summary\"")).count() > 0)
    assert(composed.filter(!col("body_json").contains("\"summary\"")).count() > 0)
    // every output's grounded count follows (doc_id + i) % 3 != 0
    val q = OutputQuality.outputQualityOn(composed)
    val n = composed.count()
    assert(q.agg(sum("n_outputs")).head.getLong(0) == n)
  }
}
