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

  private def axisRow(id: Long, coh: Double, con: Double, flu: Double, rel: Double,
                      gev: Double, bert: Double, faith: Double, rouge: Double,
                      hall: Double) =
    (id, coh, con, flu, rel, gev, bert, faith, rouge, hall)

  private def qe08On(rows: (Long, Double, Double, Double, Double, Double,
                            Double, Double, Double, Double)*) =
    OutputQuality.compositeAlertOn(rows.toSeq.toDF("run_id", "coherence",
      "consistency", "fluency", "relevance", "geval_overall", "bertscore_f1",
      "faithfulness_score", "rouge_l_f1", "hallucination_rate"))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Double]("overall_quality_score"), r.getLong(2), r.getLong(3),
          r.getString(4)))).toMap

  test("qe08 composite: presence-gated weight RENORMALIZATION (:312-329)") {
    val out = qe08On(
      // only ROUGE present: its weight cancels — composite IS the value
      axisRow(1, 0, 0, 0, 0, 0, 0, 0, 0.8, 0),
      // all four present: 0.4·((5−1)/4) + 0.25·0.8 + 0.25·0.6 + 0.1·0.5 = 0.80
      axisRow(2, 4, 4, 4, 4, 5.0, 0.8, 0.6, 0.5, 0),
      // nothing present → 0.0 (and the composite band SKIPS via its > 0 gate)
      axisRow(3, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    assert(out(1)._1 == 0.8)
    assert(out(2)._1 == 0.8)
    assert(out(3) == ((0.0, 0L, 0L, "ok")))
  }

  test("qe08 alert: band strictness and the 2-critical / 1-critical-or-2-warn ladder (:331)") {
    val out = qe08On(
      // two dims below 3.0 → critical_count 2 → 'critical'
      axisRow(10, 2.9, 2.5, 4.0, 4.0, 4.0, 0.9, 0.9, 0.9, 0),
      // exactly 3.0 is NOT critical (strict <) but IS < 3.5 → warn; one warn alone → ok
      axisRow(11, 3.0, 4.0, 4.0, 4.0, 4.0, 0.9, 0.9, 0.9, 0),
      // two warn dims → 'warn'
      axisRow(12, 3.0, 3.4, 4.0, 4.0, 4.0, 0.9, 0.9, 0.9, 0),
      // a zero dim skips BOTH bands (the value > 0 gate)
      axisRow(13, 0.0, 4.0, 4.0, 4.0, 4.0, 0.9, 0.9, 0.9, 0),
      // hallucination: exactly 0.5 is NOT critical (strict >) but > 0.3 → warn
      axisRow(14, 4.0, 4.0, 4.0, 4.0, 4.0, 0.9, 0.9, 0.9, 0.5),
      // hallucination 0.55 → critical; one critical alone → 'warn'
      axisRow(15, 4.0, 4.0, 4.0, 4.0, 4.0, 0.9, 0.9, 0.9, 0.55),
      // low composite: only rouge 0.2 present → composite 0.2 < 0.3 → critical++
      axisRow(16, 4.0, 4.0, 4.0, 4.0, 0, 0, 0, 0.2, 0.55))
    // composite for rows 10-15: 0.4·0.75 + 0.25·0.9 + 0.25·0.9 + 0.1·0.9 = 0.84
    assert(out(10) == ((0.84, 2L, 0L, "critical")))
    assert(out(11)._2 == 0L && out(11)._3 == 1L && out(11)._4 == "ok")
    assert(out(12)._3 == 2L && out(12)._4 == "warn")
    assert(out(13) == ((0.84, 0L, 0L, "ok")))
    assert(out(14)._2 == 0L && out(14)._3 == 1L && out(14)._4 == "ok")
    assert(out(15)._2 == 1L && out(15)._4 == "warn")
    assert(out(16)._2 == 2L && out(16)._4 == "critical")
  }
}
