package graft

import org.apache.spark.sql.functions._
import graft.operators.KnowledgeSlo

/** Rule-per-case pins for ks01 (alt-backend knowledge_slo_usecase
  * usecase.go:29-140 + knowledge-sovereign read_infra.go:219-232):
  * the event-unit lag definition, the freshness band ladder with its
  * exact ≤300 boundary, the transport-error band, the placeholder
  * constants, and the worst-status fold.
  */
class KnowledgeSloSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(rows: Seq[(Long, Long, String)]) =
    rows.toDF("epoch", "event_id", "event_type")
      .select(timestamp_seconds(col("epoch")).as("ts"), col("event_id"), col("event_type"))

  private def report(rows: Seq[(Long, Long, String)]) =
    KnowledgeSlo.sloStatusOn(mkEvents(rows)).collect()
      .map(r => r.getString(1) -> r).toMap

  // row layout: sli_order, name, current_value, target_value, unit,
  //             status, error_budget_consumed_pct, overall_health,
  //             error_budget_window_days

  test("lag = events past the farthest-behind projector checkpoint " +
       "(read_infra.go:222-226 max(event_seq) - min(last_event_seq), " +
       "re-keyed on the (ts, event_id) composite)") {
    // projector a last at t=10; b last at t=20; two later b events and
    // one later-still a-typed? no — keep types disjoint in time:
    // a: {5, 10}; b: {12, 20, 25, 30}. a's checkpoint (10) is the
    // farthest behind; events strictly after (10,2): four b events.
    val out = report(Seq(
      (5L, 1L, "a"), (10L, 2L, "a"),
      (12L, 3L, "b"), (20L, 4L, "b"), (25L, 5L, "b"), (30L, 6L, "b")))
    assert(out("freshness").getDouble(2) == 4.0)
    assert(out("freshness").getString(5) == "meeting")
    assert(out("freshness").getDouble(6) == 4.0 / 300.0 * 100.0)
  }

  test("ties on ts break by event_id: the checkpoint is the composite, " +
       "not the bare timestamp") {
    // both types end at t=10; a's last id 2 < b's last id 3 -> a is
    // behind, and only (10,3) is strictly past (10,2)
    val out = report(Seq((10L, 2L, "a"), (10L, 3L, "b")))
    assert(out("freshness").getDouble(2) == 1.0)
  }

  test("the 300 boundary is <= (usecase.go:101): exactly 300 events " +
       "behind is MEETING at budget 100, 301 is BURNING at 100") {
    def lagged(n: Int) = Seq((0L, 0L, "behind")) ++
      (1 to n).map(i => (i.toLong, i.toLong, "ahead"))
    val at = report(lagged(300))
    assert(at("freshness").getDouble(2) == 300.0 &&
      at("freshness").getString(5) == "meeting" &&
      at("freshness").getDouble(6) == 100.0)
    assert(at("freshness").getString(7) == "healthy",
      "meeting freshness keeps the report healthy")
    val over = report(lagged(301))
    assert(over("freshness").getString(5) == "burning" &&
      over("freshness").getDouble(6) == 100.0)
    assert(over("freshness").getString(7) == "at_risk",
      "one burning SLI -> at_risk (computeOverallHealth :134-137)")
  }

  test("the transport-error band (usecase.go:96-99): negative lag -> " +
       "breached at budget 100 -> overall breaching; breached outranks " +
       "burning in the fold") {
    val (status, budget) = KnowledgeSlo.freshnessSli(lit(-1.0))
    val r = spark.range(1).select(status.as("s"), budget.as("b")).head()
    assert(r.getString(0) == "breached" && r.getDouble(1) == 100.0)
    // the fold's precedence, on the same max-severity expression the
    // report uses
    val fold = Seq("meeting", "burning", "breached").toDF("status")
      .agg(max(when(col("status") === "breached", 2)
        .when(col("status") === "burning", 1).otherwise(0)).as("sev"))
      .select(when(col("sev") === 2, "breaching")
        .when(col("sev") === 1, "at_risk").otherwise("healthy"))
      .head().getString(0)
    assert(fold == "breaching")
  }

  test("the four placeholder SLIs are the reference's own hardcoded " +
       "constants (:40-74), all meeting at budget 0") {
    val out = report(Seq((1L, 1L, "x")))
    val want = Map(
      "availability" -> 99.9, "action_durability" -> 99.99,
      "stream_continuity" -> 99.5, "correctness_proxy" -> 99.0)
    want.foreach { case (n, target) =>
      val r = out(n)
      assert(r.getDouble(2) == 100.0 && r.getDouble(3) == target &&
        r.getString(4) == "percent" && r.getString(5) == "meeting" &&
        r.getDouble(6) == 0.0, s"placeholder $n")
    }
  }

  test("ks01 over the test events: 5 rows in SLIs order (:76-82), the " +
       "freshness row in event units labeled 'seconds' (the reference's " +
       "unit conflation — read_client.go:533 multiplies a sequence count " +
       "by time.Second), window days 30") {
    val rows = KnowledgeSlo.ks01(spark, sfDir).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4, 5))
    assert(rows.map(_.getString(1)).toSeq == Seq("availability", "freshness",
      "action_durability", "stream_continuity", "correctness_proxy"))
    val f = rows(1)
    assert(f.getString(4) == "seconds" && f.getDouble(3) == 300.0)
    assert(f.getDouble(2) >= 0.0, "GREATEST(...,0): lag is never negative in data")
    assert(rows.forall(_.getInt(8) == 30))
    assert(rows.map(_.getString(7)).distinct.length == 1,
      "overall_health is denormalized identically on every row")
  }

  test("plan: no global window or sort in the lag computation — the " +
       "checkpoint is a per-type agg + scalar-min broadcast, the count a " +
       "filtered agg (the no-row_number re-expression the scaladoc claims)") {
    val f = KnowledgeSlo.ks01(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!f.contains("Window"), "no WindowExec anywhere")
    assert(!f.contains("CartesianProduct"))
    assert(f.contains("BroadcastNestedLoopJoin") || f.contains("BroadcastHashJoin"),
      "the one-row checkpoint scalar must broadcast into the corpus count")
  }
}
