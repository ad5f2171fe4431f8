package graft

import org.apache.spark.sql.functions._
import graft.operators.HealthScore

/** Health-score semantics pinned on planted frames: the additive
  * penalty ladders with exact boundary behavior (>, never ≥), the
  * zero floor, the status bands, the report's floor-divided overall
  * score, and the SLO threshold on exact integers.
  */
class HealthScoreSpec extends SparkSpec {
  import spark.implicits._

  test("penalty ladders: boundaries are strict, penalties add, score floors at 0") {
    val cases = Seq(
      // (err%, p95, gap, expected)
      (0.0, 0.0, 0L, 100),     // clean
      (0.5, 500.0, 5L, 100),   // AT every boundary → no penalty (strict >)
      (0.6, 501.0, 6L, 100 - 5 - 5 - 15),
      (1.1, 1001.0, 11L, 100 - 10 - 10 - 30),
      (5.1, 5001.0, 0L, 100 - 25 - 20),
      (10.1, 10001.0, 11L, 0), // 100−40−30−30 = 0
      (100.0, 99999.0, 999L, 0)) // floor, never negative
    val got = cases.zipWithIndex
      .map { case ((e, p, g, _), i) => (i, e, p, g) }
      .toDF("i", "err", "p95", "gap")
      .select(col("i"), HealthScore.healthScore(col("err"), col("p95"), col("gap")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    cases.zipWithIndex.foreach { case ((e, p, g, exp), i) =>
      assert(got(i) == exp, s"case $i ($e, $p, $g)")
    }
  }

  test("status bands") {
    val got = Seq(90, 89, 70, 69, 50, 49, 0).toDF("s")
      .select(col("s"), HealthScore.healthStatus(col("s")).as("st"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(90) == "Healthy" && got(89) == "Warning")
    assert(got(70) == "Warning" && got(69) == "Degraded")
    assert(got(50) == "Degraded" && got(49) == "Critical" && got(0) == "Critical")
  }

  test("slo violations: exactly 1% does not violate, ties ordered deterministically") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(sec: Int) = new java.sql.Timestamp(base.getTime + sec * 1000L)
    // svc A bucket 0: 1 error in 100 → exactly 1% → NOT a violation;
    // svc B bucket 0: 2 in 100 → violation; svc C second bucket: 1 in 2
    val rows =
      (1 to 99).map(i => ("A", "INFO", t(i % 200))) ++ Seq(("A", "ERROR", t(0))) ++
      (1 to 98).map(i => ("B", "INFO", t(i % 200))) ++
        Seq(("B", "ERROR", t(0)), ("B", "FATAL", t(1))) ++
      Seq(("C", "INFO", t(400)), ("C", "ERROR", t(401)))
    val out = HealthScore.sloViolationsOn(
      rows.toDF("service_name", "severity_text", "ts")).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("C", "B"),
      "newest bucket first; A's exactly-1% bucket excluded")
    assert(out(0).getDouble(2) == 50.0 && out(1).getDouble(2) == 2.0)
  }

  test("report rollup: overall score is the floor-divided mean") {
    val health = Seq((95, 0.5, 1L), (95, 0.5, 1L), (40, 2.0, 9L))
      .toDF("health_score", "error_rate", "minutes_since_last_log")
    val r = HealthScore.healthReportOn(health).collect()(0)
    assert(r.getLong(0) == 3)
    assert(r.getLong(1) == 76, "(95+95+40)/3 = 76.67 floors to 76")
    assert(r.getLong(2) == 2 && r.getLong(5) == 1, "2 healthy, 1 critical")
    assert(r.getLong(6) == 1, "error_rate > 1 (strict)")
    assert(r.getLong(7) == 1, "gap > 5 (strict)")
  }
}
