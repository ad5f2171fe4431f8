package graft

import org.apache.spark.sql.functions._
import graft.operators.KnowledgeAudit

/** Rule-per-case pins for ka01 (knowledge_audit_usecase/usecase.go
  * verifyProjection :88-147 over read_infra.go queryVersionStats
  * :393-402): the hardcoded-v1 baseline, the three drift gates with
  * their exact thresholds and guard conditions, the two-state empty
  * test, and the mismatch count.
  */
class KnowledgeAuditSpec extends SparkSpec {
  import spark.implicits._

  /** (version, score, state) rows → audit rows keyed by to_version. */
  private def run(rows: Seq[(Int, Double, String)]) =
    KnowledgeAudit.auditOn(
      rows.toDF("projection_version", "score", "summary_state"))
      .collect().map(r => r.getInt(0) -> r).toMap

  // layout: to_version, from_count, to_count, from_avg_score,
  //         to_avg_score, from_empty_count, to_empty_count,
  //         count_drift, score_drift, from_empty_rate, to_empty_rate,
  //         count_drift_fired, score_drift_fired,
  //         empty_rate_drift_fired, mismatch_count

  test("the baseline is HARDCODED v1 (:90): every version audits " +
       "against it, v1 included (drift 0 against itself)") {
    val out = run(Seq((1, 10.0, "ready"), (1, 20.0, "ready"),
      (2, 10.0, "ready"), (2, 20.0, "ready")))
    assert(out(1).getLong(14) == 0 && out(2).getLong(14) == 0)
    assert(out(1).getDouble(7) == 0.0, "v1 vs v1 count drift is zero")
  }

  test("gate 1 boundary (:101): count drift must EXCEED 0.05 — 21/20 " +
       "(exactly 0.05) does not fire, 22/20 (0.1) does") {
    def mk(n2: Int) = (1 to 20).map(_ => (1, 10.0, "ready")) ++
      (1 to n2).map(_ => (2, 10.0, "ready"))
    assert(run(mk(21))(2).getInt(11) == 0, "0.05 exactly passes (strict >)")
    assert(run(mk(22))(2).getInt(11) == 1)
  }

  test("gate 2 boundary (:114): score drift must EXCEED 0.1 — 11.0 vs " +
       "10.0 (exactly 0.1) does not fire, 11.25 does; guard skips the " +
       "gate when the baseline average is 0") {
    def mk(s: Double) = Seq((1, 10.0, "ready"), (2, s, "ready"))
    assert(run(mk(11.0))(2).getInt(12) == 0)
    assert(run(mk(11.25))(2).getInt(12) == 1)
    val zeroBase = run(Seq((1, 0.0, "ready"), (2, 100.0, "ready")))
    assert(zeroBase(2).getInt(12) == 0 && zeroBase(2).isNullAt(8),
      "from_avg = 0 -> the gate never evaluates (:113's > 0 guard)")
  }

  test("gate 3 (:126-137): empty rate uses the TWO-state test " +
       "('missing' OR '', not NULL), and the diff must exceed 0.05") {
    // v1: 1/4 empty via ''; v2: 2/4 empty via one 'missing' + one ''
    val out = run(Seq(
      (1, 10.0, ""), (1, 10.0, "ready"), (1, 10.0, "ready"), (1, 10.0, "ready"),
      (2, 10.0, "missing"), (2, 10.0, ""), (2, 10.0, "ready"), (2, 10.0, "ready")))
    assert(out(2).getLong(6) == 2, "'' counts as empty")
    assert(out(2).getInt(13) == 1 && out(2).getDouble(10) == 0.5)
    // exactly 0.05 passes: rates 0/20 vs 1/20
    val boundary = run((1 to 20).map(_ => (1, 10.0, "ready")) ++
      ((1 to 19).map(_ => (2, 10.0, "ready")) :+ ((2, 10.0, "missing"))))
    assert(boundary(2).getInt(13) == 0, "|0.05| exactly does not fire")
  }

  test("mismatch_count sums the fired gates (0-3)") {
    // v2 fires all three: half the count, double the score, all empty
    val out = run(
      (1 to 20).map(_ => (1, 10.0, "ready")) ++
      (1 to 10).map(_ => (2, 20.0, "missing")))
    assert(out(2).getLong(14) == 3)
    assert(out(2).getInt(11) == 1 && out(2).getInt(12) == 1 && out(2).getInt(13) == 1)
  }

  test("ka01 over the corpus: v2 fires the empty-rate gate only, v3 " +
       "fires count + score (the composed classes)") {
    val out = KnowledgeAudit.ka01(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out.keySet == Set(1, 2, 3))
    assert(out(1).getLong(14) == 0)
    assert(out(2).getInt(11) == 0 && out(2).getInt(12) == 0 &&
      out(2).getInt(13) == 1, "v2: empty-rate drift only")
    assert(out(3).getInt(11) == 1 && out(3).getInt(12) == 1,
      "v3: count + score drift")
  }
}
