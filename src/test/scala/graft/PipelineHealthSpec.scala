package graft

import graft.operators.PipelineHealth
import graft.operators.PipelineHealth._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pipeline-health replay: recap-evaluator's PipelineEvaluator
  * evaluate_batch (:64) on hand frames — stage rates, the separate
  * completed/failed fetches, the both-timestamps processing guard,
  * the metric-miss skip, and the alert ladder's edges.
  */
class PipelineHealthSpec extends SparkSpec {
  import spark.implicits._

  private def logs(rows: (Long, String, String, String, String)*): DataFrame =
    rows.toSeq.toDF("job_id", "stage", "status", "s", "f")
      .select(col("job_id"), col("stage"), col("status"),
        to_timestamp(col("s")).as("started_at"),
        to_timestamp(col("f")).as("finished_at"))

  private def jobs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("job_id", "job_status")

  private def mets(rows: (Long, Long)*): DataFrame =
    rows.toSeq.toDF("job_id", "articles")

  private def v(df: DataFrame, sec: String, met: String): Double =
    df.filter(col("section") === sec && col("metric") === met)
      .collect().head.getAs[Double]("value")

  private val T0 = "2024-01-01 10:00:00"

  test("stage rates: every non-completed log row (failed OR running) counts against the stage (:104)") {
    val l = logs(
      (1L, "fetch", "completed", T0, T0), (2L, "fetch", "completed", T0, T0),
      (3L, "fetch", "failed", T0, T0), (4L, "fetch", "running", T0, null),
      (1L, "classify", "completed", T0, T0))
    val out = pe01On(l, jobs((1L, "completed")), mets())
    assert(v(out, "stage", "fetch") == 0.5)
    assert(v(out, "stage", "classify") == 1.0)
  }

  test("total = completed + failed; running jobs join the rollups but not the rate (:70-76)") {
    val l = logs((1L, "fetch", "completed", T0, T0),
      (2L, "fetch", "completed", T0, T0), (3L, "fetch", "failed", T0, T0),
      (4L, "fetch", "running", T0, null))
    val out = pe01On(l, jobs((1L, "completed"), (2L, "completed"),
      (3L, "failed"), (4L, "running")), mets())
    assert(v(out, "summary", "total_jobs") == 3.0)
    assert(v(out, "summary", "completed_jobs") == 2.0)
    assert(v(out, "summary", "failed_jobs") == 1.0)
    assert(v(out, "summary", "success_rate") == 0.666667)
    // 2/3 < 0.90 → CRITICAL
    assert(v(out, "alert", "level") == 2.0)
  }

  test("alert ladder edges are strict <: exactly 0.95 → OK, exactly 0.90 → WARN (:117)") {
    val l = logs((1L, "fetch", "completed", T0, T0))
    val ok = pe01On(l, jobs((1 to 19).map(i => (i.toLong, "completed")) ++
      Seq((20L, "failed")): _*), mets())
    assert(v(ok, "summary", "success_rate") == 0.95)
    assert(v(ok, "alert", "level") == 0.0)
    val warn = pe01On(l, jobs((1 to 9).map(i => (i.toLong, "completed")) ++
      Seq((10L, "failed")): _*), mets())
    assert(v(warn, "alert", "level") == 1.0)
    val crit = pe01On(l, jobs((1 to 8).map(i => (i.toLong, "completed")) ++
      Seq((9L, "failed"), (10L, "failed")): _*), mets())
    assert(v(crit, "summary", "success_rate") == 0.8)
    assert(v(crit, "alert", "level") == 2.0)
  }

  test("edge states: empty job list → OK (:65); all-running list → rate 0.0 → CRITICAL") {
    val l = logs((1L, "fetch", "running", T0, null))
    val empty = pe01On(l, jobs().limit(0), mets())
    assert(v(empty, "summary", "total_jobs") == 0.0)
    assert(v(empty, "summary", "success_rate") == 0.0)
    assert(v(empty, "alert", "level") == 0.0)
    val running = pe01On(l, jobs((1L, "running"), (2L, "running")), mets())
    assert(v(running, "summary", "success_rate") == 0.0)
    assert(v(running, "alert", "level") == 2.0)
  }

  test("processing window spans stages: max(finished) − min(started); no-finish jobs skip (:89-95)") {
    val l = logs(
      (1L, "fetch", "completed", "2024-01-01 09:50:00", "2024-01-01 10:10:00"),
      (1L, "classify", "completed", T0, "2024-01-01 10:30:00"),
      (2L, "fetch", "running", T0, null))
    val out = pe01On(l, jobs((1L, "completed"), (2L, "running")), mets())
    // job 1: 09:50 → 10:30 = 2400 s; job 2 has no finish → skipped
    assert(v(out, "summary", "avg_processing_time_seconds") == 2400.0)
  }

  test("avg articles: the mean runs over metric-BEARING jobs only; none → 0.0 (:97)") {
    val l = logs((1L, "fetch", "completed", T0, T0),
      (2L, "fetch", "completed", T0, T0), (3L, "fetch", "completed", T0, T0))
    val j = jobs((1L, "completed"), (2L, "completed"), (3L, "completed"))
    val out = pe01On(l, j, mets((1L, 10L), (2L, 21L)))
    assert(v(out, "summary", "avg_articles_per_job") == 15.5)
    assert(v(pe01On(l, j, mets()), "summary", "avg_articles_per_job") == 0.0)
  }

  test("composed run: all three sections emit; stages are the four-cycle") {
    val out = PipelineHealth.pe01(spark, sfDir).persist()
    assert(out.filter(col("section") === "stage").count() == 4)
    assert(out.filter(col("section") === "summary").count() == 6)
    assert(out.filter(col("section") === "alert").count() == 1)
    assert(v(out, "summary", "total_jobs") > 0)
  }
}
