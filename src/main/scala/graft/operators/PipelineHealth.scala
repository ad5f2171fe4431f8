package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.microRatio

/** Pipeline health evaluation — the batch half of recap-evaluator's
  * PipelineEvaluator (recap-evaluator/src/recap_evaluator/evaluator/
  * pipeline_evaluator.py evaluate_batch :64):
  *
  *  - per-STAGE success rates over every listed job's stage logs
  *    (:99-107 — the fraction of a stage's log rows with status
  *    'completed'; logs of running/unfinished jobs count too);
  *  - job counts from the jobs table: completed and failed lists are
  *    fetched separately (:70-76), so total = completed + failed —
  *    a job in NEITHER list (still running) joins the stage/time/
  *    article rollups but not the success rate;
  *  - per-job processing time = (max finished_at − min started_at)
  *    in seconds, only for jobs where both exist (:89-95); the batch
  *    average is the mean over those jobs, 0.0 when none;
  *  - avg articles per job = mean total_articles_fetched over jobs
  *    that HAVE preprocess metrics (:97-98), 0.0 when none;
  *  - the alert ladder (:117-123): success_rate < 0.90 → CRITICAL,
  *    < 0.95 → WARN, else OK — evaluated on the exact rational
  *    (integer cross-multiplication), with the two edge states pinned:
  *    an EMPTY job list early-returns OK (:65), while a non-empty list
  *    whose jobs are all still running has success_rate 0.0 → CRITICAL.
  *
  * Output is scalar (section, metric, value) rows: per-stage rates,
  * the six summary metrics, and the alert level coded OK=0 / WARN=1 /
  * CRITICAL=2 (the enum's string values, numerically coded — the
  * gate's single-typed value column).
  *
  * Scale: the stage rollup is one map-side-combined agg on |stages|
  * bounded keys; the per-job window is one agg on job_id (max/min —
  * no sort, no window); everything downstream is one-row broadcast
  * frames. Three small shuffles at any corpus size.
  */
object PipelineHealth {

  val WarnM = 950000L      // 0.95 in 1e-6 units (config.py:85)
  val CriticalM = 900000L  // 0.90 in 1e-6 units (config.py:86)

  /** Composed stage-log frame (job_id, stage, status, started_at,
    * finished_at): four stages cycle by event residue; 'error' events
    * are failed runs, 'signup' events are still-RUNNING rows (null
    * finished_at — the :92 both-present guard's food), the rest
    * complete after a deterministic integer duration.
    */
  def composeStageLogs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(pmod(col("event_id"), lit(500)).as("job_id"),
        element_at(
          array(lit("fetch"), lit("preprocess"), lit("classify"), lit("summarize")),
          (pmod(col("event_id"), lit(4)) + 1).cast("int")).as("stage"),
        when(col("event_type") === "error", "failed")
          .when(col("event_type") === "signup", "running")
          .otherwise("completed").as("status"),
        col("ts").as("started_at"),
        col("event_id"))
      .withColumn("dur_s", pmod(col("event_id") * 7, lit(3600)))
      .withColumn("finished_at",
        when(col("status") =!= "running",
          expr("timestampadd(SECOND, dur_s, started_at)")))
      .drop("event_id", "dur_s")

  /** Composed jobs table: residue 0 failed, residue 1 still running
    * (in neither the completed nor the failed fetch), the rest
    * completed.
    */
  def composeJobs(logs: DataFrame): DataFrame =
    logs.select("job_id").distinct()
      .withColumn("job_status",
        when(pmod(col("job_id"), lit(13)) === 0, "failed")
          .when(pmod(col("job_id"), lit(13)) === 1, "running")
          .otherwise("completed"))

  /** Composed preprocess metrics: one residue class of jobs has no
    * metrics row (the .get-miss path).
    */
  def composeMetrics(jobs: DataFrame): DataFrame =
    jobs.select("job_id")
      .filter(pmod(col("job_id"), lit(7)) =!= 3)
      .withColumn("articles", pmod(col("job_id") * 17, lit(90)) + 10)

  /** pe01 over any (stage-log, jobs, metrics) frames. */
  def pe01On(logs: DataFrame, jobs: DataFrame, metrics: DataFrame): DataFrame = {
    val stageRows = logs.groupBy("stage").agg(
      microRatio(count(when(col("status") === "completed", 1)),
        count(lit(1)), 6).as("rate"))
      .select(lit("stage").as("section"), col("stage").as("metric"),
        col("rate").cast("double").as("value"))

    val jc = jobs.agg(
      count(lit(1)).as("n_jobs"),
      count(when(col("job_status") === "completed", 1)).as("completed"),
      count(when(col("job_status") === "failed", 1)).as("failed"))
    val tt = logs.groupBy("job_id").agg(
      unix_timestamp(max("finished_at")).as("fin"),
      unix_timestamp(min("started_at")).as("sta"))
      .filter(col("fin").isNotNull && col("sta").isNotNull)
      .agg(count(lit(1)).as("n_t"), sum(col("fin") - col("sta")).as("sum_t"))
    val am = metrics.agg(count(lit(1)).as("n_m"), sum(col("articles")).as("sum_a"))

    val total = col("completed") + col("failed")
    val successRate = when(total === 0, 0.0)
      .otherwise(microRatio(col("completed"), total, 6))
    // the ladder on the exact rational; empty job list → OK (:65),
    // non-empty but zero completed+failed → 0.0 < critical → CRITICAL
    val alert = when(col("n_jobs") === 0, 0L)
      .when(total === 0, 2L)
      .when(col("completed") * 1000000L < lit(CriticalM) * total, 2L)
      .when(col("completed") * 1000000L < lit(WarnM) * total, 1L)
      .otherwise(0L)
    val row = (sec: String, met: String, v: Column) =>
      struct(lit(sec).as("section"), lit(met).as("metric"),
        v.cast("double").as("value"))
    val summary = jc.crossJoin(broadcast(tt)).crossJoin(broadcast(am))
      .select(explode(array(
        row("summary", "total_jobs", total),
        row("summary", "completed_jobs", col("completed")),
        row("summary", "failed_jobs", col("failed")),
        row("summary", "success_rate", successRate),
        row("summary", "avg_processing_time_seconds",
          when(col("n_t") === 0, 0.0)
            .otherwise(microRatio(col("sum_t"), col("n_t"), 6))),
        row("summary", "avg_articles_per_job",
          when(col("n_m") === 0, 0.0)
            .otherwise(microRatio(col("sum_a"), col("n_m"), 6))),
        row("alert", "level", alert))).as("r"))
      .select(col("r.section"), col("r.metric"), col("r.value"))
    stageRows.unionByName(summary)
  }

  def pe01(s: SparkSession, dir: String): DataFrame = {
    val logs = composeStageLogs(s, dir)
    val jobs = composeJobs(logs)
    pe01On(logs, jobs, composeMetrics(jobs))
  }
}
