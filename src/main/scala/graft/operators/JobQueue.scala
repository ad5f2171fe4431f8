package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Job-queue / outbox read models — the pre-processor's summarize-job
  * queue maintenance layer re-expressed over an event log at rest:
  *
  *  - jq01: pre-processor/app/repository/stale_pending_cleanup.go —
  *    the stale-pending reconciler: jobs still `pending` whose
  *    article ALREADY has a summary (a completed job for the same
  *    article) are dead work; the reconciler counts them (:8) and
  *    deletes the oldest-first bounded batch (:19 — `ORDER BY
  *    created_at ASC LIMIT n`, the same age-ordered bounded-batch
  *    shape DequeueJobs uses to claim work,
  *    summarize_job_repository.go:632).
  *  - jq02: the queue-health dashboard the metrics layer exposes —
  *    per latest-status job counts, retry-budget exhaustion
  *    (retry_count ≥ max_retries, the queue's give-up rule), and the
  *    oldest-row age gauge (pre-processor/app/metrics/
  *    notification_outbox.go:22 `oldestPendingAgeSeconds` — written
  *    every tick so a wedged relay stays distinguishable; here the
  *    age is reported per status, the `pending` row being the gauge).
  *
  * Composition (the es01/es08 precedent — the driver tables carry no
  * job queue): each event is a job transition; job and article ids
  * derive from event_id so an article carries several jobs — the
  * stale-pending case (one job completed, a sibling still pending)
  * occurs naturally. "now" is the max event time (es08's convention —
  * batch has no wall clock).
  *
  * Scale: the per-job latest-state frame is ONE map-side-combined
  * shuffle on job_id (max_by over the transition order — no window,
  * no sort of the log); jq01's summarized-article set and the
  * stale-total count are broadcast frames; the deletion batch is a
  * TakeOrdered, never a global sort. jq02 re-aggregates the per-job
  * frame — |statuses| rows out.
  */
object JobQueue {

  val MaxRetries = 3

  /** The composed job-transition log: (job_id, article_id, status,
    * ts, event_id). view→pending (enqueue), click→running (claim),
    * purchase→completed, error→failed, signup→pending (re-enqueue
    * after a retry).
    */
  def jobEventsFromEvents(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val jobId = pmod(col("event_id"), lit(2000)).as("job_id")
    val status = when(col("event_type") === "purchase", "completed")
      .when(col("event_type") === "error", "failed")
      .when(col("event_type") === "click", "running")
      .otherwise("pending")
    e.select(jobId, pmod(pmod(col("event_id"), lit(2000)), lit(700)).as("article_id"),
      status.as("status"), col("ts"), col("event_id"))
  }

  /** Latest-state-per-job projection: one shuffle on job_id; the
    * latest status rides a max_by over the (ts, event_id) transition
    * order, created_at is the first transition, retry_count counts
    * failures (the queue's `retry_count` column accumulates one per
    * failure).
    */
  def jobStateOn(log: DataFrame): DataFrame =
    log.groupBy("job_id", "article_id").agg(
      max_by(col("status"), struct(col("ts"), col("event_id"))).as("last_status"),
      min("ts").as("created_at"),
      max("ts").as("updated_at"),
      count(when(col("status") === "failed", 1)).as("retry_count"))

  /** jq01: the stale-pending reconciliation batch — pending jobs whose
    * article already has a completed job, oldest first, LIMIT 50, with
    * the reconciler's total count on every row.
    */
  def stalePendingOn(jobs: DataFrame, limit: Int = 50): DataFrame = {
    val pending = jobs.filter(col("last_status") === "pending")
    val summarized = jobs.filter(col("last_status") === "completed")
      .select("article_id").distinct()
    val stale = pending.join(broadcast(summarized), Seq("article_id"), "left_semi")
    val total = stale.agg(count(lit(1)).as("n_stale_total"))
    stale.select("job_id", "article_id", "created_at")
      .orderBy(col("created_at").asc, col("job_id").asc)
      .limit(limit)
      .crossJoin(broadcast(total))
  }

  def jq01(s: SparkSession, dir: String): DataFrame =
    stalePendingOn(jobStateOn(jobEventsFromEvents(s, dir)))

  /** jq02: per-status queue health — job count, retry-budget
    * exhaustion, and the oldest-row age gauge in whole seconds.
    */
  def queueHealthOn(jobs: DataFrame): DataFrame = {
    val now = jobs.agg(max("updated_at").as("now_ts"))
    jobs.groupBy("last_status").agg(
      count(lit(1)).as("n_jobs"),
      count(when(col("retry_count") >= MaxRetries, 1)).as("n_retry_exhausted"),
      min("created_at").as("oldest_created_at"))
    .crossJoin(broadcast(now))
    .select(
      col("last_status"), col("n_jobs"), col("n_retry_exhausted"),
      (unix_timestamp(col("now_ts")) - unix_timestamp(col("oldest_created_at")))
        .as("oldest_age_seconds"))
  }

  def jq02(s: SparkSession, dir: String): DataFrame =
    queueHealthOn(jobStateOn(jobEventsFromEvents(s, dir)))
}
