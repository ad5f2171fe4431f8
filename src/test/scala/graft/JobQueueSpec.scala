package graft

import graft.operators.JobQueue

/** Job-queue read-model semantics on a planted transition log: the
  * latest-state projection, the stale-pending rule (pending job whose
  * article already has a completed sibling), the oldest-first bounded
  * batch, retry-budget exhaustion, and the age gauge.
  */
class JobQueueSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Int) =
    new java.sql.Timestamp(java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + sec * 1000L)

  // (job_id, article_id, status, ts, event_id)
  private def log = Seq(
    // job 1, article 10: enqueued then completed → the article summary
    (1L, 10L, "pending", ts(0), 1L),
    (1L, 10L, "running", ts(10), 2L),
    (1L, 10L, "completed", ts(20), 3L),
    // job 2, SAME article, still pending → STALE
    (2L, 10L, "pending", ts(5), 4L),
    // job 3, article 20: pending, no summary → live work, not stale
    (3L, 20L, "pending", ts(1), 5L),
    // job 4, article 10: three failures then re-enqueued → stale AND
    // retry-exhausted; created EARLIER than job 2 → first in the batch
    (4L, 10L, "pending", ts(2), 6L),
    (4L, 10L, "failed", ts(3), 7L),
    (4L, 10L, "failed", ts(4), 8L),
    (4L, 10L, "failed", ts(6), 9L),
    (4L, 10L, "pending", ts(7), 10L),
    // job 5, article 20: running (claimed) at the log's end → "now" anchor
    (5L, 20L, "running", ts(100), 11L))
    .toDF("job_id", "article_id", "status", "ts", "event_id")

  test("latest-state projection: max_by transition order, retry_count counts failures") {
    val j = JobQueue.jobStateOn(log).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(j(1L).getString(2) == "completed")
    assert(j(4L).getString(2) == "pending", "re-enqueue after failures wins by order")
    assert(j(4L).getLong(5) == 3, "retry_count")
    assert(j(3L).getLong(5) == 0)
  }

  test("jq01: stale = pending with a completed sibling on the article, oldest first") {
    val batch = JobQueue.stalePendingOn(JobQueue.jobStateOn(log)).collect()
    assert(batch.map(_.getLong(0)).toSet == Set(4L, 2L),
      "jobs 4 and 2 are stale; job 3's article has no summary")
    assert(batch.forall(_.getLong(3) == 2), "reconciler total on every row")
    // bounded batch: limit 1 keeps only the oldest
    val one = JobQueue.stalePendingOn(JobQueue.jobStateOn(log), limit = 1).collect()
    assert(one.map(_.getLong(0)).toSeq == Seq(4L) && one.head.getLong(3) == 2,
      "LIMIT bounds the batch but the total still counts all stale jobs")
  }

  test("jq02: per-status counts, retry exhaustion, age gauge from the newest update") {
    val h = JobQueue.queueHealthOn(JobQueue.jobStateOn(log)).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(h("pending").getLong(1) == 3 && h("completed").getLong(1) == 1
      && h("running").getLong(1) == 1)
    assert(h("pending").getLong(2) == 1, "job 4 exhausted its 3-retry budget")
    // now = t=100 (job 5's claim); oldest pending created at t=1 (job 3)
    assert(h("pending").getLong(3) == 99, "oldest pending age")
    assert(h("running").getLong(3) == 0, "job 5 created at now")
  }

  test("es10 trim report: under-cap streams stay out, total sums only trimmed streams") {
    val events = (
      (1 to 5).map(i => ("a", i.toLong)) ++   // over a cap of 3 → deleted 2
      (1 to 3).map(i => ("b", 100L + i)) ++   // exactly at cap → NOT reported
      (1 to 7).map(i => ("c", 200L + i)))     // deleted 4
      .toDF("event_type", "event_id")
    val rep = graft.operators.Trail.streamTrimReportOn(events, hardMaxLen = 3L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rep.keySet == Set("a", "c"), "only deleted > 0 streams appear")
    assert(rep("a").getLong(2) == 2 && rep("c").getLong(2) == 4)
    assert(rep("a").getLong(3) == 3, "kept = the cap")
    assert(rep.values.forall(_.getLong(4) == 6), "pass total on every row")
  }
}
