package graft

import graft.operators.DockerLogs
import org.apache.spark.sql.functions._

/** Docker-log issue extraction: one planted case per reference rule
  * (scripts/analyze_docker_logs.py).
  */
class DockerLogsSpec extends SparkSpec {
  import spark.implicits._

  private def issues(lines: String*): Seq[(String, String, String)] =
    DockerLogs.issuesOn(
      lines.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("line_id", "line"))
      .collect().map(r => (r.getString(1), r.getString(3), r.getString(4))).toSeq

  test("parse: ' | ' 3-way split with stripping; under 3 parts → the line vanishes (:20)") {
    assert(issues("no separators ERROR here").isEmpty,
      "a malformed line has no service and is skipped by every extractor")
    assert(issues("recap-worker  | 2025-01-01T00:00:00Z | panic at startup") ==
      Seq(("recap-worker", "error", null)),
      "the padded service name strips clean")
  }

  test("error and warning ladders are independent: one line can be both (:79,:88)") {
    assert(issues("alt-backend | t | deadline exceeded on fallback path").toSet ==
      Set(("alt-backend", "error", null), ("alt-backend", "warning", null)))
    assert(issues("alt-backend | t | Request TIMEOUT retrying") ==
      Seq(("alt-backend", "error", null)), "case-insensitive match")
    assert(issues("alt-backend | t | all good").isEmpty)
  }

  test("genre ladder: recap services only, ordered first-match (:106,:118)") {
    assert(issues("recap-worker | t | genre score near threshold") ==
      Seq(("recap-worker", "warning", null),   // 'threshold' is also a warning
          ("recap-worker", "genre_issue", "threshold")))
    assert(issues("alt-backend | t | rocchio centroid update").isEmpty,
      "genre rules never fire outside recap-worker/recap-subworker")
    assert(issues("recap-subworker | t | rocchio centroid update") ==
      Seq(("recap-subworker", "genre_issue", "rocchio_mention")))
    // genre.*threshold precedes fallback.*genre in the ladder
    assert(issues("recap-worker | t | fallback genre under threshold")
      .filter(_._2 == "genre_issue").map(_._3) == Seq("threshold"))
  }

  test("clustering ladder: recap-subworker ONLY; cluster.*size shadows min_cluster_size (:141)") {
    assert(issues("recap-worker | t | umap projection finished").isEmpty,
      "clustering rules are subworker-exclusive — even recap-worker is out")
    assert(issues("recap-subworker | t | min_cluster_size=5 applied") ==
      Seq(("recap-subworker", "clustering_issue", "cluster_size")),
      "'min_cluster_size' contains a cluster.*size match, which fires first")
    assert(issues("recap-subworker | t | dbcv score low") ==
      Seq(("recap-subworker", "clustering_issue", "dbcv_mention")))
  }

  test("composition: every category and the malformed skip at sf0.001") {
    val out = DockerLogs.lt04(spark, sfDir).cache()
    val cats = out.select("category").distinct().collect().map(_.getString(0)).toSet
    assert(cats == Set("error", "warning", "genre_issue", "clustering_issue"))
    assert(out.filter(col("line_id") % 13 === 0).count() == 0,
      "separator-less lines never emit")
    assert(out.filter(col("category") === "clustering_issue" &&
      col("service") =!= "recap-subworker").count() == 0)
    out.unpersist()
  }
}
