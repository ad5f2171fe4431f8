package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** lt04: docker-compose log issue extraction — reference
  * scripts/analyze_docker_logs.py:
  *
  *  - `parse_log_line` (:15): split on " | " with maxsplit 2 →
  *    (service, timestamp, message), each stripped; under 3 parts →
  *    no service → the line is skipped by every extractor;
  *  - `extract_errors_and_warnings` (:48): case-insensitive regex
  *    ladders (ERROR/Exception/panic/failed/timeout/deadline
  *    exceeded; WARN/warning/threshold/below threshold/fallback/
  *    insufficient/skipped) — the per-list break only dedupes WITHIN
  *    a list, so one line can be both an error and a warning;
  *  - `extract_genre_classification_issues` (:102): six ordered
  *    (pattern → issue_type) rules, recap-worker/recap-subworker
  *    lines only; order is semantic — "min_cluster_size" lines
  *    label as cluster_size because `cluster.*size` fires first in
  *    the CLUSTERING ladder (:141 vs :144);
  *  - `extract_clustering_issues` (:134): seven ordered rules,
  *    recap-subworker only.
  *
  * Output: one row per (line, category) hit — category ∈ {error,
  * warning, genre_issue, clustering_issue}; issue_type labels the
  * genre/clustering ladders (the reference keeps no per-pattern
  * label for errors/warnings, so those rows carry NULL).
  *
  * Scale: a stateless scan — split + four bounded regex ladders per
  * row, the hits exploding to ≤4 rows per line, zero shuffles (the
  * src08/lt01 shape). The oracle splits without a limit, which is
  * identical here because composed messages never contain " | ".
  *
  * Composition: lines render as service | ISO-timestamp | message
  * from the events table, services rotating over four names, error/
  * warning/genre/clustering phrases planted on independent residues
  * (including the both-lists line, the cluster_size-order quirk, a
  * padded service name exercising strip, and a separator-less
  * malformed line that must vanish).
  */
object DockerLogs {

  val services: Seq[String] =
    Seq("recap-worker", "recap-subworker", "alt-backend", "recap-db")

  /** Composed raw lines: (line_id, line). */
  def composeLines(s: SparkSession, dir: String): DataFrame = {
    val svc = element_at(typedLit(services), (col("event_id") % 4).cast("int") + 1)
    val ts = date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    val msg = concat(
      lit("job "), (col("event_id") % 997).cast("string"), lit(" step done"),
      when(col("event_id") % 5 === 0, " ERROR: pipeline failed for stage 3")
        .when(col("event_id") % 5 === 1, " request Timeout after 30s")
        .when(col("event_id") % 5 === 2, " WARN: value below threshold")
        .when(col("event_id") % 5 === 3, " Fallback to default genre used")
        .otherwise(""),
      when(col("event_id") % 11 === 0, " article classified as other bucket")
        .when(col("event_id") % 11 === 1, " rocchio centroid update")
        .when(col("event_id") % 11 === 2, " graph label propagation pass")
        .when(col("event_id") % 11 === 3, " genre scoring failed hard")
        .when(col("event_id") % 11 === 4, " genre score below threshold now")
        .otherwise(""),
      when(col("event_id") % 9 === 0, " umap projection finished")
        .when(col("event_id") % 9 === 1, " HDBSCAN pass complete")
        .when(col("event_id") % 9 === 2, " min_cluster_size=5 applied")
        .when(col("event_id") % 9 === 3, " noise ratio high")
        .when(col("event_id") % 9 === 4, " dbcv score low")
        .when(col("event_id") % 9 === 5, " embedding cache warm")
        .otherwise(""))
    Tables.events(s, dir).select(
      col("event_id").as("line_id"),
      when(col("event_id") % 13 === 0, lit("malformed line no separators"))
        .otherwise(concat(
          svc,
          when(col("event_id") % 17 === 0, " ").otherwise(""), // strip() pin
          lit(" | "), ts, lit(" | "), msg)).as("line"))
  }

  private def ladder(rules: Seq[(String, String)]): Column =
    rules.foldRight(lit(null).cast("string")) { case ((re, label), acc) =>
      when(col("message").rlike("(?i)" + re), label).otherwise(acc)
    }

  val genreRules: Seq[(String, String)] = Seq(
    ("genre.*threshold", "threshold"),
    ("fallback.*genre", "fallback"),
    ("classified.*other", "other_classification"),
    ("genre.*failed", "classification_failure"),
    ("rocchio", "rocchio_mention"),
    ("graph.*propagation", "graph_propagation"))

  val clusteringRules: Seq[(String, String)] = Seq(
    ("umap", "umap_mention"),
    ("hdbscan", "hdbscan_mention"),
    ("cluster.*size", "cluster_size"),
    ("noise", "noise_mention"),
    ("dbcv", "dbcv_mention"),
    ("min_cluster_size", "min_cluster_size"),
    ("embedding", "embedding_mention"))

  val errorRe = "(ERROR|Exception|panic|failed|timeout|deadline exceeded)"
  val warnRe = "(WARN|warning|threshold|below threshold|fallback|insufficient|skipped)"

  /** The extractors over any (line_id, line) frame. */
  def issuesOn(lines: DataFrame): DataFrame = {
    val parts = split(col("line"), " \\| ", 3)
    val parsed = lines
      .filter(size(parts) >= 3)
      .select(col("line_id"),
        trim(element_at(parts, 1)).as("service"),
        trim(element_at(parts, 2)).as("ts_str"),
        trim(element_at(parts, 3)).as("message"))
    val empty = array().cast("array<struct<category:string,issue_type:string>>")
    def hit(cond: Column, category: String, label: Column): Column =
      when(cond, array(struct(lit(category).as("category"), label.as("issue_type"))))
        .otherwise(empty)
    val nul = lit(null).cast("string")
    val genreType = ladder(genreRules)
    val clusType = ladder(clusteringRules)
    val isRecap = col("service").isin("recap-worker", "recap-subworker")
    val hits = concat(
      hit(col("message").rlike("(?i)" + errorRe), "error", nul),
      hit(col("message").rlike("(?i)" + warnRe), "warning", nul),
      hit(isRecap && genreType.isNotNull, "genre_issue", genreType),
      hit(col("service") === "recap-subworker" && clusType.isNotNull,
        "clustering_issue", clusType))
    parsed
      .select(col("line_id"), col("service"), col("ts_str"),
        col("message"), explode(hits).as("h"))
      .select(col("line_id"), col("service"), col("ts_str"),
        col("h.category").as("category"), col("h.issue_type").as("issue_type"),
        col("message"))
  }

  def lt04(s: SparkSession, dir: String): DataFrame =
    issuesOn(composeLines(s, dir))
}
