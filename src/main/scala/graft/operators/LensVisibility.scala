package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** kh01 — lens-filtered visibility (knowledge-sovereign
  * driver/sovereign_db/lens_visibility.go:20 AreArticlesVisibleInLens):
  * for each article, whether it appears in the user's lens-filtered
  * Knowledge Home view. The reference computes this as a PURE READ
  * reusing GetKnowledgeHomeItems' predicates so stream delivery and
  * unary fetch agree on visibility; absent rows are NOT VISIBLE
  * (fail-closed — :18).
  *
  * Gates, in the reference's WHERE order:
  *  - the projection gates: article rows, ACTIVE projection version,
  *    not dismissed;
  *  - query text (:40): case-insensitive substring over title OR
  *    COALESCE(summary, '') OR ANY tag;
  *  - tag filter (:52): any tag exactly in the requested set;
  *  - time window (:60): published_at ≥ cutoff.
  *
  * The composed knowledge_home_items view plants every gate a cohort:
  * NULL summaries (the COALESCE is load-bearing), dismissed rows,
  * stale-projection-version rows, tag arrays from (lang, source), and
  * a published_at ramp. Output = one row PER INPUT ARTICLE with the
  * fail-closed boolean, so callers see explicit false, never absence.
  *
  * Scale: the whole check is a stateless predicate battery fused into
  * the projection scan (exists() over the in-row tag array — no
  * explode, no join); at 100 TB the projection gates and the time
  * cutoff are partition-pruning predicates on the items table.
  */
object LensVisibility {

  /** The composed knowledge_home_items stand-in from documents. */
  def knowledgeHomeItems(s: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    Tables.documents(s, dir).select(
      d.as("primary_ref_id"),
      substring(col("text"), 1, 50).as("title"),
      when(pmod(d, lit(11)) === 0, lit(null).cast("string"))
        .otherwise(substring(col("text"), 51, 150)).as("summary_excerpt"),
      array(col("lang"), col("source")).as("tags"),
      // hour ramp so the window cutoff splits the corpus at EVERY SF
      // (a minute ramp left all sf0.001 docs before any realistic cutoff)
      timestamp_seconds(lit(1700000000L) + pmod(d, lit(50000)) * 3600).as("published_at"),
      when(pmod(d, lit(37)) === 0, timestamp_seconds(lit(1700000000L)))
        .otherwise(lit(null).cast("timestamp")).as("dismissed_at"),
      when(pmod(d, lit(23)) === 0, 1L).otherwise(2L).as("projection_version"))
  }

  /** The lens predicate battery over an items frame. */
  def visibleIn(items: DataFrame, activeVersion: Long = 2L,
                queryText: Option[String] = Some("data"),
                tagNames: Seq[String] = Seq("en", "zh"),
                cutoff: Option[String] = Some("2023-11-20 00:00:00")): DataFrame = {
    val projGates = col("projection_version") === activeVersion &&
      col("dismissed_at").isNull
    // fail-closed means FALSE, never NULL: a NULL title or tags array
    // must not null the whole conjunction out of getBoolean's reach
    val textGate = queryText.map { q =>
      coalesce(col("title"), lit("")).ilike("%" + q + "%") ||
        coalesce(col("summary_excerpt"), lit("")).ilike("%" + q + "%") ||
        coalesce(exists(col("tags"), t => t.ilike("%" + q + "%")), lit(false))
    }.getOrElse(lit(true))
    val tagGate =
      if (tagNames.isEmpty) lit(true)
      else coalesce(exists(col("tags"), t => t.isin(tagNames.map(x => x: Any): _*)),
        lit(false))
    val timeGate = cutoff.map(c =>
      col("published_at") >= to_timestamp(lit(c))).getOrElse(lit(true))
    items.select(col("primary_ref_id").as("doc_id"),
      (projGates && textGate && tagGate && timeGate).as("visible"))
      .orderBy("doc_id")
  }

  def kh01(s: SparkSession, dir: String): DataFrame =
    visibleIn(knowledgeHomeItems(s, dir))
}
