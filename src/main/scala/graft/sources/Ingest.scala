package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions

/** The reference's ingestion pipeline end-to-end, as one composed plan:
  * feed XML → article rows → HTML-stripped text → quality gate →
  * exact dedup (first article per content hash wins).
  *
  * This is Alt's pre-processor path (fetch → sanitize → normalize →
  * dedup before enrichment) expressed as a single Catalyst plan —
  * every stage is a projection/filter/window over the previous one, so
  * the whole pipeline runs in two stages (scan+clean, then the dedup
  * shuffle on content hash) no matter how many feeds it ingests. Works
  * identically over a batch DataFrame or a readStream source (swap the
  * dedup for dropDuplicates-with-watermark in streaming).
  */
object Ingest {

  /** (feed_url, item_xml) payloads → clean deduplicated article corpus. */
  def feedToCorpus(feedItems: DataFrame, minTokens: Int = 3): DataFrame = {
    val parsed = FeedXml.articles(feedItems)
      .withColumn("text", TextFunctions.stripHtml(col("description")))
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
      .filter(col("text").isNotNull && col("n_tokens") >= minTokens)
    val w = Window.partitionBy("content_hash")
      .orderBy(col("published_at").asc_nulls_last, col("article_id").asc)
    parsed
      .withColumn("content_hash", md5(col("text")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("article_id", "feed_url", "title", "link", "published_at", "text", "n_tokens")
  }
}
