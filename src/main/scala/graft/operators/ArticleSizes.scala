package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.microRound

/** as01: article size distribution — reference
  * news-creator/app/scripts/analyze_article_sizes.py `analyze_sizes`
  * (:112): char and estimated-token distributions over article
  * contents —
  *
  *  - tokens = max(1, len·3 // 4) (:72 — the same convention as
  *    mr01's token counter, here as a corpus battery);
  *  - min / max / mean for both units;
  *  - np.percentile at [10, 25, 50, 75, 90, 95, 99, 99.9] — linear
  *    interpolation (≡ percentile_cont) then int() TRUNCATION (:145);
  *  - context-fit rates: the share of articles whose token estimate
  *    fits each context budget (8K/16K/60K minus the 500-token
  *    reserve), rounded to 2 dp (:156).
  *
  * Scale: ONE aggregation over the scan; the exact percentiles sort
  * once (ev03's accepted form — at true scale the sketch path
  * applies); output is a single row.
  */
object ArticleSizes {

  val Percentiles: Seq[Double] = Seq(0.10, 0.25, 0.50, 0.75, 0.90, 0.95, 0.99, 0.999)
  val PercentileNames: Seq[String] =
    Seq("p10", "p25", "p50", "p75", "p90", "p95", "p99", "p99_9")
  val ContextSizes: Seq[(String, Long)] =
    Seq("8K" -> (8000L - 500), "16K" -> (16000L - 500), "60K" -> (60000L - 500))

  def sizesOn(contents: DataFrame): DataFrame = {
    val chars = length(col("content")).cast("long")
    val toks = greatest(lit(1L), floor(chars * 3 / 4).cast("long"))
    val sized = contents.select(chars.as("chars"), toks.as("toks"))
    val pcts = Percentiles.mkString("array(", ", ", ")")
    val base = Seq(
      count(lit(1)).as("total_articles"),
      min("chars").as("min_chars"), max("chars").as("max_chars"),
      microRound(sum("chars") * lit(1.0) / count(lit(1)), 6).as("mean_chars"),
      min("toks").as("min_tokens"), max("toks").as("max_tokens"),
      microRound(sum("toks") * lit(1.0) / count(lit(1)), 6).as("mean_tokens"),
      expr(s"percentile(chars, $pcts)").as("cp"),
      expr(s"percentile(toks, $pcts)").as("tp")) ++
      ContextSizes.map { case (name, limit) =>
        (round(sum(when(col("toks") <= limit, 1L).otherwise(0L)) * lit(100.0) *
          100 / count(lit(1)), 0).cast("long") / 1e2).as(s"fit_$name")
      }
    val agg = sized.agg(base.head, base.tail: _*)
    val pctCols = PercentileNames.zipWithIndex.flatMap { case (n, i) =>
      Seq(floor(element_at(col("cp"), i + 1)).cast("long").as(s"char_$n"),
        floor(element_at(col("tp"), i + 1)).cast("long").as(s"token_$n"))
    }
    agg.select(col("total_articles") +: col("min_chars") +: col("max_chars") +:
      col("mean_chars") +: col("min_tokens") +: col("max_tokens") +:
      col("mean_tokens") +: (pctCols ++
        ContextSizes.map { case (n, _) => col(s"fit_$n") }): _*)
  }

  def as01(s: SparkSession, dir: String): DataFrame =
    sizesOn(Tables.documents(s, dir).select(col("text").as("content")))
}
