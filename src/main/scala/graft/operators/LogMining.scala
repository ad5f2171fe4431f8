package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Log template mining — collapse raw log lines into their constant
  * skeletons (Drain-style parameter masking: He et al. 2017, "Drain:
  * An Online Log Parsing Approach with Fixed Depth Tree").
  *
  * The reference's rask-log-forwarder / rask-log-aggregator ship raw
  * container log lines into ClickHouse; the "what is this noisy
  * service actually logging" rollup is template extraction: tokenize,
  * mask variable tokens (anything digit-bearing — ids, counts, ips,
  * latencies), and group by the remaining constant skeleton. The
  * masked-token rule is Drain's preprocessing step; the fixed-depth
  * tree on top of it is an in-memory index for ONLINE parsing and
  * adds nothing to a batch groupBy, so the Spark form is the mask +
  * one aggregation.
  *
  * Scale: the mask is a stateless per-row `transform` over the token
  * array — pure codegen, no shuffle, no UDF. The rollup shuffles once
  * keyed by template with map-side partial aggregation; template
  * cardinality is bounded by the code sites emitting logs (thousands),
  * not by log volume, so the post-shuffle state is tiny at any scale.
  */
object LogMining {

  /** Mask digit-bearing tokens of a whitespace-tokenized line with the
    * `<*>` wildcard and return the constant template skeleton.
    */
  def template(line: Column): Column =
    array_join(
      transform(split(trim(line), "\\s+"),
        t => when(t.rlike("\\d"), lit("<*>")).otherwise(t)),
      " ")

  /** The composed event log line lt01/lt02 both mine — every nullable
    * field is coalesce-guarded to the literal 'null' (no digits, so it
    * survives masking as a constant token): an unguarded NULL would
    * null out the whole concat, making the template itself NULL —
    * Spark's groupBy keeps a NULL key but joins and countDistinct
    * silently drop it, so NULL-user rows would desynchronize the two
    * engines' template universes.
    */
  private[graft] def composedLine: Column = concat(
    lit("user="), coalesce(col("user_id").cast("string"), lit("null")),
    lit(" type="), col("event_type"),
    lit(" value="), coalesce(round(col("value"), 2).cast("string"), lit("null")),
    lit(" props="), coalesce(col("props"), lit("null")))

  /** lt01: per-template rollup over composed event log lines — volume,
    * distinct emitting users, and observation span. Lines are composed
    * from the events table the same way tx24's scrub audit does
    * (user=… type=… value=… props=…), which makes user ids, values and
    * the props payload the variable tokens and the type markers the
    * constant skeleton.
    */
  def logTemplates(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("line", composedLine)
      .withColumn("template", template(col("line")))
      .groupBy("template")
      .agg(
        count(lit(1)).as("n_lines"),
        countDistinct("user_id").as("n_users"),
        date_trunc("second", min(col("ts"))).as("first_seen"),
        date_trunc("second", max(col("ts"))).as("last_seen"))

  /** lt02: novel-template detection — per day, how many DISTINCT
    * templates were observed and how many appeared for the FIRST time
    * (a deploy that introduces a new log site, or an error class never
    * seen before, shows up as a novelty spike; the "new error
    * template" alert every log platform builds on top of template
    * mining — Drain's online use case, reread as a batch rollup).
    *
    * Scale: template cardinality is bounded by emitting code sites,
    * so after the per-(template, day) aggregation (map-side combined
    * over the raw volume — the ONLY pass over raw events) everything
    * downstream operates on a tiny frame: first-day is a window over
    * ≤ |days| rows per template (not a join that would re-derive the
    * raw aggregation), and the day rollup is a third bounded shuffle.
    */
  def novelTemplates(s: SparkSession, dir: String): DataFrame =
    novelTemplatesOn(Tables.events(s, dir))

  /** lt03: per-template volume-burst detection — the "error storm"
    * alert next to lt02's novelty alert: a template suddenly logging
    * at many times its normal rate (a retry loop, a crash-restart
    * cycle, a misbehaving dependency) pages even though the template
    * itself is old news. Per (template, day), the day's line count is
    * compared against the template's stream-wide daily mean
    * (total_lines / days-in-stream): burst when the day exceeds 2×
    * the mean, quiet when it falls below half — dq02's volume-gate
    * semantics applied at the template key, where a single service's
    * storm is visible long before it moves the global volume.
    *
    * Both comparisons cross-multiply into exact integer arithmetic in
    * decimal(38,0) (n_lines·n_stream_days vs 2·total_lines — dq07's
    * discipline: two 100 TB-scale counts multiplied overflow a long,
    * and a quotient's rounding could flip a flag between engines).
    *
    * Scale: raw volume collapses in the ONE map-side-combined
    * (template, day) aggregation — the same first pass lt02 runs;
    * the per-template totals are a window over ≤ |days| rows per
    * template on the code-site-bounded frame, and the stream-day
    * count broadcasts as a one-row scalar.
    */
  def templateBursts(s: SparkSession, dir: String): DataFrame =
    templateBurstsOn(Tables.events(s, dir))

  /** Template volume bursts over any events-shaped frame. */
  def templateBurstsOn(events: DataFrame): DataFrame = {
    val byTemplate = org.apache.spark.sql.expressions.Window.partitionBy("template")
    val perDay = events
      .withColumn("line", composedLine)
      .withColumn("template", template(col("line")))
      .groupBy(col("template"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_lines"))
    val streamDays = perDay.agg(countDistinct("day").as("n_stream_days"))
    perDay
      .withColumn("total_lines", sum("n_lines").over(byTemplate))
      .crossJoin(broadcast(streamDays))
      .select(col("template"), col("day"), col("n_lines"), col("total_lines"),
        col("n_stream_days"),
        when(col("n_lines").cast("decimal(38,0)") * col("n_stream_days") >
             col("total_lines").cast("decimal(38,0)") * 2, 1)
          .otherwise(0).as("burst"),
        when(col("n_lines").cast("decimal(38,0)") * col("n_stream_days") * 2 <
             col("total_lines").cast("decimal(38,0)"), 1)
          .otherwise(0).as("quiet"))
  }

  /** Novel-template rollup over any events-shaped frame. */
  def novelTemplatesOn(events: DataFrame): DataFrame = {
    val byTemplate = org.apache.spark.sql.expressions.Window.partitionBy("template")
    events
      .withColumn("line", composedLine)
      .withColumn("template", template(col("line")))
      .groupBy(col("template"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_lines"))
      .withColumn("first_day", min("day").over(byTemplate))
      .groupBy("day")
      .agg(
        countDistinct("template").as("n_templates"),
        count(when(col("day") === col("first_day"), 1)).as("n_novel"),
        sum("n_lines").as("n_lines"))
  }
}
