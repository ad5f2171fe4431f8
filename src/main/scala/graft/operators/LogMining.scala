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

  /** lt01: per-template rollup over composed event log lines — volume,
    * distinct emitting users, and observation span. Lines are composed
    * from the events table the same way tx24's scrub audit does
    * (user=… type=… value=… props=…), which makes user ids, values and
    * the props payload the variable tokens and the type markers the
    * constant skeleton.
    */
  def logTemplates(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("line", concat(
        lit("user="), col("user_id").cast("string"),
        lit(" type="), col("event_type"),
        lit(" value="), coalesce(round(col("value"), 2).cast("string"), lit("null")),
        lit(" props="), col("props")))
      .withColumn("template", template(col("line")))
      .groupBy("template")
      .agg(
        count(lit(1)).as("n_lines"),
        countDistinct("user_id").as("n_users"),
        date_trunc("second", min(col("ts"))).as("first_seen"),
        date_trunc("second", max(col("ts"))).as("last_seen"))
}
