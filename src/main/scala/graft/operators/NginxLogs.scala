package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** ng01-ng03: nginx access-log analysis — reference
  * scripts/analyze-nginx-logs.sh (the awk battery over parsed
  * `timestamp|path|status|rt|uct|uht|urt` records):
  *
  *  - parse (:62): rt/uct/uht/urt suffix fields, the request path as
  *    the second word of the first quoted string, the status as
  *    whitespace field 9, the bracketed timestamp. The script's
  *    `grep -oP 'rt=\K…'` also matches INSIDE `urt=` and garbles its
  *    own temp format with a two-line capture — re-expressed as the
  *    space-anchored standalone field the script intends;
  *  - ng01 (:95-137): count, mean rt (3 dp), two-middle-mean median,
  *    max rt with the FIRST max line's path and status, min rt over
  *    POSITIVE values only (the awk min=999 initialization leaks
  *    when every rt is 0 — kept), upstream response/connect means,
  *    and the slow count (rt ≥ the 1.0 s default threshold);
  *  - ng02 (:147): status-code distribution with 1-dp percentages;
  *  - ng03 (:158): top-10 endpoints (query string stripped) by mean
  *    rt — `sort -rn` on the formatted row is tie-ambiguous;
  *    re-expressed as (avg desc, count desc, endpoint desc).
  *
  * rt strings compose from integer milli-parts (never a double
  * format), so parsed values are exact millis on both engines and
  * every mean is an integer-moment chain.
  *
  * Scale: the parse is a stateless scan projection; each rollup is
  * one bounded-key aggregation (ng01's median rides a single rank
  * window — the ev03-accepted exact form).
  */
object NginxLogs {

  val SlowThresholdMillis = 1000L

  /** Composed raw access lines (round-tripped through the parser). */
  def composeLines(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    def milli(expr0: Column): Column =
      concat((expr0 / 1000).cast("long").cast("string"), lit("."),
        lpad((expr0 % 1000).cast("string"), 3, "0"))
    val rtm = when(col("event_id") % 17 === 0, 0L)
      .otherwise((col("event_id") * 7) % 1500)
    val uct = (col("event_id") * 3) % 40
    val uht = (col("event_id") * 5) % 900
    val urt = (col("event_id") * 11) % 1400
    val path = concat(lit("/api/"),
      element_at(typedLit(Seq("items", "search", "feeds", "tags")),
        (col("event_id") % 4).cast("int") + 1),
      when(col("event_id") % 3 === 0,
        concat(lit("?id="), (col("event_id") % 50).cast("string"))).otherwise(""))
    val status = element_at(typedLit(Seq("200", "404", "500", "200", "301")),
      (col("event_id") % 5).cast("int") + 1)
    e.select(col("event_id").as("line_id"), concat(
      lit("198.51.100.7 - - ["),
      date_format(col("ts"), "dd/MMM/yyyy:HH:mm:ss"), lit(" +0000] \"GET "),
      path, lit(" HTTP/1.1\" "), status, lit(" 512 \"-\" \"agent\" rt="),
      milli(rtm), lit(" uct="), milli(uct), lit(" uht="), milli(uht),
      lit(" urt="), milli(urt)).as("line"))
  }

  /** Parsed records in exact milli-units. */
  def parseOn(lines: DataFrame): DataFrame = {
    def field(name: String): Column =
      round(regexp_extract(col("line"), s" $name=([0-9.]+)", 1)
        .cast("double") * 1000, 0).cast("long")
    lines.select(col("line_id"),
      regexp_extract(col("line"), "\\[([^\\]]+)\\]", 1).as("ts_str"),
      regexp_extract(col("line"), "\"[A-Z]+ ([^ \"]+)", 1).as("path"),
      element_at(split(col("line"), " "), 9).as("status"),
      field("rt").as("rt"), field("uct").as("uct"),
      field("uht").as("uht"), field("urt").as("urt"))
  }

  /** ng01: the one-row core statistics. The awk median (two-middle
    * mean) IS the interpolated percentile at 0.5 over exact millis —
    * no global sort window needed.
    */
  def requestStatsOn(lines: DataFrame): DataFrame = {
    val p = parseOn(lines)
    // the slowest-line attribution is an argmax, so it rides the SAME
    // aggregation as the scalars (max over (rt, -line_id, …) picks the
    // max-rt row with the smallest line_id on ties — exactly the
    // crossJoin+filter+limit(1) row) — the previous three-branch form
    // re-ran the compose+parse regex scan three times (guide §2.4)
    p.agg(
      count(lit(1)).as("n"),
      (round(sum("rt") * lit(1.0) / count(lit(1)), 0).cast("long") / 1e3).as("avg_rt"),
      (expr("percentile(rt, 0.5)") / 1e3).as("median_rt"),
      (max("rt") / 1e3).as("max_rt"),
      (coalesce(min(when(col("rt") > 0, col("rt"))), lit(999000L)) / 1e3).as("min_rt"),
      (round(sum("urt") * lit(1.0) / count(lit(1)), 0).cast("long") / 1e3).as("avg_urt"),
      (round(sum("uct") * lit(1.0) / count(lit(1)), 0).cast("long") / 1e3).as("avg_uct"),
      sum(when(col("rt") >= SlowThresholdMillis, 1L).otherwise(0L)).as("slow_count"),
      max(struct(col("rt"), (-col("line_id")).as("nid"),
        col("path"), col("status"))).as("mx"))
      .withColumn("max_path", col("mx.path"))
      .withColumn("max_status", col("mx.status"))
      .drop("mx")
  }

  /** ng02: status distribution with 1-dp shares. */
  def statusStatsOn(lines: DataFrame): DataFrame = {
    val p = parseOn(lines)
    // total = Σ of the per-status counts — re-aggregate the ≤5-row
    // counts frame instead of re-running the parse scan a second time
    val counts = p.groupBy("status").agg(count(lit(1)).as("count"))
    counts
      .crossJoin(broadcast(counts.agg(sum("count").as("total"))))
      .select(col("status"), col("count"),
        (round(col("count") * lit(100.0) * 10 / col("total"), 0).cast("long") / 1e1)
          .as("pct"))
  }

  /** ng03: top-10 endpoints by mean rt. */
  def endpointStatsOn(lines: DataFrame): DataFrame =
    parseOn(lines)
      .select(regexp_replace(col("path"), "\\?.*$", "").as("endpoint"), col("rt"))
      .groupBy("endpoint")
      .agg(count(lit(1)).as("count"),
        (round(sum("rt") * lit(1.0) / count(lit(1)), 0).cast("long") / 1e3).as("avg_rt"))
      .orderBy(col("avg_rt").desc, col("count").desc, col("endpoint").desc)
      .limit(10)

  def ng01(s: SparkSession, dir: String): DataFrame =
    requestStatsOn(composeLines(s, dir))
  def ng02(s: SparkSession, dir: String): DataFrame =
    statusStatsOn(composeLines(s, dir))
  def ng03(s: SparkSession, dir: String): DataFrame =
    endpointStatsOn(composeLines(s, dir))
}
