package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** lg01: the rolling tag-label graph BUILDER — reference
  * tag-generator/app/scripts/build_label_graph.py, the job that
  * produces the `tag_label_graph` bd01 diagnoses and the graph-boost
  * family consumes:
  *
  *  - fetch (:149): genre = LOWER(COALESCE(final_genre, 'other')),
  *    the top_tags JSON, updated_at, windowed by N days — built for
  *    BOTH default windows (7 and 30 days, :104) in one pass here;
  *  - `aggregate_tag_edges` (:59): per article only the FIRST
  *    max_tags(=6) tags count; labels strip+lower with empties
  *    skipped; a missing/null confidence coerces to 0.0 (`or 0.0`)
  *    and anything under min_confidence(=0.55) skips; genres
  *    normalize again with '' → 'other';
  *  - edges under min_support(=3) samples drop; weight =
  *    clamp[0,1](round(mean confidence, 6)); last_observed_at is the
  *    edge's max updated_at.
  *
  * Confidences compose as exact sixteenths, so the mean is an
  * order-free integer chain (micro-units); the 6-dp round is the
  * scale-0 discipline standing in for Python's banker rounding.
  *
  * Scale: one scan explodes ≤max_tags labels per article, joins the
  * TWO-row broadcast window frame, and aggregates map-side on
  * (window, genre, tag) — bounded keys; exactly the nightly job that
  * rebuilds the graph from 100 TB of learning results.
  */
object LabelGraph {

  val MaxTags = 6
  val MinConfidence = 0.55
  val MinSupport = 3
  val WindowDays: Seq[Int] = Seq(7, 30)

  /** Composed learning rows: (updated_at, refine_decision,
    * tag_profile) with tag confidences in exact sixteenths and every
    * skip path on its own residue.
    */
  def composeLearning(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    def tag(i: Int): Column = {
      val conf = (col("event_id") * (i + 3) + i * 5) % 16
      concat(lit(s"""{"label": "tag"""), ((col("event_id") + i) % 9).cast("string"),
        lit(s"""", "confidence": """), conf.cast("double") / 16, lit("}"))
    }
    val tags =
      when(col("event_id") % 19 === 0, lit(null).cast("string"))
        .when(col("event_id") % 19 === 1,
          // 7 tags — the 7th must NOT count (max_tags slice); plus an
          // empty label and a null confidence
          concat(lit("""{"top_tags": ["""), tag(0), lit(", "), tag(1), lit(", "),
            lit("""{"label": "", "confidence": 0.9375}, """),
            lit("""{"label": "nullconf", "confidence": null}, """),
            tag(2), lit(", "), tag(3), lit(", "),
            lit("""{"label": "seventh", "confidence": 0.9375}"""), lit("]}")))
        .otherwise(concat(lit("""{"top_tags": ["""), tag(0), lit(", "), tag(1), lit("]}")))
    val genre =
      when(col("event_id") % 23 === 0, "{\"other_key\": 1}") // final_genre absent → 'other'
        .when(col("event_id") % 23 === 1, "{\"final_genre\": \"\"}") // '' → 'other'
        .when(col("event_id") % 4 === 0,
          concat(lit("{\"final_genre\": \" G"), (col("event_id") % 5).cast("string"),
            lit(" \"}")))
        .otherwise(concat(lit("{\"final_genre\": \"g"),
          (col("event_id") % 5).cast("string"), lit("\"}")))
    e.select(col("ts").as("updated_at"), genre.as("refine_decision"),
      tags.as("tag_profile"))
  }

  /** The builder over any (updated_at, refine_decision, tag_profile)
    * frame — both windows in one pass.
    */
  def buildOn(lr: DataFrame): DataFrame = {
    val s = lr.sparkSession
    import s.implicits._
    val tt = get_json_object(col("tag_profile"), "$.top_tags")
    val parsed = when(tt.startsWith("[{"),
      slice(from_json(tt, org.apache.spark.sql.types.DataType
        .fromDDL("array<struct<label:string,confidence:double>>")), 1, MaxTags))
      .otherwise(array().cast("array<struct<label:string,confidence:double>>"))
    val genreSql = lower(coalesce(
      get_json_object(col("refine_decision"), "$.final_genre"), lit("other")))
    val genre0 = trim(lower(genreSql))
    val rows = lr
      .crossJoin(broadcast(lr.agg(max("updated_at").as("as_of"))))
      .select(col("updated_at"), col("as_of"),
        when(genre0 === "", "other").otherwise(genre0).as("genre"),
        explode(parsed).as("t"))
      .select(col("updated_at"), col("as_of"), col("genre"),
        trim(lower(col("t.label"))).as("tag"),
        round(coalesce(col("t.confidence"), lit(0.0)) * 1e6, 0).cast("long").as("cu"))
      .filter(col("tag") =!= "" && col("cu") >= math.round(MinConfidence * 1e6))
    val windows = WindowDays.map(d => (s"${d}d", d)).toDF("window_label", "days")
    rows
      .join(broadcast(windows),
        expr("updated_at >= as_of - make_interval(0, 0, 0, days)"))
      .groupBy("window_label", "genre", "tag")
      .agg(count(lit(1)).as("sample_size"), sum("cu").as("su"),
        max("updated_at").as("last_observed_at"))
      .filter(col("sample_size") >= math.max(1, MinSupport))
      .select(col("window_label"), col("genre"), col("tag"),
        greatest(lit(0.0), least(lit(1.0),
          round(col("su") / col("sample_size"), 0).cast("long") / 1e6)).as("weight"),
        col("sample_size"), col("last_observed_at"))
  }

  def lg01(s: SparkSession, dir: String): DataFrame =
    buildOn(composeLearning(s, dir))
}
