package graft

import graft.operators.QueryFacets
import org.apache.spark.sql.DataFrame

/** Query-facet decomposition: one planted case per reference rule
  * (acolyte domain/query_facet.py).
  */
class QueryFacetsSpec extends SparkSpec {
  import spark.implicits._

  private def facet(query: String,
                    role: String = "general",
                    synthesisOnly: Boolean = false,
                    topic: String = "",
                    entities: Seq[String] = Seq.empty,
                    timeRange: Option[String] = None) = {
    val df: DataFrame = Seq(
      (1L, query, role, synthesisOnly, topic, entities, timeRange))
      .toDF("doc_id", "raw_query", "section_role", "synthesis_only",
        "topic", "entities", "time_range")
    QueryFacets.facetsOn(df).collect()
  }

  test("intent: compare beats trend; keyword sets are token-level on the lowered query") {
    assert(facet("alpha VS beta growth").head.getString(1) == "compare",
      "both sets hit → compare wins (dict order in the reference, fixed in graft)")
    assert(facet("beta growth ahead").head.getString(1) == "trend")
    assert(facet("plain words", role = "analysis").head.getString(1) == "investigate")
    assert(facet("plain words").head.getString(1) == "background")
    assert(facet("versatile tools").head.getString(1) == "background",
      "'versus' must match as a TOKEN, not a substring")
  }

  test("synthesis_only sections emit nothing (query_facet.py:97)") {
    assert(facet("anything", synthesisOnly = true).isEmpty)
  }

  test("entities match by lowercase substring, keep brief casing and order") {
    val r = facet("the openai board versus anthropic aligned",
      entities = Seq("Anthropic", "OpenAI Board", "Mistral")).head
    assert(r.getString(3) == "Anthropic | OpenAI Board",
      "multi-word substring matches; absent entity drops; brief order kept" +
        " (scalar ' | '-joined output — the driver gate's shape)")
  }

  test("must_have: significant tokens (len > 2, non-stopword) capped at 3; optional from topic minus must_have") {
    val r = facet("The analytics of spark engine tuning guide",
      topic = "Engine tuning for cloud costs").head
    assert(r.getString(4) == "analytics spark engine",
      "'The'/'of' are stopwords by lowercase; cap at first 3")
    assert(r.getString(5) == "tuning cloud costs",
      "topic tokens minus must_have lowers — 'Engine' excluded case-insensitively")
  }

  test("render: first-wins case-insensitive dedupe, time appended, fallback, word-boundary cap") {
    val r1 = facet("Spark engine data notes",
      entities = Seq("SPARK", "Engine Data"), timeRange = Some("2024-01..2024-03")).head
    // must_have [Spark, engine, data]; SPARK dedupes against Spark
    // (first wins keeps the must-have casing); "Engine Data" is a
    // WHOLE term — its lowercase differs from every single token, so
    // it survives the dedupe; time_range appends last with no check
    assert(r1.getString(7) == "Spark engine data Engine Data 2024-01..2024-03")
    val r2 = facet("to a of in it be").head
    assert(r2.getString(7) == "to a of in it be",
      "nothing significant and no time_range → raw_query fallback")
    val r3 = facet("to a of in it be", timeRange = Some("2023")).head
    assert(r3.getString(7) == "2023", "time_range alone is a non-empty parts list")
    val long = facet("Alpha " + "q" * 118).head // "Alpha qqq…" crosses 120
    assert(long.getString(7) == "Alpha", "cap truncates at the LAST space before 120")
  }

  private def variants(query: String,
                       topic: String = "",
                       entities: Seq[String] = Seq.empty,
                       timeRange: Option[String] = None) = {
    val df: DataFrame = Seq(
      (1L, query, "general", false, topic, entities, timeRange))
      .toDF("doc_id", "raw_query", "section_role", "synthesis_only",
        "topic", "entities", "time_range")
    QueryFacets.variantsOn(df).collect()
      .map(r => (r.getInt(1), r.getString(2), r.getString(3))).sortBy(_._1).toSeq
  }

  test("qv01: primary/broad/narrow generate with contiguous ranks (query_variant.py:17)") {
    // time_range extends the rendered primary, so narrow (must_have
    // only) genuinely differs and all three variants emit
    assert(variants("spark engine tuning", topic = "Cluster Costs",
      entities = Seq("Databend", "Quickwit"), timeRange = Some("2024")) == Seq(
      (1, "spark engine tuning 2024", "primary"),
      (2, "Cluster Costs Databend Quickwit", "broad"),
      (3, "spark engine tuning", "narrow")))
  }

  test("qv01: narrow skips when identical to primary or under 2 terms; broad skips without entities") {
    // no entities, no time → primary == narrow → narrow skipped, no broad
    assert(variants("spark engine tuning", topic = "Cluster Costs") == Seq(
      (1, "spark engine tuning", "primary")))
    // one significant term → narrow needs ≥ 2 (query_variant.py:14)
    assert(variants("spark", topic = "T", entities = Seq("E")) == Seq(
      (1, "spark", "primary"), (2, "T E", "broad")))
    // a matched entity extends primary beyond must_have → narrow
    // differs and emits; broad is the topic-less entity string
    assert(variants("spark engine meets observability stack",
      entities = Seq("Observability")) == Seq(
      (1, "spark engine meets Observability", "primary"),
      (2, "Observability", "broad"),
      (3, "spark engine meets", "narrow")))
  }

  test("qv01: the guaranteed-primary fallback emits raw_query-or-topic") {
    // all-stopword query, no entities, no time → every variant branch
    // fails → fallback (query_variant.py:49)... primary is the
    // raw_query render fallback, so it is non-empty and becomes the
    // one variant; force TRUE emptiness with an empty raw_query
    assert(variants("", topic = "Fallback Topic") == Seq(
      (1, "Fallback Topic", "primary")))
  }

  test("composition exercises every branch at sf0.001") {
    val out = QueryFacets.qf01(spark, "/root/testdata/sf0.001").cache()
    val intents = out.select("intent").distinct().collect().map(_.getString(0)).toSet
    assert(intents == Set("compare", "trend", "investigate", "background"))
    assert(out.filter("length(rendered) = 120 OR (length(rendered) > 100 AND length(rendered) <= 120)").count() > 0,
      "the 120 cap fires")
    assert(out.filter("rendered = raw_query AND must_have = ''").count() > 0,
      "the raw_query fallback fires")
    assert(out.filter("entities = ''").count() >= 0)
    out.unpersist()
  }
}
