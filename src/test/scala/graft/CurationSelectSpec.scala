package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Sampling}

/** The acolyte report-curation selection operators: round-robin fair
  * capping (section interleave order) and the soft language quota
  * (deficit top-up, und-first displacement, slot inheritance).
  */
class CurationSelectSpec extends SparkSpec {
  import spark.implicits._

  test("smp07: interleaves one per section in first-appearance order until the cap") {
    // sections by first appearance: a (pos 1), b (pos 2), c (pos 3);
    // a has 4 items, b has 2, c has 1
    val items = Seq(
      ("a", 1L), ("b", 2L), ("c", 3L), ("a", 4L), ("a", 5L), ("b", 6L), ("a", 7L))
      .map { case (s, p) => (s, p, p * 10) }
      .toDF("section_key", "pos", "payload")
    val out = Sampling.roundRobinCapOn(items, maxTotal = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // round 1: a1, b2, c3; round 2: a4, b6 — a's 3rd/4th items starved OUT
    assert(out.toSet == Set(("a", 1L), ("b", 2L), ("c", 3L), ("a", 4L), ("b", 6L)),
      out.mkString(","))
    // under the cap: untouched passthrough
    assert(Sampling.roundRobinCapOn(items, maxTotal = 10).count() == 7)
  }

  test("pp02: deficit top-up swaps best candidates in for weakest non-protected, und first") {
    // ONE section, K=5 curated slots, required = ceil(5·0.4) = 2 'en'.
    // curated: 1 en + 4 others (one und) → deficit 1... quota 0.4 → need 2.
    val curated = Seq(
      ("s", 1L, "ja", 90.0, 1),
      ("s", 2L, "en", 80.0, 2),
      ("s", 3L, "und", 70.0, 3), // weakest-preference bucket despite mid score
      ("s", 4L, "ja", 10.0, 4),  // lowest score but NOT und → displaced second
      ("s", 5L, "ja", 60.0, 5))
      .toDF("section_key", "id", "language", "score", "slot")
    val pool = curated.select(col("section_key"), col("id"), col("language"),
        col("score"), col("id").as("pos"))
      .union(Seq(
        ("s", 10L, "en", 95.0, 10L), // best candidate → swapped in
        ("s", 11L, "en", 50.0, 11L), // second candidate, not needed
        ("s", 12L, "ja", 99.0, 12L)) // wrong language, ignored
        .toDF("section_key", "id", "language", "score", "pos"))
    val out = Curation.languageQuotaOn(curated, pool, "en", 0.4)
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(out.size == 5, "slot count preserved")
    // deficit = 2 − 1 = 1: candidate 10 replaces the und item (id 3),
    // which loses DESPITE outscoring ja id 4 — und displaces first
    assert(out.contains(10L) && !out.contains(3L))
    assert(out(10L).getBoolean(5), "swapped_in flag")
    assert(out(10L).getInt(4) == 3, "replacement inherits the victim's slot")
    assert(out.contains(4L) && out.contains(5L) && out.contains(1L) && out.contains(2L))
    assert(!out.contains(11L) && !out.contains(12L))
  }

  test("smp08: dynamic cap scales with genre size, round-robin keeps sources fair") {
    // genre g: 40 candidates, 30 from source 'big', 10 from 'small' →
    // dynamic_min = ceil(4) = 4, effective_min = max(3, 4) = 4,
    // adjusted_max = max(12, 8) = 12 — the 12 slots must interleave,
    // not let 'big' take them all
    val rows = (1 to 30).map(i => ("g", i.toLong, "big", 1.0 - i * 0.01)) ++
      (1 to 10).map(i => ("g", 100L + i, "small", 0.5 - i * 0.01)) ++
      // genre h: 200 low-score rows from one source → dynamic_min 20 →
      // adjusted_max = 40 beats the static 12
      (1 to 200).map(i => ("h", 1000L + i, "solo", 0.1))
    val out = Sampling.genreTrimOn(
      rows.toDF("genre", "id", "source", "score"), thresholds = Map("g" -> 3))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val g = out.filter(_._1 == "g")
    assert(g.length == 12)
    assert(g.count(_._3 == "big") == 6 && g.count(_._3 == "small") == 6,
      s"round-robin splits the 12 slots evenly: ${g.mkString(",")}")
    // within each source the best scores go first
    assert(g.filter(_._3 == "big").map(_._2).toSet == (1L to 6L).toSet)
    assert(out.count(_._1 == "h") == 40, "dynamic cap: 2·ceil(200·0.1) = 40 > 12")
  }

  test("pp02: deficit capped by candidate and displaceable availability") {
    // all curated already en → nothing displaceable → no swaps even
    // with a deficit-sized quota
    val curated = Seq(("s", 1L, "en", 1.0, 1), ("s", 2L, "en", 2.0, 2))
      .toDF("section_key", "id", "language", "score", "slot")
    val pool = curated.select(col("section_key"), col("id"), col("language"),
      col("score"), col("id").as("pos"))
    val out = Curation.languageQuotaOn(curated, pool, "en", 1.0).collect()
    assert(out.length == 2 && out.forall(!_.getBoolean(5)))
    // quota language absent from the pool → selection unchanged
    val curated2 = Seq(("s", 1L, "ja", 1.0, 1), ("s", 2L, "ja", 2.0, 2))
      .toDF("section_key", "id", "language", "score", "slot")
    val pool2 = curated2.select(col("section_key"), col("id"), col("language"),
      col("score"), col("id").as("pos"))
    val out2 = Curation.languageQuotaOn(curated2, pool2, "en", 1.0).collect()
    assert(out2.length == 2 && out2.forall(!_.getBoolean(5)))
  }
}
