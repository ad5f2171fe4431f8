package graft

import graft.operators.Keywords

/** kw01 keyword matcher: LeftmostLongest substring semantics of the
  * reference's Aho-Corasick configuration (keywords.rs:27-29), weight
  * accumulation per occurrence (:152).
  */
class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  private def scores(text: String): Map[String, (Long, Long)] =
    Keywords.keywordScoresOn(Seq((1L, text)).toDF("doc_id", "kw_text"))
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap

  test("substring matching: 'rapid' contains 'api' — no word boundaries") {
    assert(scores("a rapid move") == Map("tech" -> (2L, 1L)))
  }

  test("ascii case-insensitive: mixed-case phrases score") {
    assert(scores("Artificial Intelligence meets machine LEARNING")
      == Map("ai" -> (10L, 2L)))
  }

  test("every occurrence accumulates its weight") {
    assert(scores("merger then another merger") == Map("business" -> (8L, 2L)))
  }

  test("matches never overlap: the automaton resumes after a match end") {
    // the second 'tournament' shares its opening 't' with the first's
    // final 't' — LeftmostLongest consumes through index 9, so only
    // one match fires; appending a disjoint copy adds the second
    assert(scores("tournamentournament") == Map("sports" -> (3L, 1L)))
    assert(scores("tournamentournament tournament") == Map("sports" -> (6L, 2L)))
  }

  test("adjacent phrases both fire and genres split") {
    assert(scores("ipoapi") == Map("business" -> (3L, 1L), "tech" -> (2L, 1L)))
  }

  test("no dictionary phrase → no row") {
    assert(scores("plain corpus words only").isEmpty)
  }

  test("composed corpus plants every dictionary genre at sf0.001") {
    val out = Keywords.kw01(spark, sfDir)
      .select("genre").distinct().as[String].collect().toSet
    assert(out == Keywords.dictionary.map(_._1).toSet)
  }
}
