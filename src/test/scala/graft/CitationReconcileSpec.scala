package graft

import org.apache.spark.sql.functions._
import graft.operators.CitationReconcile

/** Rule-per-case pins for cb01 — recap-worker pipeline/persist.rs
  * reconcile_bullet_citations (:62-124), url_host (:36-48),
  * is_uuid_shape (:29-31), build_host_to_articles (:127-138).
  */
class CitationReconcileSpec extends SparkSpec {
  import spark.implicits._

  private def refs(rows: (String, Long, String, String)*) =
    rows.toDF("group", "ref_n", "article_id", "url")
  private def bullets(rows: (String, Int, String)*) =
    rows.toDF("group", "bullet_ord", "text")
  private def urlMap(rows: (String, String, String)*) =
    rows.toDF("group", "url", "map_aid")
  private def sentences(rows: (String, Long)*) =
    rows.toDF("map_aid", "sentence_id")

  private val U1 = "00000000-0000-4000-8000-000000000001"
  private val U2 = "00000000-0000-4000-8000-000000000002"

  private def run(b: org.apache.spark.sql.DataFrame,
                  r: org.apache.spark.sql.DataFrame,
                  u: org.apache.spark.sql.DataFrame,
                  s: org.apache.spark.sql.DataFrame) =
    CitationReconcile.reconcile(b, r, u, s)
      .orderBy("source", "bullet_ord", "seq")
      .collect().map(x => (x.getString(0), x.getInt(1), x.getInt(2), x.getLong(3)))

  test("marker parse: leading zeros, out-of-range skip, non-ANSI overflow skip (persist.rs:79-84)") {
    val r = refs(("g", 1L, U1, "https://a.test/1"))
    val b = bullets(
      // [01] parses to 1 like usize::from_str; [0]/[2]/huge are
      // out-of-range or Err -> skipped; [x] never matches the regex
      ("g", 1, "see [01] not [0] nor [2] nor [99999999999999999999999] nor [x]"))
    val u = urlMap(("g", "https://other.test/none", "zz"))
    val s = sentences((U1, 11L), (U1, 10L))
    assert(run(b, r, u, s).toSeq ==
      Seq(("g", 1, 1, 10L), ("g", 1, 2, 11L)))
  }

  test("refs-empty short-circuit: markers resolve to nothing without references (persist.rs:73-75)") {
    val r = refs(("other", 1L, U1, "https://a.test/1"))
    val b = bullets(("g", 1, "cites [1] anyway"))
    val s = sentences((U1, 10L))
    assert(run(b, r, urlMap(("g", "https://a.test/1", U1)), s).isEmpty)
  }

  test("uuid shape gate admits all four Uuid::parse_str forms and rejects domain strings (:29-31, :88-93)") {
    val forms = Seq(
      U1 -> true,
      "00000000000040008000000000000001" -> true, // simple
      s"urn:uuid:$U1" -> true,
      s"{$U1}" -> true,
      "dev.to" -> false, // the production LLM artifact the gate exists for
      "not-a-uuid" -> false,
      "00000000-0000-4000-8000-00000000000g" -> false) // non-hex
    forms.zipWithIndex.foreach { case ((aid, ok), i) =>
      val r = refs((s"g$i", 1L, aid, "https://nowhere.test/x"))
      val b = bullets((s"g$i", 1, "[1]"))
      val s2 = sentences((aid, 7L))
      val got = run(b, r, urlMap((s"g$i", "https://unused.test/u", "zz")), s2)
      assert(got.nonEmpty == ok, s"$aid admitted=${got.nonEmpty}, want $ok")
    }
  }

  test("url_host: scheme strip is single and case-sensitive, first-slash cut, www strip, lowercase, empty -> null (:36-48)") {
    val cases = Seq(
      "  https://www.Example.COM/path/x " -> "example.com",
      "http://x.y/p" -> "x.y",
      "dev.to" -> "dev.to", // pure domain is its own host
      "www.a.b" -> "a.b",
      "https://http://x" -> "http:", // only ONE scheme strips — pinned
      "https://" -> null)
    val df = cases.map(_._1).toDF("u")
      .select(CitationReconcile.urlHost(col("u")).as("h"))
    assert(df.collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq ==
      cases.map(_._2))
  }

  test("three paths merge as a set union; host path runs for every ref (:88-107)") {
    // ref 1: uuid U1 + exact url of U2 + host shared with U1 and U2 ->
    // one marker resolves BOTH articles through three different paths
    val r = refs(("g", 1L, U1, "https://www.h.test/2"))
    val b = bullets(("g", 1, "[1]"))
    val u = urlMap(
      ("g", "https://www.h.test/1", U1),
      ("g", "https://www.h.test/2", U2))
    val s = sentences((U1, 10L), (U2, 20L))
    assert(run(b, r, u, s).toSeq ==
      Seq(("g", 1, 1, 10L), ("g", 1, 2, 20L)))
  }

  test("sentence union is deduplicated ascending across overlapping markers (BTreeSet, :118-124)") {
    // markers [1] and [2] both resolve U1; U1's ids appear once, sorted
    val r = refs(
      ("g", 1L, U1, "https://nowhere.test/a"),
      ("g", 2L, null, "h.test"))
    val b = bullets(("g", 1, "[1][2]"))
    val u = urlMap(("g", "https://h.test/1", U1))
    val s = sentences((U1, 30L), (U1, 10L), (U1, 20L))
    assert(run(b, r, u, s).toSeq ==
      Seq(("g", 1, 1, 10L), ("g", 1, 2, 20L), ("g", 1, 3, 30L)))
  }

  test("unresolvable markers are skipped, not zero-scored (:109-116)") {
    val r = refs(
      ("g", 1L, "dev.to", "https://miss.test/1"), // non-uuid + no url/host match
      ("g", 2L, U1, "https://nowhere.test/b"))
    val b = bullets(("g", 1, "[1] [2]"))
    val u = urlMap(("g", "https://elsewhere.test/9", U2))
    val s = sentences((U1, 5L), (U2, 6L))
    // marker 1 contributes nothing; marker 2 resolves via path 1 only
    assert(run(b, r, u, s).toSeq == Seq(("g", 1, 1, 5L)))
  }
}
