package graft

import org.apache.spark.sql.functions._
import graft.operators.HashDedup

/** Rule-per-case pins for hd01/hd02 (recap-worker pipeline/dedup.rs
  * HashDedupStage :113-456): the sampled-window signature quirks, the
  * exact multiset-Dice 0.8 boundary, the greedy-vs-CC distinction,
  * the published_at-DESC/None-oldest keep order, and the exact fast
  * path's attribution preference.
  */
class HashDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Option[Long], String)]) =
    HashDedup.verdictsOn(
      rows.toDF("doc_id", "epoch", "body")
        .select(col("doc_id"), timestamp_seconds(col("epoch")).as("published_at"), col("body")))
      .collect().map(r => r.getLong(0) -> r).toMap

  private lazy val corpus =
    HashDedup.verdictsOn(HashDedup.composeArticles(spark, sfDir))
      .collect().map(r => r.getLong(0) -> r).toMap

  // row layout: doc_id, published_at, kept, reason, keeper_id, sim,
  //             n_duplicates, n_sentences, n_unique_sentences, n_dup_sentences
  private def kept(r: org.apache.spark.sql.Row) = r.getBoolean(2)
  private def reason(r: org.apache.spark.sql.Row) = r.getString(3)
  private def keeper(r: org.apache.spark.sql.Row) = r.getLong(4)
  private def sim(r: org.apache.spark.sql.Row) = r.getDouble(5)

  test("exact duplicates drop onto the NEWEST copy (published_at desc, " +
       "the reference's sort_by_key(Reverse(...)))") {
    val body = "Exact body for the keep-order pin. " * 5 // >= 100 bytes
    val out = run(Seq((1L, Some(1000L), body), (2L, Some(2000L), body),
      (3L, Some(1500L), body)))
    assert(kept(out(2L)) && !kept(out(1L)) && !kept(out(3L)))
    assert(reason(out(1L)) == "exact_duplicate" && keeper(out(1L)) == 2L)
    assert(keeper(out(3L)) == 2L && sim(out(3L)) == 1.0)
  }

  test("greedy != connected-components: the planted A~B, B~C, A!~C chain " +
       "keeps BOTH ends (B's drop removes it from the index)") {
    assert(kept(corpus(41L)), "A (newest) kept")
    assert(!kept(corpus(42L)) && keeper(corpus(42L)) == 41L &&
      sim(corpus(42L)) == 0.804688, "B drops onto A at Dice 412/512")
    assert(kept(corpus(43L)),
      "C is kept: its only >=0.8 neighbor B was dropped and left the index " +
      "(CC-keep-min would have collapsed the whole chain onto A)")
    assert(corpus(41L).getLong(6) == 1L, "A's duplicates list = {B}")
  }

  test("the Dice 0.8 boundary is exact: 160/200 drops (gate is >=), 158/200 keeps") {
    assert(kept(corpus(44L)) && !kept(corpus(45L)))
    assert(sim(corpus(45L)) == 0.8 && keeper(corpus(45L)) == 44L &&
      reason(corpus(45L)) == "near_duplicate")
    assert(kept(corpus(46L)) && kept(corpus(47L)),
      "179-vs-178 shared chars: one char below the boundary survives")
  }

  test("None published_at sorts OLDEST: the dated copy wins even when " +
       "second in corpus order (dedup.rs:517's own pin)") {
    assert(kept(corpus(37L)) && !kept(corpus(36L)))
    assert(reason(corpus(36L)) == "exact_duplicate" && keeper(corpus(36L)) == 37L)
  }

  test("equal timestamps tie-break by corpus order (the Rust sort is stable)") {
    assert(kept(corpus(48L)) && !kept(corpus(49L)) && keeper(corpus(49L)) == 48L)
  }

  test("byte-vs-char window quirk: >=100 BYTES but <100 CHARS yields zero " +
       "windows -> primary-hash fallback; equal CJK bodies dedup, near-equal " +
       "ones are INVISIBLE to the stage") {
    // the composed pair: equal bodies, fallback signature, Dice 2/2
    assert(kept(corpus(38L)) && !kept(corpus(39L)) && sim(corpus(39L)) == 1.0)
    // near-identical long CJK bodies (one char differs): each signature
    // collapses to its own primary hash -> no shared key -> no candidate
    // -> both kept. The reference behaves identically (:374-377).
    val cjk = HashDedup.CjkBody
    val out = run(Seq((1L, Some(2000L), cjk + "異"), (2L, Some(1000L), cjk + "同")))
    assert(kept(out(1L)) && kept(out(2L)),
      "99%-similar sub-100-char CJK bodies never become candidates")
  }

  test("short-byte path (<100 bytes): whole body hashes as the single window") {
    val out = run(Seq(
      (1L, Some(3000L), "tiny shared body"), (2L, Some(2000L), "tiny shared body"),
      (3L, Some(1000L), "tiny other body")))
    assert(kept(out(1L)) && !kept(out(2L)) && kept(out(3L)))
    assert(reason(out(2L)) == "exact_duplicate" && sim(out(2L)) == 1.0)
  }

  test("step sampling + the 256 cap: the near class (W=513 -> step 2, 256 " +
       "samples) lands at Dice 500/512 with the digits-only prefix differing") {
    // members of %29==2 share 250 of 256 step-2-sampled windows; the
    // 0.976563 value pins BOTH the integer step (513 div 256 = 2) and
    // the cap (denominator 512) — any off-by-one in the sampler moves it
    val near = corpus.collect {
      case (id, r) if id % 29 == 2 && id != 41 && id != 43 && !kept(r) => r
    }
    assert(near.nonEmpty)
    // 250 shared base windows always; straddling window j=10 (the only
    // straddler NOT covering all three digit positions) also matches
    // when the last digits coincide -> inter \in {250, 251}
    assert(near.forall(r => Set(0.976563, 0.980469).contains(sim(r)) &&
      reason(r) == "near_duplicate"))
  }

  test("below-threshold candidates survive: the SharedHalf prefix alone " +
       "(Dice 402/512 = 0.785) never drops a class member") {
    val cls = corpus.collect { case (id, r) if id % 29 == 3 &&
      !Set(36L, 37L, 38L, 39L, 41L, 42L, 43L, 44L, 45L, 46L, 47L, 48L, 49L).contains(id) => r }
    assert(cls.count(kept) >= cls.size - 2,
      "essentially all kept — prefix-only overlap stays below the gate")
    assert(kept(corpus(3L)) && kept(corpus(32L)), "unrelated-text members survive")
    // the testdata generator plants its own near-dup TEXT families; a
    // class member whose text near-matches another member's may drop —
    // but only with shared content BEYOND the planted prefix
    assert(cls.filter(r => !kept(r)).forall(r => sim(r) > 0.785),
      "any drop must come from text-window overlap, not the prefix")
  }

  test("exact fast path reads KEEPERS only: a dropped body-equal sibling " +
       "does not attract attribution (exact_hashes holds kept articles)") {
    val base = "Attribution preference body segment one two three four five six. " * 3
    // k1 (newest) is a near variant of base; k2 = base drops onto k1
    // (Dice 198/208 = 0.952); d = base then faces the INDEX, which
    // holds only k1 — so d attributes to k1 as a NEAR duplicate even
    // though a byte-identical (dropped) sibling k2 exists. Mirrors
    // :126's exact_hashes lookup, which is populated on keep only.
    val out = run(Seq(
      (1L, Some(3000L), "prefix " + base), (2L, Some(2000L), base),
      (3L, Some(1000L), base)))
    assert(kept(out(1L)) && !kept(out(2L)) && !kept(out(3L)))
    assert(reason(out(2L)) == "near_duplicate" && keeper(out(2L)) == 1L)
    assert(reason(out(3L)) == "near_duplicate" && keeper(out(3L)) == 1L,
      "d must NOT report exact_duplicate: its body-equal sibling is not a keeper")
    assert(sim(out(2L)) == sim(out(3L)), "identical signatures, identical Dice vs k1")
  }

  test("sentence half: marker split + first-occurrence dedup on the kept " +
       "exact-class representative (4 sentences, 1 repeated)") {
    val keepers = corpus.collect { case (id, r) if id % 29 == 1 &&
      !Set(36L, 37L, 38L, 39L, 41L, 42L, 43L, 44L, 45L, 46L, 47L, 48L, 49L).contains(id) && kept(r) => r }
    assert(keepers.size == 1, "one keeper per exact-dup group")
    val k = keepers.head
    assert(k.getLong(7) == 4 && k.getLong(8) == 3 && k.getLong(9) == 1)
    // dropped rows carry NO sentence stats (the reference runs
    // sentence dedup on survivors only)
    val dropped = corpus.values.filter(r => !kept(r))
    assert(dropped.nonEmpty && dropped.forall(r => r.isNullAt(7) && r.isNullAt(8)))
  }

  test("hd02 DedupStats reconciles with the hd01 frame") {
    val st = HashDedup.hd02(spark, sfDir).collect().head
    val total = corpus.size
    val uniq = corpus.values.count(kept)
    assert(st.getLong(0) == total && st.getLong(1) == uniq &&
      st.getLong(2) == total - uniq)
    assert(st.getLong(3) == st.getLong(4) + st.getLong(5),
      "total = unique + duplicate sentences")
  }

  test("the driver greedy walk and the distributed per-component fold " +
       "produce identical verdicts (the CC adaptive-path discipline)") {
    val arts = HashDedup.composeArticles(spark, sfDir)
    val dist = HashDedup.verdictsOn(arts, greedySmallMax = 0L)
      .collect().map(r => (r.getLong(0), r.toSeq.drop(2))).toMap
    val local = corpus.map { case (id, r) => (id, r.toSeq.drop(2)) }
    assert(dist == local, "both greedy paths must agree row for row")
  }

  test("enforced premise: the composed corpus never exercises UAX-29's " +
       "lowercase-suppression case (SB8) — every sentence terminator is " +
       "followed by whitespace + non-lowercase, so the marker split equals " +
       "the reference's unicode_sentences on this corpus") {
    val arts = HashDedup.composeArticles(spark, sfDir)
    assert(arts.filter(col("body").rlike("[.!?。]\\s+[a-z]")).count() == 0,
      "a terminator followed by whitespace+lowercase would make the marker " +
      "split break where UAX-29 does not — the premise the scaladoc pins")
    assert(arts.filter(col("body").rlike("[.!?。]\\s")).count() > 0,
      "terminators must be present so the split is actually exercised " +
      "(word-salad rows carry none; the composed literals do)")
  }

  test("pre-1970 timestamps still beat undated: a negative epoch sorts " +
       "NEWER than null published_at (dedup.rs:273 unwrap_or(MIN_UTC) for " +
       "arbitrary verdictsOn inputs, not just the post-1970 corpus)") {
    val body = "Pre nineteen seventy ordering pin body text segment. " * 3
    val out = run(Seq((1L, Some(-100000L), body), (2L, None, body)))
    assert(kept(out(1L)) && !kept(out(2L)),
      "the dated 1969 copy must keep; the old null sentinel (-1) inverted this")
    assert(keeper(out(2L)) == 1L && reason(out(2L)) == "exact_duplicate")
  }

  test("exact classes are linear: E body-equal articles contribute ONE " +
       "representative to the window-key join (the reference's exact fast " +
       "path — duplicates never enter the inverted index)") {
    import spark.implicits._
    val body = "Exact class linearity pin shared body for every member row. " * 3
    val arts = (1L to 30L).map(i => (i, Some(1000L + i), body))
      .toDF("doc_id", "epoch", "body")
      .select(col("doc_id"), timestamp_seconds(col("epoch")).as("published_at"), col("body"))
    val (multi, extras) = HashDedup.exactGroups(arts)
    assert(multi.count() == 1 && extras.count() == 29)
    // the representative-only signature index yields ZERO candidate
    // pairs — where the naive all-members join would pay C(30,2)=435
    val sig = HashDedup.signatures(
      arts.join(extras.select("doc_id"), Seq("doc_id"), "left_anti"), 100, 256)
    assert(HashDedup.candidatePairs(HashDedup.invertedIndex(sig)).count() == 0)
    // and the verdicts match the reference: newest keeps, 29 exact dups
    val out = HashDedup.verdictsOn(arts).collect().map(r => r.getLong(0) -> r).toMap
    assert(kept(out(30L)) && out(30L).getLong(6) == 29L)
    assert((1L to 29L).forall(i => !kept(out(i)) &&
      reason(out(i)) == "exact_duplicate" && keeper(out(i)) == 30L && sim(out(i)) == 1.0))
  }

  test("hot-window-key pin: a boilerplate key shared by d DISTINCT bodies " +
       "yields Θ(d²) candidate pairs (the reference's in-RAM index has the " +
       "same blowup — dedup.rs:144-149 caps nothing); the documented " +
       "hotKeyDfCap drops hot keys from candidate generation, a pinned " +
       "semantics divergence that stays OFF by default") {
    import spark.implicits._
    // 150-char boilerplate prefix + per-doc unique tail: bodies are
    // ~300 chars -> W <= 256 windows, step 1, ALL windows sampled; the
    // 51 windows fully inside the boilerplate are content-identical
    // across docs, every other window contains the doc number
    val boiler = ("Boilerplate navigation header block shared verbatim by " +
      "every syndicated page of the corpus in this pin. " * 2).take(150)
    require(boiler.length == 150)
    // tails are one DISTINCT letter repeated, so no tail or straddle
    // window is ever shared across docs (a numbered tail would leak
    // shared digit-prefix windows past the cap)
    def mk(n: Int) = (1 to n).map { i =>
      (i.toLong, Some(1000L + i), boiler + (('a' + i).toChar.toString * 150))
    }.toDF("doc_id", "epoch", "body")
      .select(col("doc_id"), timestamp_seconds(col("epoch")).as("published_at"), col("body"))
    def pairCount(n: Int, cap: Option[Long]) =
      HashDedup.candidatePairs(
        HashDedup.invertedIndex(HashDedup.signatures(mk(n), 100, 256)), cap).count()
    // quadratic growth, pinned exactly: every pair shares the 51
    // boilerplate-interior keys -> all C(d,2) pairs materialize
    assert(pairCount(12, None) == 66L && pairCount(24, None) == 276L,
      "C(12,2)=66 and C(24,2)=276 — doubling d quadruples the pair residue")
    // the df-cap kills the hot keys (df=24 > 20) and with them every
    // pair: tails are unique, straddling windows are per-doc
    assert(pairCount(24, Some(20L)) == 0L)
    // a cap above every key's df is a no-op on verdicts
    val base = HashDedup.verdictsOn(mk(24)).collect().map(_.toSeq)
    val capped = HashDedup.verdictsOn(mk(24), hotKeyDfCap = Some(1000L)).collect().map(_.toSeq)
    assert(base.toSeq == capped.toSeq)
  }

  test("plan: the verdict residue broadcasts back onto the corpus and the " +
       "candidate join is a banded equi-join (no cartesian)") {
    val f = HashDedup.hd01(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(f.contains("BroadcastHashJoin"), "bounded verdict frame must broadcast")
    assert(!f.contains("CartesianProduct"), "candidates come from the window-key equi-join")
  }
}
