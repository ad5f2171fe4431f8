package graft

import org.apache.spark.sql.functions._
import graft.operators.ChunkDiff

/** Rule-per-case pins for rag17 — rag-orchestrator
  * domain/diff_chunks.go (DiffChunks :24-82, computeLCS :85-133,
  * processGap :137-168).
  */
class ChunkDiffSpec extends SparkSpec {
  import spark.implicits._

  private def run(oldH: Seq[String], newH: Seq[String]) =
    ChunkDiff.diff(Seq((1L, oldH, newH)).toDF("doc_id", "old_hashes", "new_hashes"))
      .orderBy("seq").collect()
      .map(r => (r.getString(2),
        if (r.isNullAt(3)) -1 else r.getInt(3),
        if (r.isNullAt(4)) -1 else r.getInt(4))).toSeq

  test("identical lists are all unchanged; appends and pure adds/deletes emit tail gaps without a trailing match (:24-82)") {
    assert(run(Seq("a", "b"), Seq("a", "b")) ==
      Seq(("unchanged", 0, 0), ("unchanged", 1, 1)))
    assert(run(Seq("a"), Seq("a", "b", "c")) ==
      Seq(("unchanged", 0, 0), ("added", -1, 1), ("added", -1, 2)))
    assert(run(Seq("a", "b", "c"), Seq("b")) ==
      Seq(("deleted", 0, -1), ("unchanged", 1, 0), ("deleted", 2, -1)))
    assert(run(Seq.empty, Seq("x")) == Seq(("added", -1, 0)))
    assert(run(Seq("x"), Seq.empty) == Seq(("deleted", 0, -1)))
  }

  test("processGap heuristic: EQUAL-length non-empty gaps pair as updates, unequal gaps emit deletes then adds (:137-168)") {
    assert(run(Seq("a", "b", "c"), Seq("a", "B", "c")) ==
      Seq(("unchanged", 0, 0), ("updated", 1, 1), ("unchanged", 2, 2)))
    // total equal-length rewrite: LCS empty -> ALL updates
    assert(run(Seq("a", "b"), Seq("x", "y")) ==
      Seq(("updated", 0, 0), ("updated", 1, 1)))
    // unequal gap: deletes first, then adds
    assert(run(Seq("a", "b", "c", "d"), Seq("a", "x", "d")) ==
      Seq(("unchanged", 0, 0), ("deleted", 1, -1), ("deleted", 2, -1),
        ("added", -1, 1), ("unchanged", 3, 2)))
    // two-to-three gap
    assert(run(Seq("a", "b", "c", "z"), Seq("a", "p", "q", "r", "z")) ==
      Seq(("unchanged", 0, 0), ("deleted", 1, -1), ("deleted", 2, -1),
        ("added", -1, 1), ("added", -1, 2), ("added", -1, 3),
        ("unchanged", 3, 4)))
  }

  test("backtrace tie moves j-- (dp[i-1][j] > dp[i][j-1] is STRICT): swapped chunks diff as delete/unchanged/add, never the mirror (:114-124)") {
    assert(run(Seq("a", "b"), Seq("b", "a")) ==
      Seq(("deleted", 0, -1), ("unchanged", 1, 0), ("added", -1, 1)))
  }

  test("duplicate hashes resolve through the DP, not first-match greed") {
    // old [a, a], new [a]: LCS 1; backtrace matches the LAST possible
    // pair under the j-- tie rule
    assert(run(Seq("a", "a"), Seq("a")) ==
      Seq(("deleted", 0, -1), ("unchanged", 1, 0)))
  }
}
