package graft

import org.apache.spark.sql.functions._
import graft.operators.ContextAllocate

/** Rule-per-case pins for rag10 (rag-orchestrator retrieval/allocate.go
  * :19-167): the dynamic merge/cap path, the legacy per-source quotas
  * with the English-first two-pass fill, the seen-on-add quirk, and
  * the reference's truncated kanji range in IsJapanese.
  */
class ContextAllocateSpec extends SparkSpec {
  import spark.implicits._

  /** (qid, rank, chunk, title, score) per source. */
  private def run(o: Seq[(Long, Int, Long, String, Double)],
                  e: Seq[(Long, Int, Long, String, Double)],
                  qo: Int = 5, qe: Int = 5) =
    ContextAllocate.allocateOn(
      o.toDF("query_id", "rank", "chunk_id", "title", "score"),
      e.toDF("query_id", "rank", "chunk_id", "title", "score"), qo, qe)
      .collect()

  // layout: query_id, path, position, chunk_id, source, is_ja, score
  private def path(rows: Array[org.apache.spark.sql.Row], p: String) =
    rows.filter(_.getString(1) == p).sortBy(_.getLong(2))
      .map(r => (r.getLong(3), r.getString(4)))

  test("dynamic (:53-96): ALL originals + unseen expanded merge, sort " +
       "by score desc, cap at the summed quota; an expanded duplicate " +
       "of ANY original is dropped regardless of its score") {
    val o = Seq((1L, 1, 10L, "t", 0.9), (1L, 2, 11L, "t", 0.5))
    val e = Seq((1L, 1, 10L, "t", 0.99), (1L, 2, 20L, "t", 0.7))
    val dyn = path(run(o, e, qo = 1, qe = 1).toArray, "dynamic")
    // chunk 10 enters as ORIGINAL (score 0.9, not the expanded 0.99);
    // cap = 2 keeps {10, 20}
    assert(dyn.toSeq == Seq((10L, "original"), (20L, "expanded")))
  }

  test("legacy (:98-144): originals in RANK order up to quotaOriginal, " +
       "then expanded non-Japanese first, then Japanese — both in rank " +
       "order (the two passes collapse to ORDER BY (is_ja, rank))") {
    val o = Seq((1L, 1, 10L, "alpha", 0.1), (1L, 2, 11L, "beta", 0.9))
    val e = Seq((1L, 1, 20L, "日本語の記事", 0.9), (1L, 2, 21L, "english", 0.5),
      (1L, 3, 22L, "日本語も", 0.4), (1L, 4, 23L, "more english", 0.3))
    val leg = path(run(o, e, qo = 2, qe = 3).toArray, "legacy")
    assert(leg.toSeq == Seq((10L, "original"), (11L, "original"),
      (21L, "expanded"), (23L, "expanded"), (20L, "expanded")),
      "non-JA 21, 23 precede JA 20; rank order inside each pass")
  }

  test("seen-on-add quirk (:129): an original BEYOND quotaOriginal does " +
       "not block its expanded duplicate — the seen set holds only " +
       "selected items") {
    val o = Seq((1L, 1, 10L, "a", 0.9), (1L, 2, 11L, "b", 0.8))
    val e = Seq((1L, 1, 11L, "b", 0.7), (1L, 2, 20L, "c", 0.6))
    val leg = path(run(o, e, qo = 1, qe = 2).toArray, "legacy")
    assert(leg.toSeq == Seq((10L, "original"), (11L, "expanded"), (20L, "expanded")),
      "chunk 11 missed the original quota and re-enters as expanded")
  }

  test("IsJapanese uses the reference's own kanji END at U+9FAF " +
       "(:160-166): a U+9FB0 character does NOT count as Japanese") {
    val o = Seq((1L, 1, 10L, "x", 0.9))
    val e = Seq((1L, 1, 20L, "龰 block", 0.9), (1L, 2, 21L, "龯 edge", 0.8))
    val rows = run(o, e, qo = 1, qe = 2).toArray
    val ja = rows.filter(_.getString(1) == "legacy")
      .map(r => r.getLong(3) -> r.getInt(5)).toMap
    assert(ja(20L) == 0 && ja(21L) == 1)
    // and pass order honors it: the U+9FB0 title is "English" -> first
    val leg = path(rows, "legacy")
    assert(leg.toSeq.drop(1) == Seq((20L, "expanded"), (21L, "expanded")))
  }

  test("rag10 over the corpus: both paths emit <= 10 rows per query, " +
       "positions dense from 1, dynamic rows sorted by score desc") {
    val out = ContextAllocate.rag10(spark, sfDir)
    val perQ = out.groupBy("query_id", "path").agg(
      count(lit(1)).as("n"), max("position").as("mx"))
    assert(perQ.filter(col("n") > 10 || col("mx") =!= col("n")).count() == 0)
    val dynBad = out.filter(col("path") === "dynamic")
      .withColumn("prev", lag("score", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy("position")))
      .filter(col("prev").isNotNull && col("prev") < col("score"))
    assert(dynBad.count() == 0)
  }
}
