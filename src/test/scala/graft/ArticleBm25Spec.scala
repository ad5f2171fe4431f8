package graft

import org.apache.spark.sql.functions._
import graft.operators.ArticleBm25

/** Rule-per-case pins for rag11 (rag-orchestrator
  * strategy_article_scoped.go bm25RerankContexts :159-233 + tokenize
  * :235-272): the substring tf/df, the byte document length, the
  * dual ASCII/CJK tokenizer, the no-match restore path, and the
  * max-normalization.
  */
class ArticleBm25Spec extends SparkSpec {
  import spark.implicits._

  private def run(query: String, chunks: Seq[String]) =
    ArticleBm25.rerankOn(
      Seq((1L, query)).toDF("query_id", "query"),
      chunks.zipWithIndex.map { case (c, i) => (1L, (i + 1).toLong, i + 1, c) }
        .toDF("query_id", "chunk_id", "rank0", "chunk_text"))
      .collect().sortBy(_.getInt(1))

  // layout: query_id, position, chunk_id, score, no_match

  test("substring matching, not token matching (:189/:216): the term " +
       "'ai' scores inside 'maintain'") {
    val out = run("ai systems", Seq("we maintain the registry", "nothing here"))
    assert(out.head.getLong(2) == 1L && out.head.getDouble(3) == 1.0)
    assert(out.head.getInt(4) == 0, "a match happened — not the restore path")
  }

  test("tokenize (:235-272): single ASCII letters drop (>= 2 chars), " +
       "CJK characters are INDIVIDUAL terms, digits break words") {
    // 'a' is dropped -> only 'go' matches; chunk 2 contains 'a' only
    val o1 = run("a go", Seq("let us go now", "a plain text"))
    assert(o1.head.getLong(2) == 1L, "'a' must not be a term")
    // each CJK char is its own term: chunk containing just 処 scores
    val o2 = run("処理", Seq("the 処 symbol", "nothing"))
    assert(o2.head.getLong(2) == 1L && o2.head.getInt(4) == 0)
    // digits split: 'x9y' yields no >=2-letter run
    val o3 = run("x9y", Seq("contains x9y exactly", "other"))
    assert(o3.forall(_.getInt(4) == 1), "no terms -> restore path")
  }

  test("no-match restore (:232-243): all scores become exactly 1.0 and " +
       "the ORIGINAL order is kept (no sort)") {
    val out = run("zzqx", Seq("first chunk", "second chunk", "third chunk"))
    assert(out.forall(r => r.getDouble(3) == 1.0 && r.getInt(4) == 1))
    assert(out.map(r => (r.getInt(1), r.getLong(2))).toSeq ==
      Seq((1, 1L), (2, 2L), (3, 3L)), "positions = original ranks")
  }

  test("normalization (:245-252): the top chunk reads exactly 1.0 and " +
       "higher term density outranks (shorter doc, more occurrences)") {
    val out = run("spark",
      Seq("spark spark spark pipelines", "spark appears once in a longer chunk text", "no match at all"))
    val byPos = out.sortBy(_.getInt(1)).map(r => (r.getLong(2), r.getDouble(3)))
    assert(byPos(0) == (1L, 1.0))
    assert(byPos(1)._1 == 2L && byPos(1)._2 < 1.0 && byPos(1)._2 > 0.0)
    assert(byPos(2) == (3L, 0.0), "df > 0 but tf = 0 scores zero")
  }

  test("idf uses the chunk-count formula ln((n - df + .5)/(df + .5) + 1) " +
       "(:219): a term in EVERY chunk still contributes (idf stays > 0)") {
    val out = run("common", Seq("common alpha", "common beta"))
    assert(out.forall(_.getInt(4) == 0))
    assert(out.exists(_.getDouble(3) == 1.0))
  }

  test("rag11 over the corpus: per-query positions dense, scores in " +
       "[0, 1] with a 1.0 top (or the all-1.0 restore), %9 queries " +
       "take the restore path") {
    val out = ArticleBm25.rag11(spark, sfDir)
    val perQ = out.groupBy("query_id").agg(count(lit(1)).as("n"),
      max("position").as("mx"), max("score").as("top"),
      min("score").as("lo"), max("no_match").as("nm"))
    assert(perQ.filter(col("mx") =!= col("n")).count() == 0)
    assert(perQ.filter(col("top") =!= 1.0 || col("lo") < 0.0).count() == 0)
    assert(perQ.filter(col("nm") === 1).count() ==
      out.select("query_id").distinct().filter(col("query_id") % 9 === 0).count())
  }
}
