package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions.{jaccard, tokens}

/** RAG retrieval + context assembly.
  *
  * Mirrors knowledge-augur's "Ask Augur" flow: ground a question in
  * cosine top-k article embeddings, then assemble the retrieved
  * article snippets into an ordered context block for the generator
  * (knowledge-augur + knowledge-embedder services). Retrieval is
  * Similarity.knnBruteOn (broadcast query set, codegen'd cosine);
  * assembly is a rank-ordered aggregation — deterministic, so the
  * DuckDB oracle reproduces it with string_agg ORDER BY.
  */
object Rag {

  /** rag01: for each query vector, top-3 neighbors joined to their
    * document snippets, assembled rank-ordered into one context string.
    */
  def contextAssembly(s: SparkSession, dir: String): DataFrame = {
    val hits = Similarity.knnBruteOn(
      Tables.embeddings(s, dir), col("vec_id") % 100 === 0, k = 3)
    val snippets = Tables.documents(s, dir)
      .select(col("doc_id").as("neighbor_id"), substring(col("text"), 1, 30).as("chunk"))
    hits.join(snippets, "neighbor_id")
      .groupBy("query_id")
      .agg(
        count(lit(1)).as("n_ctx_docs"),
        max("cos").as("top_score"),
        array_join(
          transform(array_sort(collect_list(struct(col("rank"), col("chunk")))),
            p => p.getField("chunk")),
          " | ").as("context"))
  }

  /** rag02: retrieve → rerank → select, mirroring the reference's
    * two-stage flow (rag-orchestrator retrieves top-k by embedding
    * cosine, rerank-server re-scores each (query, candidate) pair with
    * a cross-encoder — rerank-server/rerank_server.py:37). The Spark
    * re-scorer is feature-based: the candidate's retrieval cosine
    * blended with query↔candidate token-set Jaccard
    * (0.7·cos + 0.3·lex), which is the standard model-free stand-in —
    * the plan shape (wide cheap retrieve, narrow expensive re-score on
    * k·|queries| rows only, re-rank window per query) is exactly what a
    * model-backed scorer plugs into. Oracle-checked end to end.
    */
  def rerankedRetrieval(s: SparkSession, dir: String): DataFrame = {
    val hits = Similarity.knnBruteOn(
      Tables.embeddings(s, dir), col("vec_id") % 100 === 0, k = 10)
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), array_distinct(tokens(col("text"))).as("toks"))
    // candidates are |queries|·k rows — keep them the broadcast side of
    // both joins against the (large) document table
    val withQuery = toks.select(col("doc_id").as("query_id"), col("toks").as("q_toks"))
      .join(broadcast(hits), "query_id")
    val enriched = toks.select(col("doc_id").as("neighbor_id"), col("toks").as("c_toks"))
      .join(broadcast(withQuery), "neighbor_id")
      .withColumn("lex", round(jaccard(col("q_toks"), col("c_toks")), 6))
      .withColumn("rerank_score", round(lit(0.7) * col("cos") + lit(0.3) * col("lex"), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rerank_score").desc, col("neighbor_id").asc)
    enriched.withColumn("rerank", row_number().over(w))
      .filter(col("rerank") <= 3)
      .select("query_id", "neighbor_id", "cos", "lex", "rerank_score", "rerank")
  }
}
