package graft

import graft.operators.MLSalience

class MLSalienceSpec extends SparkSpec {
  import spark.implicits._

  test("MLlib TF-IDF pipeline surfaces distinctive terms per doc") {
    val corpus = Seq(
      (1L, "common words plus zebra zebra zebra zebra"),
      (2L, "common words plus quartz quartz quartz quartz"),
      (3L, "common words plus nothing distinctive here at all")
    ).toDF("doc_id", "text")
    val terms = MLSalience.salientTerms(corpus, "doc_id", "text", topK = 2)
      .collect().map(d => d.doc_id -> d.terms).toMap
    assert(terms(1L).contains("zebra"), terms.toString)
    assert(terms(2L).contains("quartz"), terms.toString)
    assert(!terms(3L).contains("zebra") && !terms(3L).contains("quartz"))
  }

  test("rag01 context assembly: 3 chunks per query, rank-ordered") {
    val r = graft.operators.Rag.contextAssembly(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_ctx_docs") == 3L)
      assert(row.getAs[String]("context").split(" \\| ").length == 3)
    }
  }
}
