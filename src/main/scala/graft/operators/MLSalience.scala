package graft.operators

import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, IDF, RegexTokenizer}
import org.apache.spark.ml.linalg.SparseVector
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** MLlib-based term salience — the extractive-summarization signal.
  *
  * Mirrors the keyword side of the reference's summarization stack
  * (tag-generator's TF-IDF extractors feeding news-creator's
  * summaries): an ML Pipeline RegexTokenizer → CountVectorizer → IDF
  * fit over the corpus, then per-document top-k terms by TF-IDF
  * weight. The raw-SQL variant of the same math is TextOps.tfidfTopK
  * (oracle-checked); this one exercises the MLlib estimator/model path
  * a production pipeline would persist and reuse across batches.
  *
  * The vector unpack runs as a typed map (MLlib vectors are opaque to
  * Catalyst); everything before it is distributed fit/transform.
  */
object MLSalience {

  case class DocTerms(doc_id: Long, terms: Seq[String])

  def salientTerms(corpus: DataFrame, idCol: String, textCol: String,
                   topK: Int = 3, vocabSize: Int = 1 << 12): Dataset[DocTerms] = {
    val tokenizer = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("__tokens").setPattern("\\s+")
    val tokens = tokenizer.transform(corpus)
    val cvModel: CountVectorizerModel = new CountVectorizer()
      .setInputCol("__tokens").setOutputCol("__tf").setVocabSize(vocabSize)
      .fit(tokens)
    val tf = cvModel.transform(tokens)
    val idfModel = new IDF().setInputCol("__tf").setOutputCol("__tfidf").fit(tf)
    val vocab = cvModel.vocabulary
    implicit val enc = Encoders.product[DocTerms]
    idfModel.transform(tf)
      .select(col(idCol).cast("long").as("doc_id"), col("__tfidf"))
      .map { row =>
        val v = row.getAs[SparseVector](1)
        val top = v.indices.zip(v.values)
          .sortBy { case (i, w) => (-w, vocab(i)) }
          .take(topK).map { case (i, _) => vocab(i) }.toSeq
        DocTerms(row.getLong(0), top)
      }
  }
}
