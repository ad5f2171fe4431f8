package graft.operators

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions
import graft.functions.Numeric.microRound

/** MLlib document classifier — distilling a rule gate into a trained
  * model.
  *
  * Mirrors the migration the reference's extractor stack took
  * (tag-generator grew ML/ONNX extractors next to its rule lists):
  * fit a VectorAssembler → LogisticRegression Pipeline to reproduce
  * the tx04 quality gate from the gate's raw signals, then verify it
  * matches the rule on held-out docs. The point is the ESTIMATOR
  * path — fit distributes over the corpus, the fitted model is a
  * broadcastable transformer a production pipeline persists and
  * reuses across batches, and scoring is one scan — with a spec that
  * actually has ground truth (the synthetic corpus's lang label is
  * random wrt its text, so a "real" classification target would just
  * measure noise).
  */
object MLClassifier {

  /** Feature frame: label = the rule gate's verdict, features = the
    * gate's raw inputs (token count, stopword ratio) — a few
    * coefficients, not a vocab matrix.
    */
  private def features(docs: DataFrame): DataFrame = {
    val nTokens = greatest(TextFunctions.tokenCount(col("text")), lit(1)).cast("double")
    docs.select(
      col("doc_id"),
      (TextFunctions.qualityScore(col("text"), TextOps.stopwords) >= 0.5)
        .cast("double").as("label"),
      TextFunctions.tokenCount(col("text")).cast("double").as("f_tokens"),
      (TextFunctions.tokenCountIn(col("text"), TextOps.stopwords) / nTokens).as("f_stop_ratio"))
  }

  /** Fit on hash-split train rows, score the rest; returns per-doc
    * (doc_id, label, prediction, probability of English).
    */
  def fitAndScore(s: SparkSession, dir: String): DataFrame = {
    val f = features(Tables.documents(s, dir))
      .withColumn("is_train", col("doc_id") % 5 =!= 0)
    val assembler = new VectorAssembler()
      .setInputCols(Array("f_tokens", "f_stop_ratio"))
      .setOutputCol("features")
    val lr = new LogisticRegression()
      .setMaxIter(25).setRegParam(0.01).setLabelCol("label").setFeaturesCol("features")
    val model = new Pipeline().setStages(Array(assembler, lr))
      .fit(f.filter(col("is_train")))
    model.transform(f.filter(!col("is_train")))
      .select(col("doc_id"), col("label"), col("prediction"),
              (microRound(element_at(vector_to_array(col("probability")), 2), 4)).as("p_pass"))
  }

  /** ml03: stratified k-fold cross-validation of the distilled
    * classifier — the reference evaluator's `_run_cross_validation`
    * (recap-subworker/recap_subworker/services/evaluation.py:532
    * retrains the production Embed+TFIDF→LogisticRegression pipeline
    * on every fold rather than scoring one split; a single held-out
    * number can be a lucky split, the fold spread is the stability
    * evidence). Folds are deterministic and stratified the
    * distributed way: a row_number within each label class modulo k —
    * every fold sees the label ratio of the whole corpus, and the
    * assignment is retry-stable (no rand()). Per fold the model
    * trains on the other k−1 folds (the full estimator path
    * distributes) and scores its own; output is one row per fold
    * (acc_min echoes the fold's own accuracy) plus a fold = -1
    * rollup whose accuracy is the mean and whose acc_min is the
    * WORST fold — the number the stability claim actually rests on.
    */
  def crossValidate(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byLabel = Window.partitionBy("label").orderBy("doc_id")
    val f = features(Tables.documents(s, dir))
      .withColumn("fold", (row_number().over(byLabel) % k).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val assembler = new VectorAssembler()
      .setInputCols(Array("f_tokens", "f_stop_ratio"))
      .setOutputCol("features")
    val lr = new LogisticRegression()
      .setMaxIter(25).setRegParam(0.01).setLabelCol("label").setFeaturesCol("features")
    val pipe = new Pipeline().setStages(Array(assembler, lr))
    val perFold = (0 until k).map { fold =>
      val model = pipe.fit(f.filter(col("fold") =!= fold))
      model.transform(f.filter(col("fold") === fold))
        .agg(
          lit(fold).as("fold"),
          count(lit(1)).as("n_test"),
          graft.functions.Numeric.microRatio(
            count(when(col("label") === col("prediction"), 1)), count(lit(1)), 4)
            .as("accuracy"))
        .withColumn("acc_min", col("accuracy"))
    }.reduce(_ unionByName _).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rollup = perFold.agg(
      lit(-1).as("fold"), sum("n_test").as("n_test"),
      (round(avg(col("accuracy") * 1e4), 0).cast("long") / 1e4).as("accuracy"),
      min("acc_min").as("acc_min"))
    val out = perFold.unionByName(rollup).orderBy("fold")
    val rows = out.collect()
    perFold.unpersist(); f.unpersist()
    s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** ml02 adapter: held-out agreement with the rule gate. */
  def ml02(s: SparkSession, dir: String): DataFrame =
    fitAndScore(s, dir)
      .agg(
        count(lit(1)).as("n_scored"),
        graft.functions.Numeric.microRatio(
          count(when(col("label") === col("prediction"), 1)), count(lit(1)), 4).as("accuracy"),
        (round(sum(round(col("p_pass") * 1e4, 0).cast("long")) * 1.0 / count(lit(1)), 0).cast("long") / 1e4).as("mean_p_pass"))
}
