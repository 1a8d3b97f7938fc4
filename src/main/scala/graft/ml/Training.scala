package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Scoring

/** M3 training side (SURVEY.md §2.9): fit the logistic match function on
  * a balanced labeled-pair sample (reference:
  * entityresolution.py::LogisticMatchFunction.train [PK-med, SURVEY.md
  * §0]). The fitted weights feed the existing closed-form column scorer
  * (`Scoring.logisticScore`) so INFERENCE stays a pure codegen
  * expression — `spark.ml` appears only in this offline side job, never
  * on the scoring hot path.
  *
  * Feature order matches Scoring.LogisticWeights:
  * [strong_overlap, jaccard_tokens, lev_first, jw_first].
  */
object Training {

  /** Fit on labeled pair features (Scoring.pairFeatures output joined
    * with an `is_match` truth column). Returns weights for
    * `Scoring.logisticScore`.
    */
  def fitWeights(labeledFeatures: DataFrame,
      maxIter: Int = 50, regParam: Double = 1e-4): Scoring.LogisticWeights = {
    val data = labeledFeatures.select(
      col("is_match").cast("double").as("label"),
      col("strong_overlap").cast("double").as("f_strong"),
      col("jaccard_tokens").cast("double").as("f_jaccard"),
      col("lev_first").cast("double").as("f_lev"),
      col("jw_first").cast("double").as("f_jw"))
    val assembled = new VectorAssembler()
      .setInputCols(Array("f_strong", "f_jaccard", "f_lev", "f_jw"))
      .setOutputCol("features")
      .transform(data)
      // The balanced sample is small by construction (Sampling caps it),
      // but it inherits the upstream scored-universe partitioning — so
      // every LBFGS iteration becomes a 32-task treeAggregate job whose
      // cost is pure scheduling overhead, ~50 jobs per fit. One partition
      // makes each iteration a single small task; gradient sums are
      // order-insensitive at fp-rounding level and the spec gate
      // (trained F1 >= fixed-weight F1) is unaffected. repartition, NOT
      // coalesce: coalesce(1) would propagate upstream and single-thread
      // the whole sample-derivation stage (same trap Verify's writes
      // avoid); the shuffle barrier keeps upstream at full parallelism.
      // Isolated A/B at sf0.1 in the same tenancy window: 339 s with
      // this vs 351 s without — i.e. no regression (both numbers are
      // ~90% host-starvation stall; healthy-window runs of the query are
      // 25-59 s).
      .repartition(1)
    val model = new LogisticRegression()
      .setMaxIter(maxIter)
      .setRegParam(regParam)   // small L2: the planted sample is separable
      .setStandardization(false)
      .fit(assembled)
    val c = model.coefficients
    Scoring.LogisticWeights(
      bias = model.intercept,
      strong = c(0), jaccard = c(1), lev = c(2), jw = c(3))
  }
}
