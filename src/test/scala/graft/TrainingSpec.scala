package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Training
import graft.ops.Scoring

class TrainingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fitWeights separates a linearly separable toy sample") {
    val data = (1 to 200).map { i =>
      val pos = i % 2 == 0
      val jac = if (pos) 0.6 + (i % 7) * 0.05 else 0.1 + (i % 7) * 0.03
      (pos, pos && i % 4 == 0, jac, jac * 0.8, jac * 0.9)
    }.toDF("is_match", "strong_overlap", "jaccard_tokens", "lev_first", "jw_first")
    val w = Training.fitWeights(data)
    val acc = data
      .withColumn("score", Scoring.logisticScore(w))
      .withColumn("hit", (col("score") >= 0.5) === col("is_match"))
      .agg(avg(col("hit").cast("double"))).as[Double].head()
    assert(acc >= 0.95, s"accuracy $acc")
  }

  test("trained scorer F1 ≥ fixed-weight F1 on the t1 tier (driver-contract queries)") {
    val dir = "/root/testdata/sf0.001"
    val fixed = SparkEntry.queries("er_f1_sql")(spark, dir)
      .select("f1").as[Double].head()
    val trained = SparkEntry.queries("er_trained_f1")(spark, dir)
      .select("f1").as[Double].head()
    assert(trained >= fixed - 1e-9, s"trained=$trained fixed=$fixed")
  }
}
