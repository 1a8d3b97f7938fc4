package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Blocking, Collapse, Features, Pairs, Scoring}
import graft.gen.TranscriptGen

class ScoringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val recs = Features.enrich(Collapse.collapse(
    TranscriptGen.transcripts(spark, 40).toDF()))

  private lazy val scored = Scoring.score(
    Pairs.hydrate(Pairs.candidatePairs(Blocking.allBlocks(recs)), recs))

  test("pair features are in range and symmetric-safe (a<b)") {
    val rows = scored.select("a_id", "b_id", "jaccard_tokens", "lev_first", "jw_first")
      .as[(String, String, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, j, l, w) =>
      assert(a < b)
      assert(j >= 0.0 && j <= 1.0)
      assert(l >= 0.0 && l <= 1.0)
      assert(w >= 0.0 && w <= 1.0)
    }
  }

  test("same-entity pairs score as matches; cross-entity pairs don't") {
    val withTruth = scored
      .withColumn("a_e", split(col("a_id"), "_").getItem(0))
      .withColumn("b_e", split(col("b_id"), "_").getItem(0))
      .withColumn("same", col("a_e") === col("b_e"))
    val confusion = withTruth.groupBy("same", "is_match").count()
      .as[(Boolean, Boolean, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // no false positives at this scale; few-to-no false negatives
    assert(confusion.getOrElse((false, true), 0L) == 0L)
    val tp = confusion.getOrElse((true, true), 0L)
    val fn = confusion.getOrElse((true, false), 0L)
    assert(tp > 0 && fn <= tp / 10, s"tp=$tp fn=$fn")
  }

  test("match rules: strong / weak / weak_strong / exact relationships") {
    val f = Scoring.pairFeatures(
      Pairs.hydrate(Pairs.candidatePairs(Blocking.allBlocks(recs)), recs))
    val counts = Seq("strong", "weak", "weak_strong", "exact").map { mt =>
      mt -> f.filter(Scoring.matchRule(mt)).count()
    }.toMap
    assert(counts("weak_strong") >= counts("strong"))
    assert(counts("weak_strong") >= counts("weak"))
    assert(counts("exact") <= counts("weak_strong"))
  }

  test("imputeMeans fills null numerics with the column mean (F8)") {
    val df = Seq(Some(1.0), Some(3.0), None, Some(5.0), None).toDF("x")
    val out = Scoring.imputeMeans(df, Seq("x")).as[Double].collect().sorted.toSeq
    assert(out == Seq(1.0, 3.0, 3.0, 3.0, 5.0))
    // an all-null column has no mean — rows stay null rather than 0-filled
    val allNull = Seq[Option[Double]](None, None).toDF("x")
    val stillNull = Scoring.imputeMeans(allNull, Seq("x"))
      .filter(col("x").isNull).count()
    assert(stillNull == 2L)
  }

  test("logistic score treats NULL features as zero evidence, not NULL") {
    // 0.0 * NULL = NULL in Spark: before the coalesce guard one NULL
    // feature silently nulled the whole score and dropped the pair from
    // any score-ranked consumer
    val w = Scoring.DefaultWeights
    val df = Seq(
      (true, Option(0.5), Option.empty[Double], Option.empty[Double]),
      (false, Option.empty[Double], Option.empty[Double], Option.empty[Double])
    ).toDF("strong_overlap", "jaccard_tokens", "lev_first", "jw_first")
    val got = df.withColumn("score", Scoring.logisticScore(w))
      .select($"strong_overlap", $"score").as[(Boolean, Double)]
      .collect().toMap
    def sigmoid(z: Double) = 1.0 / (1.0 + math.exp(-z))
    assert(math.abs(got(true) - sigmoid(w.bias + w.strong + w.jaccard * 0.5)) < 1e-12)
    assert(math.abs(got(false) - sigmoid(w.bias)) < 1e-12)
  }

  test("logistic score is monotone with the rule decision") {
    val rows = scored.select("is_match", "score").as[(Boolean, Double)].collect()
    val matchScores = rows.filter(_._1).map(_._2)
    val nonScores = rows.filterNot(_._1).map(_._2)
    if (matchScores.nonEmpty && nonScores.nonEmpty) {
      assert(matchScores.min > nonScores.max ||
        matchScores.sum / matchScores.length > nonScores.sum / nonScores.length)
    }
  }
}
