package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TranscriptGen
import graft.ops.{Blocking, Collapse, Features}

class BlockingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val recs = Features.enrich(Collapse.collapse(
    TranscriptGen.transcripts(spark, 40).toDF()))

  test("strong blocks: one key per tool-signature, grouping same-entity convs") {
    val blocks = Blocking.strongBlocks(recs).as[(String, String)].collect()
    assert(blocks.forall(_._2.startsWith("T:")))
    // uncorrupted duplicates of the same entity share the strong key
    val byConv = blocks.map(r => r._1 -> r._2).toMap
    val e0 = byConv.filter(_._1.startsWith("c0000000"))
    if (e0.size > 1) assert(e0.values.toSet.size <= 2)
  }

  test("token blocks exclude hot tokens (df cap)") {
    val cap = 10
    val blocks = Blocking.tokenBlocks(recs, cap)
    val maxDf = Blocking.blockSizes(blocks).agg(max("block_size")).head().getLong(0)
    assert(maxDf <= cap)
  }

  test("minhash bands: same-entity convs collide on >=1 band; blocking is complete for truth pairs") {
    val bands = Blocking.minhashBlocks(recs)
    val pairs = graft.ops.Pairs.candidatePairs(
      Blocking.allBlocks(recs), graft.ops.Pairs.PairConfig())
      .as[(String, String)].collect().toSet
    val truth = TranscriptGen.labels(spark, 40).toDF()
    val truthPairs = truth.as("a").join(truth.as("b"),
        col("a.entity_id") === col("b.entity_id") && col("a.conv_id") < col("b.conv_id"))
      .select(col("a.conv_id"), col("b.conv_id"))
      .as[(String, String)].collect().toSet
    val missed = truthPairs -- pairs
    // blocking recall: nearly all planted pairs captured at tiny scale
    assert(missed.size <= truthPairs.size / 20, s"missed ${missed.size}/${truthPairs.size}")
  }

  test("block size telemetry") {
    val sizes = Blocking.blockSizes(Blocking.allBlocks(recs))
    assert(sizes.filter(col("block_size") < 1).count() == 0)
  }

  test("single-block baseline (B3): full cross product, recall 1 on truth pairs") {
    val n = recs.count()
    val pairs = graft.ops.Pairs.candidatePairs(
      Blocking.singleBlock(recs),
      graft.ops.Pairs.PairConfig(blockSizeCap = Int.MaxValue))
    assert(pairs.count() == n * (n - 1) / 2)
    // no blocking → every truth pair is a candidate, by construction
    val truth = TranscriptGen.labels(spark, 40).toDF()
    val m = graft.ops.ErMetrics.blockingRecall(truth, pairs).head()
    assert(m.getDouble(2) == 1.0)
  }
}
