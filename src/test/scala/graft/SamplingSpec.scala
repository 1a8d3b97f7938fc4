package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val ids = (1 to 500).map(i => f"C$i%04d").toDF("conv_id")

  test("hashSplit: disjoint, complete, deterministic under repartition") {
    val (tr1, te1) = Sampling.hashSplit(ids, "conv_id")
    val (tr2, te2) = Sampling.hashSplit(ids.repartition(13), "conv_id")
    val (a, b) = (tr1.as[String].collect().toSet, te1.as[String].collect().toSet)
    assert((a & b).isEmpty)
    assert((a | b).size == 500)
    assert(tr2.as[String].collect().toSet == a)
    assert(te2.as[String].collect().toSet == b)
    // 8/10 buckets train: roughly 80%
    assert(a.size > 350 && a.size < 450, s"train=${a.size}")
  }

  test("labeledPairs: is_match ⇔ shared truth entity; feature cols kept") {
    val pairs = Seq(("a", "b", 0.9), ("a", "c", 0.1), ("b", "x", 0.5))
      .toDF("a_id", "b_id", "jac")
    val truth = Seq(("a", "e1"), ("b", "e1"), ("c", "e2")).toDF("conv_id", "entity_id")
    val lab = Sampling.labeledPairs(pairs, truth)
      .as[(String, String, Double, Boolean)].collect().toSet
    // (b,x) dropped: x unlabeled
    assert(lab == Set(("a", "b", 0.9, true), ("a", "c", 0.1, false)))
  }

  test("balancedLabeledPairs: deterministic subset, classes near-balanced") {
    // 50 positives, 450 negatives over synthetic pair ids
    val labeled = (1 to 500).map { i =>
      (f"A$i%04d", f"B$i%04d", i <= 50)
    }.toDF("a_id", "b_id", "is_match")
    val s1 = Sampling.balancedLabeledPairs(labeled)
    val s2 = Sampling.balancedLabeledPairs(labeled.repartition(11))
    val rows1 = s1.as[(String, String, Boolean)].collect().toSet
    assert(rows1 == s2.as[(String, String, Boolean)].collect().toSet)
    val nPos = rows1.count(_._3)
    val nNeg = rows1.size - nPos
    // positives all kept (minority, threshold = 100%); negatives sampled
    // to ~50 (binomial around the target)
    assert(nPos == 50)
    assert(nNeg > 25 && nNeg < 80, s"neg=$nNeg")
    assert(rows1.subsetOf(labeled.as[(String, String, Boolean)].collect().toSet))
  }

  test("hashBucket range and engine-portable value") {
    val buckets = ids.select(Sampling.hashBucket(col("conv_id"), 10L).as("b"))
      .as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < 10))
    // pinned value: DuckDB ('0x'||substr(md5('E00042_2'),1,8))::BIGINT = 3797863113
    val v = Seq("E00042_2").toDF("k")
      .select(Sampling.hashBucket(col("k"), 1L << 33).as("v")).as[Long].head()
    assert(v == 3797863113L)
  }
}
