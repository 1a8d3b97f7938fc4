package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ErMetrics

class MetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // truth: {a,b,c}, {d,e}; predicted: {a,b}, {c}, {d,e}
  private lazy val truth = Seq(
    ("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "d")
  ).toDF("conv_id", "entity_id")
  private lazy val pred = Seq(
    ("a", "a"), ("b", "a"), ("c", "c"), ("d", "d"), ("e", "d")
  ).toDF("conv_id", "entity_id")

  test("pairwise P/R/F1 by hand: tp=2 fp=0 fn=2") {
    val m = ErMetrics.pairwise(truth, pred, None).head()
    assert(m.getLong(0) == 2 && m.getLong(1) == 0 && m.getLong(2) == 2)
    assert(m.getDouble(3) == 1.0)          // precision
    assert(m.getDouble(4) == 0.5)          // recall
    assert(math.abs(m.getDouble(5) - 2.0 / 3.0) < 1e-12) // f1
  }

  test("universe restriction drops pairs outside shared blocking keys") {
    val universe = Seq(("a", "b")).toDF("a_id", "b_id")
    val m = ErMetrics.pairwise(truth, pred, Some(universe)).head()
    assert(m.getLong(0) == 1 && m.getLong(1) == 0 && m.getLong(2) == 0)
    assert(m.getDouble(5) == 1.0)
  }

  test("bcubed by hand") {
    // per-record precision: a:1 b:1 c:1 d:1 e:1 → 1.0 (all pred clusters pure)
    // per-record recall: a:2/3 b:2/3 c:1/3 d:1 e:1 → avg 11/15
    val m = ErMetrics.bcubed(truth, pred).head()
    assert(math.abs(m.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(m.getDouble(1) - 11.0 / 15.0) < 1e-12)
  }

  test("cluster size histogram") {
    val h = ErMetrics.clusterSizeHistogram(pred)
      .as[(Long, Long)].collect().toMap
    assert(h == Map(2L -> 2L, 1L -> 1L))
  }

  test("perfect prediction → F1 = 1") {
    val m = ErMetrics.pairwise(truth, truth, None).head()
    assert(m.getDouble(5) == 1.0)
  }
}
