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

  test("MUC by hand: precision 1, recall 2/3, f1 0.8") {
    // recall: T1={a,b,c} split into 2 pred parts → 3-2=1; T2={d,e} → 1;
    //         den (3-1)+(2-1)=3 → 2/3
    // precision: every pred cluster pure → num=den=2 → 1.0
    val m = ErMetrics.muc(truth, pred).head()
    assert(m.getDouble(0) == 1.0)
    assert(math.abs(m.getDouble(1) - 2.0 / 3.0) < 1e-12)
    assert(math.abs(m.getDouble(2) - 0.8) < 1e-12)
  }

  test("MUC: perfect prediction → all 1") {
    val m = ErMetrics.muc(truth, truth).head()
    assert(m.getDouble(0) == 1.0 && m.getDouble(1) == 1.0 && m.getDouble(2) == 1.0)
  }

  test("closest-cluster by hand: precision 1, recall 0.8") {
    // cells: (a,a)=2 (a,c)=1 (d,d)=2; N=5
    // precision: per-p best = 2+1+2 = 5 → 1.0
    // recall: per-t best = 2+2 = 4 → 0.8
    val m = ErMetrics.closestCluster(truth, pred).head()
    assert(m.getDouble(0) == 1.0)
    assert(math.abs(m.getDouble(1) - 0.8) < 1e-12)
    assert(math.abs(m.getDouble(2) - 8.0 / 9.0) < 1e-12)
  }

  test("blocking recall by hand") {
    // truth pairs: (a,b)(a,c)(b,c)(d,e); universe covers 2 of 4
    val universe = Seq(("a", "b"), ("d", "e"), ("x", "y")).toDF("a_id", "b_id")
    val m = ErMetrics.blockingRecall(truth, universe).head()
    assert(m.getLong(0) == 4 && m.getLong(1) == 2)
    assert(m.getDouble(2) == 0.5)
  }

  test("induced-pairs cluster-size guard fires on a planted monster cluster") {
    val labels = ((0 until 20).map(i => (f"m$i%02d", "M"))
      ++ Seq(("x", "X"), ("y", "X"))).toDF("conv_id", "entity_id")
    val d = ErMetrics.droppedClusterStats(labels, cap = 10).head()
    assert(d.getLong(0) == 1 && d.getLong(1) == 20)
    // over-cap cluster excluded from the quadratic self-join
    assert(ErMetrics.inducedPairs(labels, clusterSizeCap = 10).count() == 1L)
    // default cap never binds on healthy sizes
    assert(ErMetrics.inducedPairs(labels).count() == 190L + 1L)
    // no clusters over cap → zero-telemetry row
    val d0 = ErMetrics.droppedClusterStats(labels).head()
    assert(d0.getLong(0) == 0 && d0.getLong(1) == 0)
  }

  test("closest-cluster on empty labelings degenerates instead of NPEing") {
    val empty = Seq.empty[(String, String)].toDF("conv_id", "entity_id")
    val m = ErMetrics.closestCluster(empty, empty).head()
    assert(m.getDouble(0) == 1.0 && m.getDouble(1) == 1.0)
  }

  test("bcubed on empty labelings degenerates instead of NPEing") {
    val empty = Seq.empty[(String, String)].toDF("conv_id", "entity_id")
    val m = ErMetrics.bcubed(empty, empty).head()
    assert(m.getDouble(0) == 1.0 && m.getDouble(1) == 1.0)
    // conv_id-disjoint labelings join to zero rows — same degenerate path
    val t = Seq(("a", "a")).toDF("conv_id", "entity_id")
    val p = Seq(("z", "z")).toDF("conv_id", "entity_id")
    val m2 = ErMetrics.bcubed(t, p).head()
    assert(m2.getDouble(0) == 1.0 && m2.getDouble(1) == 1.0)
  }

  test("blocking recall is invariant to duplicated universe rows") {
    // same truth as "blocking recall by hand", universe rows tripled: a
    // duplicated candidate pair must not fan the join out and inflate
    // either count
    val universe = Seq(("a", "b"), ("a", "b"), ("a", "b"),
      ("d", "e"), ("d", "e"), ("x", "y")).toDF("a_id", "b_id")
    val m = ErMetrics.blockingRecall(truth, universe).head()
    assert(m.getLong(0) == 4 && m.getLong(1) == 2)
    assert(m.getDouble(2) == 0.5)
  }
}
