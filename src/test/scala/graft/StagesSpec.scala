package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Pairs, Scoring}

/** Pins the delta composition of Stages.fullScored: the cached SQL-universe
  * scored table unioned with the scored (fullPairs ∖ sqlPairs) delta must
  * be row-for-row identical to scoring the full universe directly. The two
  * soundness legs — sqlUniversePairs ⊆ fullPairs (disjoint bkey namespaces
  * keep strong/token cap fates unchanged when families are added) and
  * row-wise-pure scoring — are exactly what this multiset equality tests.
  */
class StagesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("delta-composed fullPairs equals candidatePairs over all four families") {
    val composed = Stages.fullPairs(spark, dir)
    val direct = Pairs.candidatePairs(
      graft.ops.Blocking.allBlocks(Stages.records(spark, dir)))
    assert(composed.count() == direct.count())
    assert(composed.except(direct).count() == 0L)
    assert(direct.except(composed).count() == 0L)
  }

  test("delta-composed pairsUniverse3 equals candidatePairs over the three families") {
    val composed = Stages.pairsUniverse3(spark, dir)
    val direct = Pairs.candidatePairs(
      Stages.strongBlocks(spark, dir)
        .unionByName(Stages.tokenBlocks(spark, dir))
        .unionByName(Stages.timeBlocks(spark, dir)))
    assert(composed.count() == direct.count())
    assert(composed.except(direct).count() == 0L)
    assert(direct.except(composed).count() == 0L)
  }

  test("sqlUniversePairs is a subset of fullPairs") {
    val missing = Stages.sqlUniversePairs(spark, dir)
      .join(Stages.fullPairs(spark, dir), Seq("a_id", "b_id"), "left_anti")
      .count()
    assert(missing == 0L, s"$missing sql-universe pairs absent from fullPairs")
  }

  test("delta-composed fullScored equals the direct full-universe scoring") {
    val composed = Stages.fullScored(spark, dir)
    val direct = Scoring.score(
      Pairs.hydrate(Stages.fullPairs(spark, dir), Stages.records(spark, dir)))
    assert(composed.columns.sorted.toSeq == direct.columns.sorted.toSeq)
    val cols = composed.columns.sorted.map(org.apache.spark.sql.functions.col)
    // rows are unique per (a_id, b_id), so two NULL-safe excepts prove
    // multiset equality (an equi-join would silently drop NULL columns)
    val a = composed.select(cols.toSeq: _*)
    val b = direct.select(cols.toSeq: _*)
    assert(a.count() == b.count())
    assert(a.except(b).count() == 0L)
    assert(b.except(a).count() == 0L)
  }
}
