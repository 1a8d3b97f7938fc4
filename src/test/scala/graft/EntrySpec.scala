package graft

import org.scalatest.funsuite.AnyFunSuite

class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("driver contract: entry returns labels with rows > 0") {
    val labels = SparkEntry.entry(spark)
    assert(labels.columns.toSeq == Seq("conv_id", "entity_id"))
    assert(labels.count() > 0)
  }

  test("driver contract: every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
