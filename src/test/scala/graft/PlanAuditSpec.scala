package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TranscriptGen
import graft.ops._

/** Asserted version of the `graft.PlanAudit` main: the physical-plan
  * properties that matter at 100 TB must FAIL the build when they
  * regress, not just print false in a manually-run report. AQE is
  * toggled off around plan construction (finalized adaptive plans hide
  * per-stage codegen wrapping from explain, and the assertions are
  * about the static plan shape; production paths keep AQE on).
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withAqeOff[T](f: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try f finally spark.conf.set(key, prev)
  }

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  private lazy val records = Features.enrich(Collapse.collapse(
    TranscriptGen.transcripts(spark, 200).toDF()))

  test("scoring plan: codegen'd, no cartesian, JaroWinkler inlined") {
    withAqeOff {
      val scored = Scoring.score(Pairs.hydrate(
        Pairs.candidatePairs(Blocking.allBlocks(records)), records))
      val plan = formatted(scored)
      assert(plan.contains("codegen id"), "scoring fell out of whole-stage codegen")
      assert(!plan.contains("Cartesian"), "pair generation degenerated to a cartesian product")
      assert(plan.contains("jaro_winkler"), "JaroWinkler expression missing from the scoring plan")
    }
  }

  test("incremental attach plan: token index joins on dictionary ids, no cartesian") {
    withAqeOff {
      val catalog = Entities.fuse(records,
        records.select(col("conv_id"), col("conv_id").as("entity_id")))
      val attached = Incremental.attach(records.limit(20), catalog)
      assert(!formatted(attached).contains("Cartesian"))
      val tokTypes = PlanAudit.tokJoinKeyTypes(
        attached.queryExecution.executedPlan).distinct
      assert(tokTypes == Seq(org.apache.spark.sql.types.LongType),
        s"token-index join keys must be the 8-byte dictionary ids, got $tokTypes")
    }
  }

  test("dedup_exact plan: agg+join, no window over group_key") {
    withAqeOff {
      // a window partitioned by group_key buffers each duplicate group in
      // one task's sorter and cannot AQE-split — the degenerate-group
      // shape round 6 rewrote away (round-5 VERDICT "Next round" #2)
      val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
        .toDF("doc_id", "text")
      val plan = formatted(graft.dedup.Dedup.exact(docs))
      assert(!plan.contains("Window"),
        "dedup_exact regressed to a window over group_key")
      assert(plan.contains("HashAggregate"),
        "dedup_exact group stats must come from a partial aggregation")
    }
  }

  test("parquet scan: filter pushed down and read schema pruned") {
    withAqeOff {
      val sf = "/root/testdata/sf0.001"
      val plan = spark.read.parquet(s"$sf/lineitem.parquet")
        .filter(col("l_quantity") > 30)
        .select("l_orderkey", "l_quantity")
        .queryExecution.executedPlan.toString
      assert(plan.contains("GreaterThan(l_quantity"), "filter not pushed to the scan")
      assert(plan.contains("l_orderkey") && !plan.contains("l_extendedprice"),
        "read schema not pruned to the projected columns")
    }
  }
}
