package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TranscriptGen
import graft.ops.ErMetrics
import graft.pipeline.Pipeline

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val p = Files.createTempDirectory(s"graft-$tag-")
    p.toString
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))

  test("golden end-to-end: pipeline recovers planted clusters, F1 >= 0.99") {
    val nEntities = 150
    val transcripts = TranscriptGen.transcripts(spark, nEntities).toDF()
    val truth = TranscriptGen.labels(spark, nEntities).toDF()
    val root = tmpDir("golden")
    val predicted = Pipeline.run(spark, transcripts, Pipeline.Config(root))

    val m = ErMetrics.pairwise(truth, predicted, None).head()
    val f1 = m.getAs[Double]("f1")
    assert(f1 >= 0.99, s"pairwise F1 $f1 (tp=${m.getLong(0)} fp=${m.getLong(1)} fn=${m.getLong(2)})")

    // canonical labels: every predicted entity_id is the min of its cluster
    val bad = predicted.groupBy("entity_id").agg(min("conv_id").as("mn"))
      .filter(col("entity_id") =!= col("mn")).count()
    assert(bad == 0)
    deleteRecursively(Path.of(root))
  }

  test("resume is idempotent: rerun + mid-clustering kill produce identical labels") {
    val nEntities = 60
    val transcripts = TranscriptGen.transcripts(spark, nEntities).toDF()
    val root = tmpDir("resume")
    val cfg = Pipeline.Config(root)

    val first = Pipeline.run(spark, transcripts, cfg)
      .as[(String, String)].collect().sorted.toSeq

    // plain rerun: all stages resumed from manifests
    val second = Pipeline.run(spark, transcripts, cfg)
      .as[(String, String)].collect().sorted.toSeq
    assert(first == second)

    // simulate a kill mid-clustering: wipe the final entities stage and a
    // late CC iteration, keep earlier checkpoints; rerun must rebuild
    // exactly the same output from the surviving checkpoints.
    deleteRecursively(Path.of(root, "entities"))
    deleteRecursively(Path.of(root, "cc_iter_1"))
    val resumed = Pipeline.run(spark, transcripts, cfg)
      .as[(String, String)].collect().sorted.toSeq
    assert(first == resumed)

    // input change invalidates resume (fingerprint mismatch → recompute)
    val other = TranscriptGen.transcripts(spark, nEntities + 5).toDF()
    val changed = Pipeline.run(spark, other, cfg)
    assert(changed.count() > first.size)
    deleteRecursively(Path.of(root))
  }

  test("config change invalidates checkpoints (no stale-config reuse)") {
    // round-1 ADVICE item 2: rerunning with a different semantic config
    // against the SAME checkpointRoot must not reuse stale stages
    val nEntities = 40
    val transcripts = TranscriptGen.transcripts(spark, nEntities).toDF()
    val root = tmpDir("cfg")
    val loose = Pipeline.run(spark, transcripts, Pipeline.Config(root))
      .as[(String, String)].collect().sorted.toSeq
    // strong-only matching against the same root: different config
    // fingerprint → scored/entities recomputed, labels genuinely differ
    // (weak-only duplicates fall out of their clusters)
    val strongOnly = Pipeline.run(spark, transcripts,
      Pipeline.Config(root, matchType = "strong"))
      .as[(String, String)].collect().sorted.toSeq
    assert(loose != strongOnly, "strong-only run reused weak_strong checkpoints")
    val nClustersLoose = loose.map(_._2).distinct.size
    val nClustersStrong = strongOnly.map(_._2).distinct.size
    assert(nClustersStrong >= nClustersLoose)
    // and flipping back also recomputes, reproducing the original exactly
    val back = Pipeline.run(spark, transcripts, Pipeline.Config(root))
      .as[(String, String)].collect().sorted.toSeq
    assert(back == loose)
    deleteRecursively(Path.of(root))
  }
}
