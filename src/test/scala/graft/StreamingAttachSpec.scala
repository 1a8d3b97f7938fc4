package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Model, TranscriptRow}
import graft.ops.{Collapse, Entities, Features}
import graft.streaming.StreamingAttach

/** Structured-Streaming ingest over the incremental-attach path: each
  * micro-batch of raw turns is collapsed, enriched, and attached to a
  * fixed entity catalog; the source checkpoint makes a restarted query
  * skip already-processed batches (exactly-once against an idempotent
  * sink).
  */
class StreamingAttachSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val t0 = Timestamp.valueOf("2026-01-01 00:00:00")

  private def turns(conv: String, text: String, tool: Option[String]) =
    text.split("\\.").zipWithIndex.map { case (t, i) =>
      TranscriptRow(conv, i, if (i % 2 == 0) "user" else "assistant",
        t.trim, if (i == 0) tool else None, t0)
    }.toSeq

  test("streamed attach matches batch attach and resumes from checkpoint") {
    import spark.implicits._
    // catalog: e(c1,c2) carries strong key T:search; c3 is token-only
    val baseTurns = (
      turns("c1", "alpha beta gamma. gamma beta", Some("search")) ++
      turns("c2", "alpha beta delta. delta alpha", Some("search")) ++
      turns("c3", "omega psi chi phi. phi chi", None)).toDF()
    val baseRecs = Features.enrich(Collapse.collapse(baseTurns))
    val labels = Seq(("c1", "c1"), ("c2", "c1"), ("c3", "c3"))
      .toDF("conv_id", "entity_id")
    val entities = Entities.fuse(baseRecs, labels).localCheckpoint()

    val srcDir = Files.createTempDirectory("graft-stream-src").toString
    val ckptDir = Files.createTempDirectory("graft-stream-ckpt").toString
    val batch1 = (
      turns("n1", "totally different words here", Some("search")) ++ // strong → c1
      turns("n2", "omega psi chi", None)).toDF()                     // jac 3/4 → c3
    batch1.write.mode("append").parquet(srcDir)

    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(Model.transcriptSchema).parquet(srcDir)
      val q = StreamingAttach.writer(stream, entities) { (assign, id) =>
        assign.collect().foreach(r =>
          seen += ((id, r.getString(0), r.getString(1))))
      }.option("checkpointLocation", ckptDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    runOnce()
    assert(seen.map(t => t._2 -> t._3).toMap ==
      Map("n1" -> "c1", "n2" -> "c3"))

    // second file drop + RESTARTED query on the same checkpoint: only the
    // new conversations are processed (batch 1 is not re-emitted), and
    // the unmatched one mints itself
    val before = seen.size
    val batch2 = (
      turns("n3", "unrelated vocabulary entirely", None) ++          // singleton
      turns("n4", "gamma alpha beta", Some("search"))).toDF()        // strong → c1
    batch2.write.mode("append").parquet(srcDir)
    runOnce()
    val newRows = seen.drop(before)
    assert(newRows.map(t => t._2 -> t._3).toMap ==
      Map("n3" -> "n3", "n4" -> "c1"))
    assert(newRows.map(_._2).toSet.intersect(Set("n1", "n2")).isEmpty,
      "checkpoint resume must not re-emit batch-1 conversations")

    // streamed union == one-shot batch attach over the same records
    val batchAll = StreamingAttach.assignBatch(
      batch1.unionByName(batch2), entities)
      .as[(String, String)].collect().toMap
    assert(seen.map(t => t._2 -> t._3).toMap == batchAll)
  }
}
