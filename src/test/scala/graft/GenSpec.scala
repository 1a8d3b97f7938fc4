package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TranscriptGen

class GenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("generation is deterministic and partition-independent") {
    val a = TranscriptGen.transcripts(spark, 20).collect().sortBy(r => (r.conv_id, r.turn_idx))
    val b = TranscriptGen.transcripts(spark, 20).repartition(7).collect()
      .sortBy(r => (r.conv_id, r.turn_idx))
    assert(a.toSeq == b.toSeq)
  }

  test("shape matches BASELINE.json input_hint") {
    val df = TranscriptGen.transcripts(spark, 5).toDF()
    assert(df.columns.toSeq == Seq("conv_id", "turn_idx", "role", "text", "tool", "ts"))
    val types = df.schema.map(_.dataType.simpleString)
    assert(types == Seq("string", "int", "string", "string", "string", "timestamp"))
  }

  test("labels: every conv labeled, entity_id is cluster min, dup0 uncorrupted") {
    val labels = TranscriptGen.labels(spark, 50).collect()
    val byEntity = labels.groupBy(_.entity_id)
    byEntity.foreach { case (eid, members) =>
      assert(members.map(_.conv_id).min == eid)
    }
    assert(labels.map(_.conv_id).distinct.length == labels.length)
    // dup counts in [1,5]
    assert(byEntity.values.forall(m => m.size >= 1 && m.size <= 5))
  }

  test("duplicates share most tokens with their hub (corruption bounded)") {
    val e = 7L
    val hub = TranscriptGen.turnsFor(42L, e, 0).map(_.text).mkString(" ").split(" ").toSet
    val dups = TranscriptGen.dupCount(42L, e)
    (1 until dups).foreach { d =>
      val dup = TranscriptGen.turnsFor(42L, e, d).map(_.text).mkString(" ").split(" ").toSet
      val j = (hub & dup).size.toDouble / (hub | dup).size
      assert(j > 0.5, s"dup $d jaccard $j")
    }
  }

  test("tool signature present on uncorrupted convs with >=4 turns") {
    val rows = TranscriptGen.turnsFor(42L, 3L, 0)
    if (rows.length >= 4) assert(rows.exists(_.tool.isDefined))
    assert(rows.filter(_.role == "tool").forall(r => r.turn_idx % 4 == 3))
  }
}
