package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ann.Ann
import graft.mm.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("batched feature extraction: shape, determinism, kind handling") {
    val assets = Multimodal.syntheticAssets(spark, 50)
    val feats = Multimodal.extractFeatures(assets).collect()
    assert(feats.length == 50)
    feats.foreach { f =>
      assert(f.features.length == Multimodal.FeatureDim)
      assert(f.n_bytes >= 256)
      if (f.kind == "video") assert(f.n_frames >= 1) else assert(f.n_frames == 1)
    }
    // determinism across partitionings
    val again = Multimodal.extractFeatures(
      Multimodal.syntheticAssets(spark, 50).repartition(7)).collect()
    assert(feats.sortBy(_.asset_id).map(_.features.toSeq).toSeq ==
      again.sortBy(_.asset_id).map(_.features.toSeq).toSeq)
  }

  test("feature vectors flow into the ANN module") {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticAssets(spark, 40))
    val frame = Multimodal.featureFrame(feats)
    val topk = Ann.bruteTopK(frame, 3, 4)
    assert(topk.count() == 3 * 4)
  }

  test("identical payloads give identical features (fake decode is pure)") {
    val b = Array.tabulate[Byte](1000)(i => (i % 127).toByte)
    assert(Multimodal.fakeDecode(b).toSeq == Multimodal.fakeDecode(b.clone()).toSeq)
  }
}
