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

  test("md5 contract: size/kind/payload/features pin to the documented chain") {
    // inline re-derivation (independent of graft.util.Hashing) of the
    // generator + decode spec that the DuckDB mm_features oracle mirrors
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    def h64(s: String): Long =
      java.lang.Long.parseUnsignedLong(md5hex(s).take(16), 16)
    val assets = Multimodal.syntheticAssets(spark, 3).collect().sortBy(_.asset_id)
    for (a <- assets) {
      val id = a.asset_id
      val size = 256 + (h64(s"42:$id:sz") & 4095L).toInt
      assert(a.bytes.length == size)
      assert(a.kind == Seq("image", "audio", "video")(
        java.lang.Long.remainderUnsigned(h64(s"42:$id:kd"), 3L).toInt))
      val hex = (0 until (size + 15) / 16).map(k => md5hex(s"42:$id:$k"))
        .mkString.substring(0, 2 * size)
      assert(a.bytes.map(b => f"${b & 0xff}%02x").mkString == hex)
      val L = 2 * size
      val expected = (0 until Multimodal.FeatureDim).map { i =>
        ((h64(hex.substring(i * L / 32, (i + 1) * L / 32)) >>> 11).toDouble /
          (1L << 53).toDouble).toFloat
      }
      assert(Multimodal.fakeDecode(a.bytes).toSeq == expected)
    }
  }
}
