package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Hashing

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video carried as opaque `binary` columns with typed metadata, and
  * decode / feature-extract / frame-sample implemented as *batched
  * per-partition* transforms (the Scala equivalent of PySpark's
  * mapInPandas: one JVM call per batch, not per row).
  *
  * ── STUB BOUNDARY ────────────────────────────────────────────────────
  * No image/audio codecs exist in this container, so the actual decode
  * is a clearly-marked DETERMINISTIC FAKE (`fakeDecode`): it hashes the
  * byte payload into a fixed-shape float vector. Everything around it —
  * schema, binary handling, partition batching, output shape, tests —
  * is real; swapping `fakeDecode` for a JNI/javacv decoder is the only
  * production change.
  * ─────────────────────────────────────────────────────────────────────
  */
object Multimodal {

  val FeatureDim = 32

  case class Asset(
      asset_id: Long,
      kind: String,            // "image" | "audio" | "video"
      bytes: Array[Byte],
      width: Option[Int],      // typed metadata travels with the blob
      height: Option[Int],
      duration_ms: Option[Long])

  case class AssetFeatures(
      asset_id: Long,
      kind: String,
      n_bytes: Int,
      features: Array[Float],
      n_frames: Int)

  /** STUB: deterministic fake "decode + feature extraction" — a pure
    * function of the bytes so tests are exact. Production replaces this
    * body (only) with a real codec call.
    */
  def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val h = bytes.grouped(math.max(1, bytes.length / FeatureDim)).toArray
    (0 until FeatureDim).map { i =>
      val chunk = if (i < h.length) h(i) else Array.empty[Byte]
      val mixed = Hashing.mix(chunk.foldLeft(0L)((a, b) => Hashing.mix64(a ^ b)), i.toLong)
      ((mixed >>> 11).toDouble / (1L << 53).toDouble).toFloat
    }.toArray
  }

  /** STUB: deterministic "frame sampling" for video payloads — counts
    * evenly-spaced sample offsets; production would decode frames.
    */
  def sampleFrameCount(bytes: Array[Byte], everyNBytes: Int = 1024): Int =
    math.max(1, bytes.length / everyNBytes)

  /** Batched decode: one pass per partition, rows processed in bulk —
    * the real Spark-side contract (partitioning, batch shape, encoder
    * round-trip) that a production decoder plugs into.
    */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        AssetFeatures(
          a.asset_id, a.kind, a.bytes.length, fakeDecode(a.bytes),
          if (a.kind == "video") sampleFrameCount(a.bytes) else 1)
      }
    }
  }

  /** Deterministic synthetic asset table (no binary testdata ships with
    * the sandbox): payload bytes are a pure function of (seed, id).
    */
  def syntheticAssets(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kind = Seq("image", "audio", "video")(Hashing.range(3, seed, id, 1L))
      val size = 256 + Hashing.range(4096, seed, id, 2L)
      val bytes = Array.tabulate[Byte](size)(i =>
        (Hashing.mix(seed, id, i.toLong) & 0xFF).toByte)
      Asset(id, kind, bytes,
        if (kind == "image") Some(64 + Hashing.range(512, seed, id, 3L)) else None,
        if (kind == "image") Some(64 + Hashing.range(512, seed, id, 4L)) else None,
        if (kind != "image") Some(1000L + Hashing.range(60000, seed, id, 5L)) else None)
    }
  }

  /** Embedding-style similarity over the extracted features: reuses the
    * ANN module — multimodal near-dup = feature-vector cosine.
    */
  def featureFrame(features: Dataset[AssetFeatures]): DataFrame =
    features.toDF()
      .select(col("asset_id").as("vec_id"), col("features").as("embedding"),
        lit(0).as("label"))
}
