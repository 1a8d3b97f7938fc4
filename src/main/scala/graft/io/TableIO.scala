package graft.io

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage checkpoint I/O with manifests and per-partition lineage/metrics
  * rows (BASELINE.json north_star: "checkpoint every stage ... with
  * per-partition lineage + metrics rows so any run resumes idempotently
  * mid-clustering").
  *
  * The sandbox has no Iceberg jars (SURVEY.md §0 [SB]), so the cluster
  * deployment's Iceberg catalog sits behind this seam: `ParquetTableIO`
  * implements it as partitioned parquet + `_manifest.json` sidecars; an
  * Iceberg implementation swaps `writeTo(...).append` in without touching
  * pipeline code.
  */
trait TableIO {
  def exists(stage: String): Boolean
  def read(spark: SparkSession, stage: String): DataFrame
  /** Write the stage output + manifest + metrics rows; returns a re-read
    * of the materialized data (plan truncation for iterative callers).
    */
  def write(df: DataFrame, stage: String, runId: String,
      inputFingerprint: String): DataFrame
  def dropFrom(stage: String): Unit
}

class ParquetTableIO(root: String) extends TableIO {

  private def dataPath(stage: String) = s"$root/$stage/data"
  private def manifestPath(stage: String) = s"$root/$stage/_manifest.json"
  private def metricsPath(stage: String) = s"$root/$stage/_metrics"

  override def exists(stage: String): Boolean =
    Files.exists(Paths.get(manifestPath(stage))) &&
      Files.exists(Paths.get(dataPath(stage), "_SUCCESS"))

  /** The input fingerprint recorded in the stage's manifest, or None if
    * the stage is absent/incomplete. The write order below (data first,
    * manifest last) makes this the freshness check for cross-JVM cache
    * reuse: a kill mid-write leaves either no manifest or a manifest
    * whose fingerprint no longer matches the caller's current one.
    */
  def manifestInputFingerprint(stage: String): Option[String] =
    if (!exists(stage)) None
    else {
      val m = Files.readString(Paths.get(manifestPath(stage)))
      """"input_fingerprint":"([^"]*)"""".r
        .findFirstMatchIn(m).map(_.group(1))
    }

  override def read(spark: SparkSession, stage: String): DataFrame =
    spark.read.parquet(dataPath(stage))

  override def write(df: DataFrame, stage: String, runId: String,
      inputFingerprint: String): DataFrame = {
    val t0 = System.currentTimeMillis()
    df.write.mode("overwrite").parquet(dataPath(stage))
    val spark = df.sparkSession
    val back = spark.read.parquet(dataPath(stage))

    // Per-partition lineage rows (E4): row counts by physical partition
    // of the materialized stage, stamped with run + input fingerprint.
    val wallMs = System.currentTimeMillis() - t0
    back.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("rows"))
      .withColumn("run_id", lit(runId))
      .withColumn("stage", lit(stage))
      .withColumn("wall_ms", lit(wallMs))
      .withColumn("input_fingerprint", lit(inputFingerprint))
      .write.mode("overwrite").parquet(metricsPath(stage))

    val rowCount = back.count()
    val manifest =
      s"""{"stage":"$stage","run_id":"$runId","rows":$rowCount,""" +
        s""""wall_ms":$wallMs,"input_fingerprint":"$inputFingerprint"}"""
    Files.createDirectories(Paths.get(root, stage))
    Files.writeString(Paths.get(manifestPath(stage)), manifest,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    back
  }

  override def dropFrom(stage: String): Unit = {
    val p = Paths.get(root, stage)
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
  }
}
