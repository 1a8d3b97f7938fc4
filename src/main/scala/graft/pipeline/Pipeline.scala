package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.ParquetTableIO
import graft.ops._

/** EP1′ (SURVEY.md §3.2): the flagship end-to-end ER run —
  * transcripts → collapse → features → blocks → candidate pairs →
  * scored pairs → connected-components loop → entity labels — with every
  * stage checkpointed through TableIO and manifest-driven resume: a
  * rerun (including a kill mid-clustering) skips stages whose manifest
  * carries the same input fingerprint, so the run is idempotent
  * (BASELINE.json north_rule "resumable from checkpoint").
  */
object Pipeline {

  case class Config(
      checkpointRoot: String,
      matchType: String = "weak_strong",
      jaccardThreshold: Double = Scoring.DefaultJaccardThreshold,
      tokenDfCap: Int = Blocking.DefaultTokenDfCap,
      pairCfg: Pairs.PairConfig = Pairs.PairConfig(),
      runId: String = "run0",
      auditInvariant: Boolean = true)

  /** Bumped whenever a stage's semantics change: checkpoints written by
    * older code must not be resumed into newer pipelines.
    */
  val CodeVersion = "g5"

  /** Cheap order-independent input fingerprint: one scan, (row count,
    * XOR of row hashes — overflow-free at any scale) over the
    * identity-carrying columns.
    */
  def fingerprint(transcripts: DataFrame): String = {
    val row = transcripts.agg(
      count(lit(1)),
      coalesce(bit_xor(xxhash64(col("conv_id"), col("turn_idx"), col("text"))), lit(0L))
    ).head()
    s"${row.getLong(0)}-${row.getLong(1)}"
  }

  /** Semantic-config fingerprint: a rerun against the same checkpointRoot
    * with a different matchType/threshold/cap/pair config must NOT reuse
    * stale checkpoints computed under the old config (round-1 ADVICE.md
    * item 2). runId and checkpointRoot are labels, not semantics, and are
    * excluded. The fields are serialized VERBATIM — a 32-bit hash of the
    * tuple (the round-2 shape) could collide two different configs and
    * silently resume stale checkpoints, the exact failure this
    * fingerprint exists to prevent (round-2 ADVICE.md item 2).
    */
  def configFingerprint(cfg: Config): String =
    s"$CodeVersion-${cfg.matchType}-${cfg.jaccardThreshold}-" +
      s"${cfg.tokenDfCap}-${cfg.pairCfg.blockSizeCap}-" +
      s"${cfg.pairCfg.hotThreshold}-${cfg.pairCfg.saltBuckets}"

  def run(spark: SparkSession, transcripts: DataFrame, cfg: Config): DataFrame = {
    val io = new ParquetTableIO(cfg.checkpointRoot)
    val fp = s"${fingerprint(transcripts)}-${configFingerprint(cfg)}"

    def manifestFp(stage: String): Option[String] = {
      val p = Paths.get(cfg.checkpointRoot, stage, "_manifest.json")
      if (!Files.exists(p)) None
      else "\"input_fingerprint\":\"([^\"]*)\"".r
        .findFirstMatchIn(Files.readString(p)).map(_.group(1))
    }

    /** Compute-or-resume one stage. */
    def stage(name: String)(compute: => DataFrame): DataFrame =
      if (io.exists(name) && manifestFp(name).contains(fp)) io.read(spark, name)
      else {
        io.dropFrom(name)
        io.write(compute, name, cfg.runId, fp)
      }

    val records = stage("records") {
      Features.enrich(Collapse.collapse(transcripts))
    }

    // The audit re-derives collapse∘explode over every turn — the right
    // gate for a fresh records stage, but pure waste on every warm rerun
    // of an already-audited checkpoint (measured ~28 s per Pipeline.run
    // call at sf0.1, paid by EVERY pipeline-consuming query). A marker
    // file carrying the full (input × config × code-version) fingerprint
    // records that THIS checkpoint state passed; any change that would
    // recompute records also invalidates the marker.
    if (cfg.auditInvariant) {
      val auditMarker = Paths.get(cfg.checkpointRoot, "records", "_audit_fp")
      val alreadyAudited =
        Files.exists(auditMarker) && Files.readString(auditMarker) == fp
      if (!alreadyAudited) {
        val violations = Collapse.invariantViolations(transcripts, records).count()
        require(violations == 0L,
          s"per-turn text-equality invariant violated: $violations rows")
        Files.writeString(auditMarker, fp)
      }
    }

    val blocks = stage("blocks") {
      Blocking.allBlocks(records, cfg.tokenDfCap)
    }

    val pairs = stage("pairs") {
      Pairs.candidatePairs(blocks, cfg.pairCfg)
    }

    // Dropped-block telemetry: capping is NEVER silent (SURVEY.md §7.4
    // risk 2). One cheap agg over the blocks checkpoint, written beside
    // the pairs stage and surfaced on stderr. Same marker pattern as the
    // audit: recomputed only when the fingerprint moved, re-read (and
    // re-warned) on every run.
    val droppedMarker = Paths.get(cfg.checkpointRoot, "pairs", "_dropped_fp")
    if (!(Files.exists(droppedMarker) && Files.readString(droppedMarker) == fp)) {
      Pairs.droppedBlockStats(blocks, cfg.pairCfg).write.mode("overwrite")
        .parquet(s"${cfg.checkpointRoot}/pairs/_dropped_blocks")
      Files.writeString(droppedMarker, fp)
    }
    val dRow = spark.read
      .parquet(s"${cfg.checkpointRoot}/pairs/_dropped_blocks").head()
    if (dRow.getLong(0) > 0) {
      System.err.println(s"[pipeline] dropped ${dRow.getLong(0)} oversized " +
        s"blocks (${dRow.getLong(1)} rows) at blockSizeCap=${cfg.pairCfg.blockSizeCap}")
    }

    val scored = stage("scored") {
      Scoring.score(Pairs.hydrate(pairs, records), cfg.matchType,
        cfg.jaccardThreshold)
    }

    val entities = stage("entities") {
      val edges = Scoring.matchEdges(scored)
      val nodes = records.select(col("conv_id"))
      // Each CC iteration checkpoints durably — the "resumes idempotently
      // mid-clustering" requirement: a killed run's completed iterations
      // are read back, not recomputed.
      ConnectedComponents.run(edges, nodes,
        checkpoint = (df, i) => stage(s"cc_iter_$i")(df))
    }
    entities
  }
}
