package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Typed data model for the transcript ER pipeline.
  *
  * Mirrors the reference's Record abstraction (a set of feature values per
  * feature plus provenance line indices — reference:
  * python/pairwise_features.py::Record [PK-high, SURVEY.md §1.1]) as typed
  * Spark rows: one `Turn` per source row, one `ConvRecord` per
  * conversation after collapse, arrays where the reference keeps value
  * sets.
  *
  * The input shape is fixed by BASELINE.json:15 (input_hint):
  * transcripts(conv_id string, turn_idx int, role string, text string,
  * tool string, ts timestamp).
  */
object Model {

  /** Explicit input schema — never inferred (the reference declares its
    * schema in the annotated-CSV prelude; SURVEY.md §1.1).
    */
  val transcriptSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("tool", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = false)
  ))

  val labelSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("entity_id", StringType, nullable = false)
  ))
}

/** One source row of the transcripts table. */
case class TranscriptRow(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: Option[String],
    ts: Timestamp
)

/** One turn inside a collapsed conversation record (field order matters:
  * turn_idx leads so `sort_array` over the struct yields stable
  * (conv_id, turn_idx) ordering — BASELINE.json:6).
  */
case class Turn(
    turn_idx: Int,
    role: String,
    text: String,
    tool: Option[String],
    ts: Timestamp
)

/** Ground-truth / predicted cluster label. Canonical entity_id = min
  * conv_id over the cluster (deterministic representative, SURVEY.md §1.3).
  */
case class EntityLabel(conv_id: String, entity_id: String)

/** Per-stage lineage/metrics row appended at every checkpoint
  * (BASELINE.json north_star: "per-partition lineage + metrics rows").
  */
case class StageMetrics(
    run_id: String,
    stage: String,
    partition_id: Int,
    rows: Long,
    wall_ms: Long,
    input_fingerprint: String
)
