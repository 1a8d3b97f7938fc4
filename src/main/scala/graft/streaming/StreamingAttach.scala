package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.{Blocking, Collapse, Features, Incremental, Scoring}

/** Structured Streaming front-end for the incremental-attach path — the
  * continuous version of the daily-ingest shape (`Incremental.attach`).
  *
  * SURVEY.md §2.12 declares streaming out of scope for the CORE engine
  * (the reference is batch-only [PK-high] and the north rule specifies
  * batch spark-submit jobs); this adapter is provided ON TOP of the
  * batch operators because a production 100 TB deployment ingests
  * transcripts continuously, and the attach operator was designed for
  * exactly that access pattern (entity-side inverted index, per-batch
  * cost independent of corpus size).
  *
  * Design decisions:
  *
  *  - **`foreachBatch`, not stateful streaming ops.** The catalog side
  *    of the attach is a full entity table — far too large for
  *    `flatMapGroupsWithState` state at target scale, and the attach is
  *    a two-sided equi-join + window, which micro-batch execution plans
  *    with the full batch optimizer (AQE, broadcast thresholds, skew
  *    handling) exactly like the batch path. Each micro-batch runs the
  *    IDENTICAL `collapse → enrich → attach` plan the batch pipeline
  *    uses, so streaming and batch results cannot drift.
  *
  *  - **Exactly-once via source checkpointing + idempotent sink.** The
  *    caller sets `checkpointLocation`; the file/Kafka source replays
  *    an interrupted micro-batch in full, and because `attach` is
  *    record→catalog only (never record→record), re-emitting a batch's
  *    assignments is idempotent under an overwrite-by-key or
  *    dedup-on-read sink — the same idempotence contract as the batch
  *    pipeline's stage checkpoints (SURVEY.md §7).
  *
  *  - **Whole conversations per micro-batch.** The ingest contract is
  *    that a conversation's turns arrive together (the daily-ingest
  *    file drop; enforce upstream by partitioning the landing files by
  *    conv_id). `collapse` inside one micro-batch then sees every turn
  *    of each conversation. Turns of a conversation split ACROSS
  *    micro-batches would mint two partial records — the same caveat
  *    `Incremental.attach` documents for new-new duplicates, resolved
  *    by the periodic full re-cluster.
  */
object StreamingAttach {

  /** One micro-batch of raw transcript turns → (conv_id, entity_id)
    * assignments against a fixed entity catalog. Pure function of the
    * batch — shared by the streaming writer and directly unit-testable.
    */
  def assignBatch(turnBatch: DataFrame, entities: DataFrame,
      jaccardThreshold: Double = Scoring.DefaultJaccardThreshold,
      tokenDfCap: Int = Blocking.DefaultTokenDfCap): DataFrame =
    Incremental.attach(
      Features.enrich(Collapse.collapse(turnBatch)),
      entities, jaccardThreshold, tokenDfCap)

  /** Wrap a STREAMING DataFrame of transcript turns (schema
    * `Model.transcriptSchema`) into a writer that emits per-batch
    * entity assignments through `sink(assignments, batchId)`.
    *
    * The caller owns trigger, checkpointLocation, and start():
    * {{{
    * StreamingAttach.writer(stream, catalog)(sink)
    *   .option("checkpointLocation", ckptDir)
    *   .trigger(Trigger.AvailableNow())
    *   .start()
    * }}}
    */
  def writer(turnStream: DataFrame, entities: DataFrame,
      jaccardThreshold: Double = Scoring.DefaultJaccardThreshold,
      tokenDfCap: Int = Blocking.DefaultTokenDfCap)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    turnStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(assignBatch(batch, entities, jaccardThreshold, tokenDfCap),
          batchId)
      }
}
