package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R1/R2/R3 (SURVEY.md §2.2): turns → one record per conversation under
  * stable (conv_id, turn_idx) ordering, with a losslessly-invertible
  * collapse (the BASELINE.json:15 per-row invariant: per-turn text
  * equality vs the source).
  *
  * One shuffle: `groupBy(conv_id)` + `sort_array(collect_list(struct))`.
  * turn_idx leads the struct, so `sort_array`'s lexicographic struct
  * ordering IS the turn ordering, with no extra Window/sort stage —
  * `collect_list` alone would be partition-order-dependent (SURVEY.md
  * §7.4 determinism risk).
  */
object Collapse {

  private val turnStruct =
    struct(col("turn_idx"), col("role"), col("text"), col("tool"), col("ts"))

  /** transcripts(conv_id, turn_idx, role, text, tool, ts) →
    * records(conv_id, turns: array<struct>).
    */
  def collapse(transcripts: DataFrame): DataFrame =
    transcripts
      .groupBy(col("conv_id"))
      .agg(sort_array(collect_list(turnStruct)).as("turns"))

  /** Inverse of collapse — used by the invariant audit and the resume
    * test.
    */
  def explodeBack(records: DataFrame): DataFrame =
    records
      .select(col("conv_id"), explode(col("turns")).as("t"))
      .select(col("conv_id"), col("t.turn_idx").as("turn_idx"),
        col("t.role").as("role"), col("t.text").as("text"),
        col("t.tool").as("tool"), col("t.ts").as("ts"))

  /** Per-turn text-equality violations vs the source (must be empty,
    * 100% of rows, every run — BASELINE.md). Symmetric difference on
    * (conv_id, turn_idx, text).
    */
  def invariantViolations(source: DataFrame, records: DataFrame): DataFrame = {
    val key = Seq("conv_id", "turn_idx", "text")
    // ONE full-outer join instead of two except()s: the two excepts each
    // re-ran collapse∘explode over every turn and shuffled the full text
    // twice (measured 35 s → 13 s at bench tier). (conv_id, turn_idx) is
    // unique on both sides, so the side-marked anti rows are identical
    // to the except formulation's. Join keys are NULL-SAFE (<=>) to keep
    // except()'s NULLs-equal semantics (and the DuckDB oracle's EXCEPT):
    // a NULL text must match itself, not report two phantom violations.
    // <=> is still an equi-join key for Spark's hash joins — same plan
    // shape. The back side is renamed (not aliased) because it shares
    // lineage with source (records = collapse(source)) and conv_id's
    // attribute id survives the groupBy — df("c") disambiguation would
    // be ambiguous-self-join territory.
    val src = source.select(key.map(col): _*).withColumn("in_src", lit(1))
    val back = explodeBack(records)
      .select(key.map(c => col(c).as(s"b_$c")): _*)
      .withColumn("in_back", lit(1))
    val cond = key.map(c => col(c) <=> col(s"b_$c")).reduce(_ && _)
    src.join(back, cond, "full_outer")
      .filter(col("in_src").isNull || col("in_back").isNull)
      .select(key.map(c => coalesce(col(c), col(s"b_$c")).as(c)) :+
        when(col("in_back").isNull, lit("missing_in_records"))
          .otherwise(lit("extra_in_records")).as("side"): _*)
  }
}
