package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** B1–B4 (SURVEY.md §2.4): blocking-key tables. The reference builds
  * in-memory inverted indexes value → record-id set split into strong /
  * weak blocks (reference: python/blocking.py::BlockingScheme [PK-high,
  * SURVEY.md §0]); here a block is purely *logical* — a row
  * (conv_id, bkey) — and grouping is deferred to the pair self-join so
  * Catalyst/AQE pick the physical strategy.
  *
  * Three block families:
  *  - strong: exact tool-signature keys ("T:...")
  *  - weak/token: rare tokens (document frequency ≤ cap) ("W:...")
  *  - weak/LSH: MinHash band keys ("M|...")
  */
object Blocking {

  /** Tokens with df above this are useless as blocks (Zipf hot keys) —
    * they are excluded BEFORE pairing, mirroring the reference's
    * max_block_size defense.
    */
  val DefaultTokenDfCap = 50

  def strongBlocks(records: DataFrame): DataFrame =
    records.select(col("conv_id"), explode(col("strong_keys")).as("bkey"))

  /** Weak blocks from rare tokens: explode the token set, keep tokens
    * whose document frequency ≤ cap. The df filter is an aggregation +
    * self-join on the exploded table (same shuffle key, co-located).
    */
  def tokenBlocks(records: DataFrame, dfCap: Int = DefaultTokenDfCap): DataFrame = {
    val exploded = records.select(col("conv_id"), explode(col("token_set")).as("tok"))
    val rare = exploded.groupBy("tok").count().filter(col("count") <= dfCap)
      .select(col("tok"))
    exploded.join(rare, "tok")
      .select(col("conv_id"), concat(lit("W:"), col("tok")).as("bkey"))
  }

  def minhashBlocks(records: DataFrame): DataFrame =
    records.select(col("conv_id"), explode(col("mh_bands")).as("bkey"))

  /** Weak time-locality blocks: (ts0 hour bucket, n_turns). Duplicate
    * conversations (retries, resumes, re-ingests) cluster in time, so a
    * coarse time bucket recovers candidates that share NO rare token and
    * miss every LSH band — the residual recall tail at t2 (49 FN pairs,
    * all strong-key-dropped singletons with only Zipf-hot tokens).
    * Candidate-only: precision is still protected by scoring (Jaccard ≥
    * τ). At 100 TB a raw hour bucket is a monster block; n_turns
    * sub-keys it and the block-size cap + salting in candidatePairs are
    * the real defense — when temporal locality doesn't exist in the
    * corpus these blocks die at the cap, with telemetry, costing
    * nothing downstream.
    */
  def timeBlocks(records: DataFrame, bucketSecs: Int = 3600): DataFrame =
    records.select(col("conv_id"),
      concat(lit("H:"),
        floor(unix_timestamp(col("ts0")) / bucketSecs).cast("string"),
        lit("|"), col("n_turns").cast("string")).as("bkey"))

  /** B3: the no-blocking baseline — every record in ONE block, so the
    * pair join degenerates to the full cross product (reference:
    * BlockingScheme(single_block=True) [PK-med, SURVEY.md §0]). Tiny-
    * scale correctness baseline ONLY: it is the quadratic design every
    * other operator here exists to avoid; candidatePairs must be called
    * with an uncapped PairConfig for it to pass anything through.
    */
  def singleBlock(records: DataFrame): DataFrame =
    records.select(col("conv_id"), lit("ALL").as("bkey"))

  /** All block families unioned (strong ∪ rare-token ∪ LSH ∪ time). */
  def allBlocks(records: DataFrame, tokenDfCap: Int = DefaultTokenDfCap): DataFrame =
    strongBlocks(records)
      .unionByName(tokenBlocks(records, tokenDfCap))
      .unionByName(minhashBlocks(records))
      .unionByName(timeBlocks(records))

  /** Per-key block sizes — telemetry + input to the cap/salt decisions
    * (reference BlockingScheme.max_block_size analogue).
    */
  def blockSizes(blocks: DataFrame): DataFrame =
    blocks.groupBy("bkey").agg(count(lit(1)).as("block_size"))
}
