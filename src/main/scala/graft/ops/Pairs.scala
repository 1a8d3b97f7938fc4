package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** J1–J3 (SURVEY.md §2.5): within-block candidate-pair generation.
  *
  * The reference compares records procedurally inside each block
  * (reference: entityresolution.py::rswoosh nested loop [PK-high]); here
  * it is a self equi-join on the block key with `a.conv_id < b.conv_id`
  * dedup of unordered pairs, followed by a cross-key `dropDuplicates`
  * (one pair can share many keys).
  *
  * Skew defense in depth (SURVEY.md §7.4, BASELINE.json north_star):
  *  1. oversized blocks (> `blockSizeCap`) are DROPPED with telemetry —
  *     the reference's max_block_size semantics;
  *  2. kept-but-hot blocks (> `hotThreshold`) go through a *salted*
  *     self-join: each side is replicated across salt buckets so no
  *     single shuffle key carries a whole hot block, with full cross-salt
  *     pair completion (no pairs lost);
  *  3. AQE skew-join splitting backs the cold path at runtime.
  */
object Pairs {

  case class PairConfig(
      blockSizeCap: Int = 1000,
      hotThreshold: Int = 64,
      saltBuckets: Int = 8)

  /** Self-join within block keys → distinct unordered pairs (a_id < b_id).
    *
    * Single-pass over the block table (round-1 VERDICT "What's wrong" #5:
    * the sizes agg, the cold branch and the hot branch each rescanned —
    * and at pipeline depth re-derived — `blocks`, making the pairs phase
    * the slowest e2e stage). Blocks are sized with a partial aggregation
    * (map-side combine: the shuffled sizes table is one row per DISTINCT
    * key) joined back onto the block table — NOT a window: a
    * count-over-partition window buffers each block in a single task's
    * sorter and window partitions don't AQE-split, so one degenerate hot
    * key (an adversarial band/time bucket at 100 TB) becomes a straggler
    * holding its whole block in memory (round-2 VERDICT "What's wrong"
    * #4). The agg+join shape keeps every stage AQE-splittable and the
    * over-cap keys never rejoin at all (the filter runs on the tiny
    * sizes side, before the join fans back out). The sized table is
    * persisted once and consumed by both branches, and the result is
    * materialized eagerly (localCheckpoint) so the cache can be dropped
    * immediately. Callers that need durability re-write the slim
    * (a_id, b_id) output to their own checkpoint — cheap relative to
    * re-deriving the block table per consumer.
    */
  def candidatePairs(blocks: DataFrame, cfg: PairConfig = PairConfig()): DataFrame = {
    val keptSizes = Blocking.blockSizes(blocks)
      .filter(col("block_size") <= cfg.blockSizeCap)
    val sized = blocks.join(keptSizes, "bkey")
      .select(col("bkey"), col("conv_id"), col("block_size"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // one cheap agg over the cache decides whether the salted hot path
      // is needed at all (usually not below bench scale)
      val hotRows = sized.filter(col("block_size") > cfg.hotThreshold).count()
      val cold = sized.filter(col("block_size") <= cfg.hotThreshold)
        .select(col("bkey"), col("conv_id"))
      val pairs =
        if (hotRows == 0) joinWithin(cold)
        else {
          val hot = sized.filter(col("block_size") > cfg.hotThreshold)
            .select(col("bkey"), col("conv_id"))
          joinWithin(cold).unionByName(saltedJoinWithin(hot, cfg.saltBuckets))
        }
      pairs.dropDuplicates("a_id", "b_id").localCheckpoint(true)
    } finally sized.unpersist(false)
  }

  /** Plan-evidence variant of candidatePairs (graft.PlanDump): the
    * identical dataflow minus the persist and eager-localCheckpoint
    * seams, which truncate explain output to a scan of the checkpointed
    * RDD, and minus the runtime hotRows branch — BOTH the cold
    * equi-join and the salted hot path appear statically in the plan.
    * NOT for production use: without the persist every subtree
    * recomputes the sized table.
    */
  private[graft] def candidatePairsForExplain(blocks: DataFrame,
      cfg: PairConfig = PairConfig()): DataFrame = {
    val keptSizes = Blocking.blockSizes(blocks)
      .filter(col("block_size") <= cfg.blockSizeCap)
    val sized = blocks.join(keptSizes, "bkey")
      .select(col("bkey"), col("conv_id"), col("block_size"))
    val cold = sized.filter(col("block_size") <= cfg.hotThreshold)
      .select(col("bkey"), col("conv_id"))
    val hot = sized.filter(col("block_size") > cfg.hotThreshold)
      .select(col("bkey"), col("conv_id"))
    joinWithin(cold).unionByName(saltedJoinWithin(hot, cfg.saltBuckets))
      .dropDuplicates("a_id", "b_id")
  }

  /** Count of conversations in dropped (oversized) blocks — must be
    * reported, never silent (SURVEY.md §7.4 risk 2).
    */
  def droppedBlockStats(blocks: DataFrame, cfg: PairConfig = PairConfig()): DataFrame =
    Blocking.blockSizes(blocks)
      .filter(col("block_size") > cfg.blockSizeCap)
      .agg(count(lit(1)).as("dropped_blocks"),
        coalesce(sum(col("block_size")), lit(0L)).as("dropped_rows"))

  private def joinWithin(blocks: DataFrame): DataFrame = {
    val a = blocks.select(col("bkey"), col("conv_id").as("a_id"))
    val b = blocks.select(col("bkey"), col("conv_id").as("b_id"))
    a.join(b, Seq("bkey")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
  }

  /** Salted within-block self-join with cross-salt completion.
    *
    * Row with salt u joins as the a-side under keys (bkey, u, j) ∀ j ≥ u
    * and as the b-side under keys (bkey, i, u) ∀ i ≤ u. Every unordered
    * pair (salts u ≤ v) meets exactly under (bkey, u, v); the
    * `a_id < b_id` filter dedups the u == v bucket. Replication factor
    * (s+1)/2 per side, shuffle key fan-out s(s+1)/2 per hot block.
    */
  def saltedJoinWithin(blocks: DataFrame, s: Int): DataFrame = {
    val salted = blocks.withColumn("salt",
      pmod(xxhash64(col("conv_id")), lit(s.toLong)).cast("int"))
    val aSide = salted
      .withColumn("j", explode(sequence(col("salt"), lit(s - 1))))
      .select(col("bkey"), col("salt").as("i"), col("j"), col("conv_id").as("a_id"))
    val bSide = salted
      .withColumn("i", explode(sequence(lit(0), col("salt"))))
      .select(col("bkey"), col("i"), col("salt").as("j"), col("conv_id").as("b_id"))
    // the join's sides are salt-ordered, not id-ordered: a pair whose
    // smaller conv_id carries the larger salt meets with the ids swapped,
    // so canonicalize (min, max) AFTER the join instead of filtering a<b
    aSide.join(bSide, Seq("bkey", "i", "j"))
      .filter(col("a_id") =!= col("b_id"))
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"))
  }

  /** J3: hydrate pairs with the per-conversation feature columns needed
    * by scoring. Two equi-joins; Catalyst/AQE broadcast if small.
    *
    * Ships `token_ids` (sorted 64-bit token hashes), NOT the string
    * token_set: tokens dominated the shuffled/cached bytes per pair, and
    * memory traffic was the measured non-scaling term at 32 cores
    * (BENCH.md round 1). Jaccard over the id arrays is value-identical
    * (Features.dictEncode).
    */
  def hydrate(pairs: DataFrame, records: DataFrame): DataFrame = {
    val slim = records.select(
      col("conv_id"), col("token_ids"), col("first_text"),
      col("strong_keys"), col("ts0"), col("n_turns"))
    val a = slim.toDF(slim.columns.map("a_" + _): _*)
    val b = slim.toDF(slim.columns.map("b_" + _): _*)
    pairs
      .join(a, col("a_id") === col("a_conv_id")).drop("a_conv_id")
      .join(b, col("b_id") === col("b_conv_id")).drop("b_conv_id")
  }
}
