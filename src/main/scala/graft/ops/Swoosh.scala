package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merge-enabled re-scoring — the R-Swoosh semantic the plain
  * pairwise-CC pipeline cannot express (reference:
  * entityresolution.py::rswoosh [PK-high, SURVEY.md §0]; gap analysis in
  * SURVEY.md §7.4 risk 1): a MERGED record (union of feature sets) can
  * match records neither member matched alone, e.g. fragments
  * A={a,b,c,d}, B={e,f,g,h} (strong-linked) and C={a,b,e,f} — C clears
  * the Jaccard threshold only against A∪B.
  *
  * The reference reaches the fixpoint with an in-memory compare/merge
  * queue; here each round is the distributed pipeline re-run at ENTITY
  * granularity: fuse (Entities.fuse) → re-block the fused value sets →
  * re-score → re-cluster the entity graph → relabel members. Entity
  * counts shrink monotonically, so rounds are cheap relative to the
  * record-level pass, and one round captures the common fragment-bridge
  * cases; run to fixpoint with `refineToFixpoint`.
  */
object Swoosh {

  /** One re-score round over fused entities. `labels` is any
    * (conv_id, entity_id) labeling with canonical min-conv_id ids; the
    * result keeps that canonical form (min of mins).
    */
  def refine(records: DataFrame, labels: DataFrame,
      jaccardThreshold: Double = Scoring.DefaultJaccardThreshold,
      tokenDfCap: Int = Blocking.DefaultTokenDfCap,
      pairCfg: Pairs.PairConfig = Pairs.PairConfig()): DataFrame = {
    val entities = Entities.fuse(records, labels)
    // entity-level records: the fused value sets play the per-record role
    val erecs = entities.select(
      col("entity_id").as("conv_id"),
      col("token_union").as("token_set"),
      graft.ops.Features.dictEncode(col("token_union")).as("token_ids"),
      col("strong_keys_union").as("strong_keys"))
    val blocks = Blocking.strongBlocks(erecs)
      .unionByName(Blocking.tokenBlocks(erecs, tokenDfCap))
    val pairs = Pairs.candidatePairs(blocks, pairCfg)
    // lean hydration: entity matching needs only the two value sets
    val slim = erecs.select(col("conv_id"), col("token_ids"), col("strong_keys"))
    val a = slim.toDF(slim.columns.map("a_" + _): _*)
    val b = slim.toDF(slim.columns.map("b_" + _): _*)
    val hyd = pairs
      .join(a, col("a_id") === col("a_conv_id")).drop("a_conv_id")
      .join(b, col("b_id") === col("b_conv_id")).drop("b_conv_id")
    val edges = hyd.filter(
        arrays_overlap(col("a_strong_keys"), col("b_strong_keys")) ||
          Scoring.jaccard(col("a_token_ids"), col("b_token_ids")) >= jaccardThreshold)
      .select(col("a_id"), col("b_id"))
    val refined = ConnectedComponents.run(edges, entities.select(col("entity_id")))
      .select(col("conv_id").as("old_id"), col("entity_id").as("new_id"))
    labels.select(col("conv_id"), col("entity_id").as("old_id"))
      .join(refined, "old_id")
      .select(col("conv_id"), col("new_id").as("entity_id"))
  }

  /** Iterate refine until the labeling stops changing (bounded) — the
    * swoosh fixpoint. Fixpoint test is one cheap order-independent
    * signature agg per round, mirroring ConnectedComponents.
    */
  def refineToFixpoint(records: DataFrame, labels: DataFrame,
      maxRounds: Int = 5,
      jaccardThreshold: Double = Scoring.DefaultJaccardThreshold): DataFrame = {
    def sig(l: DataFrame): (Long, Long) = {
      val r = l.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("conv_id"), col("entity_id"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var cur = labels.localCheckpoint(true)
    var s = sig(cur)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      round += 1
      val next = refine(records, cur, jaccardThreshold).localCheckpoint(true)
      val ns = sig(next)
      converged = ns == s
      s = ns
      cur = next
    }
    cur
  }
}
