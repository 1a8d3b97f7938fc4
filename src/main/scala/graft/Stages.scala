package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.ops._

/** Session-scoped cache of the heavy intermediates shared by many
  * `SparkEntry.queries` entries (records, candidate universe, scored
  * pairs, CC labels). Verify and Bench run ~30 queries sequentially in
  * one SparkSession; without this every query would recompute
  * collapse+features from raw turns — the cache mirrors what the
  * production pipeline gets from its stage checkpoints.
  *
  * Persisted MEMORY_AND_DISK and keyed by (stage, sfDir); deterministic
  * inputs ⇒ cache reuse never changes results.
  */
object Stages {

  private val cache = TrieMap[(String, String), DataFrame]()

  def cached(name: String, dir: String)(f: => DataFrame): DataFrame =
    cache.getOrElseUpdate((name, dir), {
      val df = f.persist(StorageLevel.MEMORY_AND_DISK)
      // materialize eagerly at the plan's own parallelism so a later
      // single-partition consumer (e.g. a repartition(1) write) can't be
      // the first to compute it
      df.count()
      df
    })

  def records(s: SparkSession, dir: String): DataFrame =
    cached("records", dir) {
      Features.enrich(Collapse.collapse(Tiers.transcriptsFor(s, dir)))
    }

  /** Cached block families. tokenBlocks is the expensive one (token
    * explode + df-cap agg + join — ~26 s at sf0.1); without the cache it
    * re-derives for every consumer (er_blocks_token, er_dropped_blocks,
    * er_pairs_universe3, the universe itself), which both wastes work
    * and mis-attributes it to whichever query runs first (round-2
    * VERDICT "What's wrong" #3).
    */
  def strongBlocks(s: SparkSession, dir: String): DataFrame =
    cached("blocks_strong", dir)(Blocking.strongBlocks(records(s, dir)))

  def tokenBlocks(s: SparkSession, dir: String): DataFrame =
    cached("blocks_token", dir)(Blocking.tokenBlocks(records(s, dir)))

  def timeBlocks(s: SparkSession, dir: String): DataFrame =
    cached("blocks_time", dir)(Blocking.timeBlocks(records(s, dir)))

  /** SQL-expressible candidate universe: strong-key ∪ rare-token pairs.
    * Runs the PRODUCTION pair config (block cap + hot-block salting) —
    * round-1 VERDICT flagged the uncapped oracle path as a quadratic
    * risk shape; the oracle SQL mirrors the cap (HAVING count ≤ cap on
    * strong keys; token blocks are df-capped already), which never binds
    * at the t2 tier so results are unchanged.
    */
  def sqlUniversePairs(s: SparkSession, dir: String): DataFrame =
    cached("sql_universe", dir) {
      Pairs.candidatePairs(
        strongBlocks(s, dir).unionByName(tokenBlocks(s, dir)))
    }

  def sqlUniverseScored(s: SparkSession, dir: String): DataFrame =
    cached("sql_scored", dir) {
      Scoring.score(Pairs.hydrate(sqlUniversePairs(s, dir), records(s, dir)))
    }

  /** Full candidate pairs (strong ∪ capped-token ∪ MinHash-LSH ∪ time
    * blocks), composed as the cached SQL universe ∪ the pairs the
    * minhash/time families add. Equivalent to running candidatePairs
    * over all four families at once: block families have disjoint bkey
    * namespaces (T:/W: vs M|/H:), so every block's size — and therefore
    * its cap/salt fate — is the same whether its family is sized alone
    * or in the union, and the final dropDuplicates gives the same pair
    * set either way (StagesSpec pins this against the direct
    * derivation). Skips re-sizing and re-joining the strong/token
    * blocks that sqlUniversePairs already paid for.
    */
  def fullPairs(s: SparkSession, dir: String): DataFrame =
    cached("full_pairs", dir) {
      val weakPairs = Pairs.candidatePairs(
        Blocking.minhashBlocks(records(s, dir))
          .unionByName(timeBlocks(s, dir)))
      sqlUniversePairs(s, dir).unionByName(weakPairs)
        .dropDuplicates("a_id", "b_id")
        .localCheckpoint(true)
    }

  /** Full scored universe = the already-scored SQL universe plus the
    * scored delta. Sound because (a) sqlUniversePairs ⊆ fullPairs — the
    * block families have disjoint bkey namespaces (T:/W: vs M|/H:), so
    * adding the minhash/time families never changes a strong/token
    * block's size and therefore never changes its cap/salt fate — and
    * (b) Scoring.score is a pure row-wise function of the hydrated pair.
    * The two universes overlap ~96% at every tier, so this scores ~4% of
    * the pairs the direct derivation would (measured: full_scored warmup
    * 87–142 s → 16.7 s at sf0.1); StagesSpec pins multiset equality with
    * the direct derivation.
    */
  def fullScored(s: SparkSession, dir: String): DataFrame =
    cached("full_scored", dir) {
      val extra = fullPairs(s, dir).join(
        sqlUniversePairs(s, dir), Seq("a_id", "b_id"), "left_anti")
      sqlUniverseScored(s, dir).unionByName(
        Scoring.score(Pairs.hydrate(extra, records(s, dir))))
    }

  def ccFull(s: SparkSession, dir: String): DataFrame =
    cached("cc_full", dir) {
      val recs = records(s, dir)
      ConnectedComponents.run(
        Scoring.matchEdges(sqlUniverseScored(s, dir)),
        recs.select(org.apache.spark.sql.functions.col("conv_id")))
    }

  /** Cached document shingle sets + MinHash bands, shared by the dedup
    * family (round-3 VERDICT "What's wrong" #5: dedup_ngram and
    * dedup_minhash each re-ran the interpreted shingling HOF — and the
    * md5 MinHash bank — over the whole documents table, re-paying
    * 15–25 s per query at bench tier). Shingling is computed once here;
    * consumers filter/project what they need.
    */
  def docShingles(s: SparkSession, dir: String): DataFrame =
    cached("doc_shingles", dir) {
      import org.apache.spark.sql.functions._
      s.read.parquet(s"$dir/documents.parquet")
        .withColumn("shingles", array_distinct(
          Features.shingles(graft.text.TextOps.docTokens(col("text")), 3)))
        .withColumn("bands", graft.functions.MinHashBands.minhashBands(
          col("shingles"), Features.NumBands, Features.RowsPerBand))
        .select(col("doc_id"), col("shingles"), col("bands"))
    }
}
