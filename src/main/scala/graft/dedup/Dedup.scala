package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

import graft.ops.Features
import graft.text.TextOps

/** Deduplication operators for training-data pipelines over the
  * `documents` table: exact (hash-groupBy), n-gram Jaccard (shingle
  * inverted index), MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale notes (these run against ~100 TB in production):
  *  - nothing ever builds a per-group in-memory list; every "group" is a
  *    join key;
  *  - the shingle/token inverted indexes carry a document-frequency cap
  *    (identical semantics in the DuckDB oracle) so Zipf-hot shingles
  *    can't produce quadratic blow-ups;
  *  - MinHash-LSH is the scale path: candidate generation is linear in
  *    (docs × bands) and the exact-Jaccard verify only touches bucket
  *    collisions.
  */
object Dedup {

  /** Exact dedup on normalized text: md5 of the token sequence. Returns
    * one row per input doc: (doc_id, group_key, keep_id, group_size,
    * is_dup); `keep_id` = min doc_id of the group (canonical survivor).
    */
  def exact(documents: DataFrame): DataFrame = {
    val keyed = documents
      .withColumn("group_key",
        md5(concat_ws(" ", TextOps.docTokens(col("text")))))
    val w = Window.partitionBy(col("group_key"))
    keyed
      .withColumn("keep_id", min(col("doc_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_dup", col("doc_id") =!= col("keep_id"))
      .select("doc_id", "group_key", "keep_id", "group_size", "is_dup")
  }

  /** Exact 3-shingle Jaccard pairs ≥ tau via a shingle inverted index:
    * docs sharing ≥ 1 (df-capped) shingle are candidates; intersection
    * sizes come from the index join itself (count of shared shingles),
    * so no row ever carries both shingle sets. Output: (a_doc, b_doc,
    * jac) with jac an exact integer ratio — the DuckDB oracle reproduces
    * it bit-for-bit.
    */
  def ngramJaccardPairs(documents: DataFrame, tau: Double = 0.6,
      shingleDfCap: Int = 1000): DataFrame = {
    // shingling is an interpreted HOF (CodegenFallback) — compute it ONCE
    // and persist: sizes, the index's two join sides and the df-cap agg
    // would otherwise each re-shingle the corpus (measured 4× recompute
    // at bench tier)
    val sh = documents
      .withColumn("shingles",
        array_distinct(Features.shingles(TextOps.docTokens(col("text")), 3)))
      .select(col("doc_id"), col("shingles"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try ngramJaccardPairsFromShingles(sh, tau, shingleDfCap)
    finally sh.unpersist(false)
  }

  /** `ngramJaccardPairs` over a PRE-SHINGLED (and caller-persisted)
    * (doc_id, shingles) table — the session-cache path (graft.Stages
    * .docShingles) that lets the whole dedup family share one shingling
    * pass instead of re-paying it per query.
    */
  def ngramJaccardPairsFromShingles(shingled: DataFrame, tau: Double = 0.6,
      shingleDfCap: Int = 1000): DataFrame = {
    val sh = shingled.filter(size(col("shingles")) > 0)
      .select(col("doc_id"), col("shingles"))
    val sizes = sh.select(col("doc_id"), size(col("shingles")).as("n"))
    val ex = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
    val rare = ex.groupBy("s").count().filter(col("count") <= shingleDfCap)
      .select("s")
    val exCapped = ex.join(rare, "s")
    val inter = exCapped.as("a")
      .join(exCapped.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_doc"), col("b.doc_id").as("b_doc"))
      .agg(count(lit(1)).as("ci"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a_doc").withColumnRenamed("n", "na"), "a_doc")
      .join(sizes.withColumnRenamed("doc_id", "b_doc").withColumnRenamed("n", "nb"), "b_doc")
      .withColumn("jac",
        col("ci").cast("double") / (col("na") + col("nb") - col("ci")).cast("double"))
      .filter(col("jac") >= tau)
      .select(col("a_doc"), col("b_doc"), round(col("jac"), 6).as("jac"))
      .localCheckpoint(true)
  }

  /** MinHash+LSH near-dup pairs — the scale-path approximation of
    * `ngramJaccardPairs`: shingle-set MinHash signatures → band keys →
    * bucket self-join → exact shingle-Jaccard verify ≥ tau. Shingle
    * (not token) signatures keep LSH buckets O(dup-group size) under
    * Zipf vocabularies (see Features.NumBands scaling note); the verify
    * keeps precision exact. Output: (a_doc, b_doc, jac).
    */
  def minhashPairs(documents: DataFrame, tau: Double = 0.6): DataFrame = {
    // shingle + signature computed ONCE and persisted: the bucket join's
    // two sides and the verify hydration's two sides would otherwise
    // each re-run the interpreted shingling HOF over the whole corpus
    val docs = documents
      .withColumn("shingles",
        array_distinct(Features.shingles(TextOps.docTokens(col("text")), 3)))
      .withColumn("bands", graft.functions.MinHashBands.minhashBands(
        col("shingles"), Features.NumBands, Features.RowsPerBand))
      .select(col("doc_id"), col("shingles"), col("bands"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try minhashPairsFromShingles(docs, tau)
    finally docs.unpersist(false)
  }

  /** `minhashPairs` over a PRE-COMPUTED (and caller-persisted)
    * (doc_id, shingles, bands) table — the graft.Stages.docShingles
    * session-cache path.
    */
  def minhashPairsFromShingles(docs: DataFrame, tau: Double = 0.6): DataFrame = {
    val buckets = docs.select(col("doc_id"), explode(col("bands")).as("bkey"))
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_doc"), col("b.doc_id").as("b_doc"))
      .dropDuplicates("a_doc", "b_doc")
    val slim = docs.select(col("doc_id"), col("shingles"))
    cand
      .join(slim.toDF("a_doc", "a_set"), "a_doc")
      .join(slim.toDF("b_doc", "b_set"), "b_doc")
      .withColumn("jac",
        size(array_intersect(col("a_set"), col("b_set"))).cast("double") /
          size(array_union(col("a_set"), col("b_set"))).cast("double"))
      .filter(col("jac") >= tau)
      .select(col("a_doc"), col("b_doc"), round(col("jac"), 6).as("jac"))
      .localCheckpoint(true)
  }

  /** SimHash near-dup pairs: 64-bit SimHash over the token multiset;
    * pairs from 4×16-bit band buckets (any pair at Hamming distance ≤ 3
    * must agree on ≥ 1 of 4 bands — pigeonhole); verify
    * bit_count(a XOR b) ≤ maxHamming. Built on the md5-derived token
    * hash (Features.md5Long64), so the WHOLE operator — signature, band
    * buckets, Hamming filter — is reproduced bit-exactly by the DuckDB
    * oracle (no weaker rows-only check). Token-less docs are excluded:
    * they carry no signal and would otherwise all collide at sim = 0.
    */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    // simhash64 is a 64-bit-per-token interpreted HOF fold — by far the
    // most expensive per-doc feature here; both join sides read it from
    // this one persisted pass
    val docs = documents
      .withColumn("toks", TextOps.docTokens(col("text")))
      .filter(size(col("toks")) > 0)
      .withColumn("sim", Features.simhash64(col("toks")))
      .select("doc_id", "sim")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bands = docs.select(col("doc_id"), col("sim"),
      explode(array((0 until 4).map(b =>
        concat_ws(":", lit(b),
          shiftrightunsigned(col("sim"), b * 16).bitwiseAND(lit(0xFFFFL)))): _*))
        .as("bkey"))
    try {
      bands.as("a")
        .join(bands.as("b"),
          col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_doc"), col("b.doc_id").as("b_doc"),
          bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).cast("long").as("hamming"))
        .dropDuplicates("a_doc", "b_doc")
        .filter(col("hamming") <= maxHamming)
        .localCheckpoint(true)
    } finally docs.unpersist(false)
  }

  /** Embedding-cosine near-dup pairs within a blocking column (e.g.
    * `label` — at scale this would be an IVF/LSH bucket): exact cosine
    * in double precision, sequential fold, matching DuckDB's
    * list_cosine_similarity on DOUBLE[] bit-for-bit.
    */
  def embeddingCosinePairs(embeddings: DataFrame, tau: Double,
      blockCol: String = "label"): DataFrame = {
    val e = embeddings.select(col("vec_id"), col(blockCol).as("blk"),
      transform(col("embedding"), x => x.cast("double")).as("emb"))
    e.as("a").join(e.as("b"),
        col("a.blk") === col("b.blk") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_vec"), col("b.vec_id").as("b_vec"),
        graft.ann.Ann.cosine(col("a.emb"), col("b.emb")).as("cos"))
      .filter(col("cos") >= tau)
      .select(col("a_vec"), col("b_vec"), round(col("cos"), 6).as("cos"))
  }
}
