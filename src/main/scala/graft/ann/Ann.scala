package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.util.Hashing

/** Similarity search over an embedding column (array<float>):
  * brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH-bucketed variant as the scale path.
  *
  * Dot products are pure Catalyst (`aggregate` + `zip_with` HOFs) in
  * double precision with a sequential left fold — the same evaluation
  * order DuckDB uses, so similarities match the oracle bit-for-bit
  * before rounding.
  */
object Ann {

  /** Cosine similarity of two double arrays (0 when either norm is 0). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v * v))
    when(na > 0 && nb > 0, dot / (na * nb)).otherwise(lit(0.0))
  }

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Exact brute-force top-k: the small query side is broadcast against
    * the corpus; ranking is (cosine desc, vec_id asc) — fully
    * deterministic under ties.
    */
  def bruteTopK(embeddings: DataFrame, queryMaxId: Long, k: Int): DataFrame = {
    val corpus = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val queries = corpus.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val scored = corpus.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("q_emb"), col("emb")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    // row_number() is int32 in Spark, BIGINT in DuckDB — cast to match
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor"),
        round(col("cos"), 6).as("cos"))
  }

  /** Deterministic Rademacher hyperplanes: sign(Hashing.mix(seed, plane,
    * dim)) ∈ {-1, +1}, materialized as literal arrays (no fitted model,
    * no RNG state — reproducible on any cluster).
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] =
    (0 until numPlanes).map(p => (0 until dim).map(d =>
      if (Hashing.mix(seed, p.toLong, d.toLong) >= 0) 1.0 else -1.0))

  /** LSH bucket id: numPlanes sign bits of plane·embedding. */
  def lshBucket(emb: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
      val dot = aggregate(zip_with(emb, planeCol, (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k: candidates restricted to the query's LSH bucket
    * NEIGHBORHOOD, then exact cosine re-rank. `probes` = how many
    * buckets each query searches: its own plus the buckets at Hamming
    * distance 1 (each sign bit flipped) — classic multi-probe LSH, which
    * recovers the near-misses where one hyperplane falls between the
    * query and a true neighbor (single-probe recall was the round-1
    * named watch-item). Cost grows linearly with probes on the QUERY
    * (small, broadcast) side only; each corpus vector still lives in
    * exactly one bucket, so probe buckets are disjoint and no result
    * dedup is needed. The ranking of returned rows is exact.
    */
  def lshTopK(embeddings: DataFrame, queryMaxId: Long, k: Int,
      numPlanes: Int = 6, dim: Int = 64, probes: Int = 7): DataFrame = {
    val nProbes = math.max(1, math.min(probes, numPlanes + 1))
    val planes = hyperplanes(numPlanes, dim)
    val corpus = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .withColumn("bucket", lshBucket(col("emb"), planes))
    val probeBuckets = array(
      col("bucket") +: (0 until nProbes - 1).map(i =>
        col("bucket").bitwiseXOR(lit(1L << i))): _*)
    val queries = corpus.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        explode(probeBuckets).as("q_bucket"))
    val scored = corpus.join(broadcast(queries),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("q_emb"), col("emb")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor"),
        round(col("cos"), 6).as("cos"))
  }
}
