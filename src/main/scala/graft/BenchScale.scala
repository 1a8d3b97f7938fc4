package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ops._

/** Throughput-scaling evidence for the BASELINE.json north_rule: the
  * same job at two parallelism levels on identical input. The sandbox
  * has no multi-executor cluster, so (per driver instruction) N vs 4N
  * executors is evidenced as local[8] vs local[32] on the same generated
  * corpus; efficiency = (pairs/s @ 32c ÷ pairs/s @ 8c) / 4.
  *
  * Usage: runMain graft.BenchScale <cores> [tierName]
  * Prints one JSON line: {"cores","tier","n_pairs","scoring_sec",
  * "pairs_per_sec","e2e_sec"}.
  *
  * The headline metric is candidate-pairs SCORED per second
  * (BASELINE.json:2): inputs (records, candidate pairs) are materialized
  * before the timer; the timed section is exactly the batched scoring
  * pass (hydrate + features + Jaro-Winkler/Levenshtein/Jaccard + rule),
  * after a warm-up run to exclude JIT noise.
  */
object BenchScale {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 8
    val tier = if (args.length > 1) args(1) match {
      case "t1" => Tiers.T1
      case "t2" => Tiers.T2
      case _ => Tiers.Bench
    } else Tiers.Bench

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tE2e0 = System.nanoTime()
    val transcripts = Tiers.ensureTranscripts(spark, tier)

    val records = Features.enrich(Collapse.collapse(transcripts))
      .persist(StorageLevel.MEMORY_AND_DISK)
    records.count()

    val pairs = Pairs.candidatePairs(Blocking.allBlocks(records))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nPairs = pairs.count()

    def scoreOnce(): Long =
      Scoring.score(Pairs.hydrate(pairs, records))
        .filter(col("is_match")).count()

    scoreOnce() // warm-up (JIT + codegen compile)
    val t0 = System.nanoTime()
    val nMatches = scoreOnce()
    val scoringSec = (System.nanoTime() - t0) / 1e9

    // end-to-end through clustering (not part of the throughput metric,
    // reported for context)
    val edges = Scoring.matchEdges(
      Scoring.score(Pairs.hydrate(pairs, records)))
    val labels = ConnectedComponents.run(edges, records.select(col("conv_id")))
    val nEntities = labels.select("entity_id").distinct().count()
    val e2eSec = (System.nanoTime() - tE2e0) / 1e9

    val pps = nPairs / scoringSec
    println(s"""{"cores":$cores,"tier":"${tier.name}","n_pairs":$nPairs,""" +
      s""""n_matches":$nMatches,"n_entities":$nEntities,""" +
      s""""scoring_sec":$scoringSec,"pairs_per_sec":$pps,"e2e_sec":$e2eSec}""")
    spark.stop()
  }
}
