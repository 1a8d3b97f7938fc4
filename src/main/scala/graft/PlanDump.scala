package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-evidence + isolated-timing harness for optimization rounds:
  * writes .explain("formatted") of named SparkEntry queries to
  * `<outDir>/<query>_<suffix>.txt` and times each query through the
  * noop sink (guide §1.4 — computes every column of every row, no sink
  * cost, full plan in the SQL tab). Bench.scala itself is frozen for
  * measurement, so extra-isolation numbers live here and are cited in
  * OPTIMIZATION_rNN.md.
  *
  * Each query is first executed through its OWN QueryExecution
  * (qe.toRdd.count) so AQE finalizes the adaptive plan — the dumped
  * plan is the executed plan, with final join strategies and
  * AQEShuffleRead nodes, not the isFinalPlan=false initial guess.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <query...>
  * Env: SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_CPUS (default 8).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query...>")
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val master = s"local[$cpus]"
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .config(graft.util.LocalHardening.resilienceFor(master))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    // Internal plan subjects: some operators end in an EAGER
    // localCheckpoint (candidate machinery), which truncates their
    // query-level explain to a scan of the checkpointed RDD. These
    // entries rebuild the interesting inner dataflow WITHOUT the
    // persist/checkpoint seams so the join shape (sized agg+join, cap
    // filter, salted hot path) is visible in the dumped plan.
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{col, explode}
    val xtra: Map[String, (SparkSession, String) => DataFrame] = Map(
      "xtra_dedup_minhash_join" -> ((s, dir) =>
        graft.ops.Pairs.candidatePairsForExplain(
          Stages.docShingles(s, dir).select(col("doc_id").as("conv_id"),
            explode(col("bands")).as("bkey")))),
      "xtra_dedup_simhash_join" -> ((s, dir) =>
        graft.ops.Pairs.candidatePairsForExplain(
          graft.dedup.Dedup.simhashBuckets(graft.dedup.Dedup.simhashDocs(
            s.read.parquet(s"$dir/documents.parquet")))))
    )

    names.foreach { n =>
      val fn = xtra.getOrElse(n, SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query: $n")))
      spark.sparkContext.setJobDescription(s"plandump: $n (finalize)")
      val df = fn(spark, sfDir)
      val qe = df.queryExecution
      val t0 = System.nanoTime()
      qe.toRdd.count() // finalizes THIS QueryExecution's adaptive plan
      val firstSec = (System.nanoTime() - t0) / 1e9
      // noop-sink repeats: steady-state compute-only timing (§1.4)
      val noopTimes = (1 to 3).map { i =>
        spark.sparkContext.setJobDescription(s"plandump: $n (noop $i)")
        val t = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t) / 1e9
      }
      val plan = qe.explainString(ExplainMode.fromString("formatted"))
      val header =
        f"== $n @ $sfDir cpus=$cpus (executed plan; first-exec ${firstSec}%.2f s; " +
          f"noop repeats ${noopTimes.map(t => f"$t%.2f").mkString("/")} s) ==%n"
      Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), header + plan)
      System.err.println(f"[plandump] $n first ${firstSec}%.2f s noop " +
        noopTimes.map(t => f"$t%.2f").mkString("/") + s" -> ${n}_$suffix.txt")
      System.gc() // same ContextCleaner story as Bench between queries
    }
    spark.stop()
  }
}
