package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole forked test JVM. */
object TestSpark {
  // single master val feeding BOTH .master() and resilienceFor() — two
  // literals can drift and silently key the hardening off the wrong
  // master string (round-5 ADVICE item 4)
  private val master = "local[4]"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      // starvation-proof the in-process executor (see LocalHardening)
      .config(graft.util.LocalHardening.resilienceFor(master))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
