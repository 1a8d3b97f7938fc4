package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops._
import graft.pipeline.Pipeline

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (or a
  * training-data-pipeline op) run at the tier mapped from sfDir
  * (Tiers.tierFor); `oracleSql` gives the DuckDB-equivalent SQL. ER
  * queries run over the deterministically generated transcript corpus,
  * which Tiers materializes to parquet so DuckDB can read the identical
  * bytes via read_parquet().
  */
object SparkEntry {

  /** Flagship: full ER pipeline at the t1 tier → entity labels. */
  def entry(spark: SparkSession): DataFrame = {
    val tier = Tiers.T1
    val transcripts = Tiers.ensureTranscripts(spark, tier)
    Pipeline.run(spark, transcripts,
      Pipeline.Config(checkpointRoot = s"/root/repo/target/graft-ckpt/${tier.name}"))
  }

  /** Shared per-query plumbing: generated transcripts for the sfDir tier. */
  private def records(spark: SparkSession, sfDir: String): DataFrame =
    Features.enrich(Collapse.collapse(Tiers.transcriptsFor(spark, sfDir)))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "er_collapse" -> ((s, dir) => {
      records(s, dir).select(col("conv_id"), col("n_turns"), col("text_all"))
    }),
    "er_strong_keys" -> ((s, dir) => {
      records(s, dir).select(col("conv_id"),
        coalesce(try_element_at(col("strong_keys"), lit(1)), lit("")).as("strong_key"))
    }),
    "er_cc_strong" -> ((s, dir) => {
      val recs = records(s, dir)
      val edges = Pairs.candidatePairs(Blocking.strongBlocks(recs))
      ConnectedComponents.run(edges, recs.select(col("conv_id")))
    }),
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
          count(lit(1)).as("n"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "er_collapse" ->
      """SELECT conv_id, count(*)::INT AS n_turns,
        |  string_agg(text, ' ' ORDER BY turn_idx) AS text_all
        |FROM read_parquet('/root/repo/target/graft-data/t2/transcripts.parquet/*.parquet')
        |GROUP BY conv_id""".stripMargin,
    "er_strong_keys" ->
      """SELECT conv_id,
        |  coalesce('T:' || string_agg(tool, '|' ORDER BY turn_idx) FILTER (WHERE tool IS NOT NULL), '') AS strong_key
        |FROM read_parquet('/root/repo/target/graft-data/t2/transcripts.parquet/*.parquet')
        |GROUP BY conv_id""".stripMargin,
    "q1_agg" ->
      "SELECT l_returnflag, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty, count(*) AS n FROM lineitem GROUP BY l_returnflag"
  )
}
