package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R3/A1 (SURVEY.md §2.2/§2.6): record fusion — the materialized entity
  * table. The reference's core data structure is the merged record:
  * union of the members' feature value-sets plus provenance of the
  * merged source rows (reference: python/pairwise_features.py::
  * Record.merge [PK-high, SURVEY.md §0] — `line_indices` union +
  * per-feature set union).
  *
  * Spark formulation: one hash aggregate keyed by entity_id. The union
  * aggregates (collect_list → flatten → array_distinct → array_sort) are
  * associative and commutative, so Spark executes them as partial +
  * final aggregation — map-side combine keeps the shuffle proportional
  * to the number of entities, not records. Sorted-array canonical form
  * keeps output partition-order-independent (SURVEY.md §7.4).
  */
object Entities {

  /** records (Features.enrich output) × labels(conv_id, entity_id) →
    * entities(entity_id, members, n_members, token_union,
    * strong_keys_union).
    *
    * `members` is the provenance set (the reference's line_indices);
    * the two unions are the fused weak/strong feature value-sets. This
    * is also the input a swoosh-style re-score loop would consume
    * (SURVEY.md §7.4 mitigation 1).
    *
    * The collect_list buffers are linear in cluster size, so one
    * over-merged component would blow the final-agg task at 100 TB
    * (round-2 VERDICT "What's wrong" #5): clusters above
    * `clusterSizeCap` are excluded, loudly (ErMetrics dropped-cluster
    * telemetry pattern). Never binds on healthy labelings.
    */
  def fuse(records: DataFrame, labels: DataFrame,
      clusterSizeCap: Int = ErMetrics.DefaultClusterSizeCap): DataFrame = {
    val dRow = ErMetrics.droppedClusterStats(labels, clusterSizeCap).head()
    if (dRow.getLong(0) > 0) {
      System.err.println(s"[entities] excluded ${dRow.getLong(0)} over-cap " +
        s"clusters (${dRow.getLong(1)} records) from fusion at " +
        s"clusterSizeCap=$clusterSizeCap")
    }
    records
      .select(col("conv_id"), col("token_set"), col("strong_keys"))
      .join(ErMetrics.capClusters(labels, clusterSizeCap), "conv_id")
      .groupBy(col("entity_id"))
      .agg(
        sort_array(collect_list(col("conv_id"))).as("members"),
        count(lit(1)).as("n_members"),
        array_sort(array_distinct(flatten(collect_list(col("token_set")))))
          .as("token_union"),
        array_sort(array_distinct(flatten(collect_list(col("strong_keys")))))
          .as("strong_keys_union"))
  }
}
