package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase distributed dense rank — the standard zipWithIndex plan:
  * range-partition the distinct keys (globally ordered partitions),
  * row_number WITHIN each partition, then add broadcast
  * per-partition-count offsets. Equivalent to
  * `dense_rank().over(Window.orderBy(key))` on the distinct keys but with
  * NO single-partition Exchange or global Sort on the key domain — the
  * global-window form funnels every distinct key through one task, which
  * dies when the domain grows with the data. Used by q48's surrogate
  * tokenizer (PlanShapeSuite asserts the plan shape; PropertySuite checks
  * rank semantics on random key sets).
  */
object DistributedRank {

  /** One row per DISTINCT value of `key` in `df`, with `token` = its
    * 1-based dense rank in ascending key order. `key` must not be named
    * `token` (the emitted rank column) or carry the reserved `graft_`
    * prefix. */
  def denseTokens(df: DataFrame, key: String): DataFrame = {
    require(key != "token" && !key.startsWith("graft_"),
      "denseTokens emits `token` and uses graft_-prefixed working columns")
    // eager checkpoint pins the range-partition boundaries AND the
    // spark_partition_id values: the frame feeds both the token join and
    // the offset aggregation, and a recompute could re-sample different
    // range boundaries between the two consumers. One row per distinct
    // key — small at any scale; on a cluster checkpoint() durable.
    val local = df.select(key).distinct()
      .repartitionByRange(col(key))
      .withColumn("graft_pid", spark_partition_id())
      .withColumn("graft_lrn",
        row_number().over(Window.partitionBy("graft_pid").orderBy(key)).cast("bigint"))
      .localCheckpoint(true)
    // per-partition counts (≤ shuffle.partitions rows) → offset of pid =
    // Σ counts of lower pids, via a tiny broadcast theta-join — NOT a
    // running-sum window, whose global orderBy would itself plan a
    // single-partition exchange (over tiny data, but the plan guarantee
    // stays clean this way)
    val counts = local.groupBy("graft_pid").agg(count(lit(1)).as("graft_n"))
    val offsets = counts
      .join(broadcast(counts.select(col("graft_pid").as("graft_pid2"),
        col("graft_n").as("graft_n2"))), col("graft_pid2") < col("graft_pid"), "left")
      .groupBy("graft_pid").agg(coalesce(sum(col("graft_n2")), lit(0L)).as("graft_off"))
    local.join(broadcast(offsets), Seq("graft_pid"))
      .select(col(key), (col("graft_off") + col("graft_lrn")).as("token"))
  }
}
