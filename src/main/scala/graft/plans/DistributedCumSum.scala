package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase distributed prefix (cumulative) sums — the running-total
  * counterpart of [[DistributedRank]]: range-partition the frame by the
  * order key (globally ordered partitions), compute running sums WITHIN
  * each partition, then add broadcast per-partition-total offsets. This
  * is semantically `sum(c).over(Window.orderBy(key))` but with NO
  * single-partition Exchange: the global-window form funnels the whole
  * frame through one task, which is exactly the plan shape that dies
  * when the key domain grows with the data (an ECDF over a 100 TB
  * column's value domain, for instance).
  *
  * Used by the distribution-test family (q263 Kolmogorov–Smirnov, q266
  * Mann–Whitney), whose cumulative group counts over the value domain
  * are the scale-bearing step. PropertySuite proves equivalence with the
  * single-partition window formulation on random frames; PlanShapeSuite
  * asserts the q263 plan carries no single-partition global Sort.
  */
object DistributedCumSum {

  /** Append `cum_<c>` = running sum of each `c` in `sumCols` over
    * ascending `key` order (rows with equal keys are summed together —
    * the in-partition window uses a RANGE frame, so every tied row sees
    * the full tied-group total, exactly like the documented
    * `sum(c).over(Window.orderBy(key))` equivalent; a ROWS frame here
    * would hand tied rows nondeterministic partial prefixes — r15
    * review. Callers needing strict per-row prefixes pre-aggregate to
    * one row per key, which is also what bounds the frame). Column
    * names must not collide with the emitted `cum_` names or the
    * reserved `graft_` prefix. */
  def cumulative(df: DataFrame, key: String, sumCols: Seq[String]): DataFrame = {
    require(sumCols.nonEmpty, "cumulative: need at least one sum column")
    require(!df.columns.exists(_.startsWith("graft_")) &&
        !sumCols.exists(s => df.columns.contains("cum_" + s)),
      "cumulative: input collides with graft_ working columns or cum_ outputs")
    // Eager checkpoint pins the sampled range boundaries AND the
    // spark_partition_id values: the frame feeds both the running-sum
    // window and the per-partition totals, and a recompute could
    // re-sample different boundaries between the two consumers
    // (DistributedRank precedent). One row per distinct key after the
    // caller's pre-aggregation — bounded by the value domain, not the
    // corpus; on a cluster swap for durable checkpoint().
    val local = df.repartitionByRange(col(key))
      .withColumn("graft_pid", spark_partition_id())
      .localCheckpoint(true)
    val w = Window.partitionBy("graft_pid")
      .orderBy(key).rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val withRun = sumCols.foldLeft(local) { (d, c) =>
      d.withColumn(s"graft_run_$c", sum(col(c)).over(w))
    }
    // Per-partition totals (≤ shuffle.partitions rows) → offset of pid =
    // Σ totals of lower pids via a tiny broadcast theta-join — NOT a
    // running-sum window, whose global orderBy would itself plan the
    // single-partition exchange this object exists to avoid.
    val totals = local.groupBy("graft_pid")
      .agg(sum(sumCols.head).as(s"graft_t_${sumCols.head}"),
        sumCols.tail.map(c => sum(c).as(s"graft_t_$c")): _*)
    val offsets = totals
      .join(broadcast(totals.select(
        (col("graft_pid").as("graft_pid2") +:
          sumCols.map(c => col(s"graft_t_$c").as(s"graft_t2_$c"))): _*)),
        col("graft_pid2") < col("graft_pid"), "left")
      .groupBy("graft_pid")
      .agg(coalesce(sum(s"graft_t2_${sumCols.head}"), lit(0))
          .as(s"graft_off_${sumCols.head}"),
        sumCols.tail.map(c =>
          coalesce(sum(s"graft_t2_$c"), lit(0)).as(s"graft_off_$c")): _*)
    withRun.join(broadcast(offsets), Seq("graft_pid"))
      .select((df.columns.map(col) ++ sumCols.map(c =>
        (col(s"graft_off_$c") + col(s"graft_run_$c")).as(s"cum_$c"))): _*)
  }

  /** PER-GROUP per-row prefix sums with the same two-phase shape:
    * append `cum_<c>` = running sum of each `c` over `orderCols` order
    * WITHIN each `groupCols` group. Semantically
    * `sum(c).over(Window.partitionBy(groupCols).orderBy(orderCols))` —
    * but a group can be corpus-sized (one source holding half a 100 TB
    * corpus), and the window form funnels each group through ONE task.
    * Here the frame range-partitions by (group, order) — a group larger
    * than a partition SPLITS, each split computes its in-partition
    * running sums, and per-(partition, group) totals (≤ partitions ×
    * groups rows, broadcastable by construction) supply the offsets.
    *
    * `orderCols` must totally order rows within a group (add a unique
    * tiebreak column) — equal-key rows would get a nondeterministic
    * interleave. Column-name rules as [[cumulative]]. */
  def cumulativeGrouped(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column],
      sumCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty && orderCols.nonEmpty && sumCols.nonEmpty,
      "cumulativeGrouped: need group, order and sum columns")
    require(!df.columns.exists(_.startsWith("graft_")) &&
        !sumCols.exists(s => df.columns.contains("cum_" + s)),
      "cumulativeGrouped: input collides with graft_ working columns or cum_ outputs")
    // eager checkpoint pins sampled range boundaries + pid values across
    // the running-sum and totals consumers ([[cumulative]]'s rationale)
    val local = df.repartitionByRange((groupCols.map(col) ++ orderCols): _*)
      .withColumn("graft_pid", spark_partition_id())
      .localCheckpoint(true)
    val w = Window.partitionBy(("graft_pid" +: groupCols).map(col): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRun = sumCols.foldLeft(local) { (d, c) =>
      d.withColumn(s"graft_run_$c", sum(col(c)).over(w))
    }
    val totals = local.groupBy(("graft_pid" +: groupCols).map(col): _*)
      .agg(sum(sumCols.head).as(s"graft_t_${sumCols.head}"),
        sumCols.tail.map(c => sum(c).as(s"graft_t_$c")): _*)
    // group matching is NULL-SAFE (<=>) in BOTH joins: the window form
    // this object replaces treats NULL as its own group, but a
    // null-rejecting equi-join would (a) zero the cross-partition
    // offsets of a NULL group that spans partitions and (b) DROP every
    // NULL-group row at the final inner join (r15 review).
    val offsets = totals
      .join(broadcast(totals.select(
        (col("graft_pid").as("graft_pid2") +:
          (groupCols.map(g => col(g).as(s"graft_g2_$g")) ++
            sumCols.map(c => col(s"graft_t_$c").as(s"graft_t2_$c")))): _*)),
        groupCols.map(g => col(g) <=> col(s"graft_g2_$g"))
          .reduce(_ && _) && col("graft_pid2") < col("graft_pid"), "left")
      .groupBy(("graft_pid" +: groupCols).map(col): _*)
      .agg(coalesce(sum(s"graft_t2_${sumCols.head}"), lit(0))
          .as(s"graft_off_${sumCols.head}"),
        sumCols.tail.map(c =>
          coalesce(sum(s"graft_t2_$c"), lit(0)).as(s"graft_off_$c")): _*)
    val offKeyed = offsets.select(
      (col("graft_pid").as("graft_pidO") +:
        (groupCols.map(g => col(g).as(s"graft_gO_$g")) ++
          sumCols.map(c => col(s"graft_off_$c")))): _*)
    withRun.join(broadcast(offKeyed),
        col("graft_pid") === col("graft_pidO") &&
          groupCols.map(g => col(g) <=> col(s"graft_gO_$g")).reduce(_ && _))
      .select((df.columns.map(col) ++ sumCols.map(c =>
        (col(s"graft_off_$c") + col(s"graft_run_$c")).as(s"cum_$c"))): _*)
  }
}
