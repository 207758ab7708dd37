package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-state exact quantiles — the two-pass bucketed-selection plan
  * that replaces `percentile(...)` wherever the group is unbounded
  * (global or near-global folds over high-distinct numeric columns).
  *
  * Why: Spark's exact `percentile` is a TypedImperativeAggregate that
  * buffers a counts-map of EVERY distinct value in the group. Over a
  * double-typed money column distincts ≈ rows, so a single-group
  * percentile is an executor OOM at 100× data — the one aggregation
  * shape in the suite that did not survive scale review (VERDICT r4 §1).
  *
  * Plan (all bounded state, all ordinary hash aggregates):
  *   pass 0  per-group (count, min, max)              — tiny, broadcast
  *   pass 1  histogram over `buckets` equi-width bins — ≤ groups×buckets
  *           rows; a ≤`buckets`-row running sum per group locates the
  *           bin holding each target order statistic
  *   pass 2  re-scan restricted to the target bins (a `1/buckets`
  *           fraction of rows), exact rank selection among the bin's
  *           distinct values
  * The widest aggregate state anywhere is one histogram / one bin's
  * distinct-value counts — bounded by `buckets` and the bin occupancy,
  * never by group cardinality. The input is scanned three times (range
  * stats, histogram, selection): callers with an expensive upstream
  * checkpoint it first (q136/q137/q139 do), while q19 relies on
  * ReuseExchange to materialize its join shuffles once — the
  * scan-count-for-bounded-memory trade is exactly what a 100 TB
  * deployment wants, since a re-scan is cheap and an OOM is not.
  *
  * Exactness: the final interpolation replicates Spark's
  * `Percentile.getPercentile` IEEE-op-for-IEEE-op — position =
  * (n−1)·p, lower/higher keys at ranks ⌊pos⌋+1/⌈pos⌉+1, special cases
  * for integral position and equal keys, then
  * (higher−pos)·vlo + (pos−lower)·vhi — so results are bit-identical to
  * the builtin (PropertySuite checks exact equality on random corpora)
  * and the established percentile/quantile_cont oracle parity carries
  * over unchanged.
  */
object BoundedQuantiles {

  /** Exact `percentile(value, ps)` per group of `groupCols` (empty ⇒ one
    * global group), emitted as double columns named `outNames`. Groups
    * with no non-null value are absent from the output (the four
    * production call sites never produce one). `value` must be numeric;
    * longs beyond ±2^53 would lose order under the double cast. */
  def groupQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      value: Column,
      ps: Seq[Double],
      outNames: Seq[String],
      buckets: Int = 4096): DataFrame = {
    require(ps.length == outNames.length, "one output name per percentile")
    val parts = build(df, groupCols, value, ps, buckets)
    val gc = parts.g.map(col)

    // pass 2: exact selection among the target bins' distinct values,
    // folded to one row per (group, percentile) carrying vlo/vhi
    val wv = Window.partitionBy((gc :+ col("graft_b")): _*).orderBy("graft_v")
    val vcum = parts.bucketed.join(broadcast(parts.targetBins), parts.g :+ "graft_b")
      .groupBy((gc :+ col("graft_b") :+ col("graft_v")): _*)
      .agg(count(lit(1)).as("graft_vc"))
      .withColumn("graft_vend", sum("graft_vc").over(wv))
      .withColumn("graft_vstart", col("graft_vend") - col("graft_vc"))
    val perP = parts.located.join(vcum, parts.g :+ "graft_b")
      .filter(col("graft_k") > col("graft_vstart") && col("graft_k") <= col("graft_vend"))
      .groupBy((gc :+ col("graft_pi")): _*)
      .agg(max(col("graft_pos")).as("graft_pos"),
        max(when(col("graft_side") === 0, col("graft_v"))).as("graft_vlo"),
        max(when(col("graft_side") === 1, col("graft_v"))).as("graft_vhi"))

    // Spark's Percentile.getPercentile, as Column arithmetic: the two
    // short-circuit cases return the lower key directly (the interpolated
    // form is NOT bit-equal to it — (h−pos)+(pos−l) need not be 1.0).
    val q = when(ceil(col("graft_pos")) === floor(col("graft_pos")), col("graft_vlo"))
      .when(col("graft_vhi") === col("graft_vlo"), col("graft_vlo"))
      .otherwise(
        (ceil(col("graft_pos")).cast("double") - col("graft_pos")) * col("graft_vlo") +
          (col("graft_pos") - floor(col("graft_pos")).cast("double")) * col("graft_vhi"))
    val aggs = outNames.zipWithIndex.map { case (nm, i) =>
      max(when(col("graft_pi") === i, col("graft_q"))).as(nm)
    }
    // the result is #groups × |ps| — bounded. Checkpointed so callers
    // that fan the cuts into a downstream corpus pass (q142 binning,
    // q174 fences, q175 deciles) read a pinned RDD instead of replanning
    // the whole two-pass dag inside their own plan.
    val out = perP.withColumn("graft_q", q)
      .groupBy(gc: _*)
      .agg(aggs.head, aggs.tail: _*)
      .localCheckpoint(true)
    if (groupCols.nonEmpty) out else out.drop("graft_g")
  }

  /** Boundedness instrumentation for tests: (max histogram bins held by
    * any group, rows re-read by pass 2). The first is the widest
    * aggregate/window state pass 1 can see; the second bounds pass 2's
    * selection input — both must stay ≪ group cardinality on a
    * high-distinct corpus (ScalePathSuite asserts it). */
  private[graft] def stateFootprint(
      df: DataFrame,
      groupCols: Seq[String],
      value: Column,
      ps: Seq[Double],
      buckets: Int = 4096): (Long, Long) = {
    val parts = build(df, groupCols, value, ps, buckets)
    val maxBins = parts.hist.groupBy(parts.g.map(col): _*)
      .agg(count(lit(1)).as("graft_nb"))
      .agg(max("graft_nb")).collect()(0).getLong(0)
    val pass2Rows =
      parts.bucketed.join(broadcast(parts.targetBins), parts.g :+ "graft_b").count()
    (maxBins, pass2Rows)
  }

  /** The shared passes 0–1: bin-assigned rows, histogram, and the located
    * (group, bin, rank) targets for every requested percentile. */
  private final case class Parts(
      g: Seq[String],
      bucketed: DataFrame,
      hist: DataFrame,
      located: DataFrame,
      targetBins: DataFrame)

  private def build(
      df: DataFrame,
      groupCols: Seq[String],
      value: Column,
      ps: Seq[Double],
      buckets: Int): Parts = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      "percentiles must lie in [0, 1]")
    require(buckets >= 2, "need at least 2 buckets")
    require(groupCols.forall(c => !c.startsWith("graft_")),
      "group columns must not carry the reserved graft_ prefix")
    val g = if (groupCols.nonEmpty) groupCols else Seq("graft_g")
    val gc = g.map(col)
    val base0 = df
      .select(groupCols.map(col) :+ value.cast("double").as("graft_v"): _*)
      .filter(col("graft_v").isNotNull)
    val base = if (groupCols.nonEmpty) base0 else base0.withColumn("graft_g", lit(0))

    // pass 0: per-group stats (tiny, broadcast back onto the rows).
    // Checkpointed: stats feeds the bin expression AND the rank targets —
    // un-checkpointed, each reference replans a full corpus scan (the
    // q151 lesson; measured: q19's plan carried 10 scans, 3 after the
    // stats/hist checkpoints). `bucketed` deliberately stays
    // re-derivable: it is corpus-sized, and at 100 TB re-scanning the
    // source twice beats materializing the whole frame.
    val stats = base.groupBy(gc: _*)
      .agg(count(lit(1)).as("graft_n"),
        min("graft_v").as("graft_mn"), max("graft_v").as("graft_mx"))
      .localCheckpoint(true)
    // equi-width bin, monotone in v (so bin-cumulative counts compose
    // with in-bin ranks into global order statistics); clamped against
    // FP edge effects at the range ends, degenerate range ⇒ bin 0
    val bin = when(col("graft_mx") === col("graft_mn"), lit(0L))
      .otherwise(least(greatest(floor(
        (col("graft_v") - col("graft_mn")) /
          ((col("graft_mx") - col("graft_mn")) / lit(buckets.toDouble))),
        lit(0L)), lit((buckets - 1).toLong)))
    val bucketed = base.join(broadcast(stats), g).withColumn("graft_b", bin)

    // pass 1: histogram + running ends (window spans ≤ `buckets` rows/
    // group). Checkpointed for the same reason as stats: cum/located/
    // targetBins all reference it, and each un-checkpointed reference
    // would replan the corpus-side aggregation.
    val hist = bucketed.groupBy((gc :+ col("graft_b")): _*)
      .agg(count(lit(1)).as("graft_bc"))
      .localCheckpoint(true)
    val wb = Window.partitionBy(gc: _*).orderBy("graft_b")
    val cum = hist
      .withColumn("graft_cend", sum("graft_bc").over(wb))
      .withColumn("graft_cstart", col("graft_cend") - col("graft_bc"))

    // the 0-based order statistics each p needs: ranks ⌊pos⌋+1 and ⌈pos⌉+1
    val pstructs = ps.zipWithIndex.map { case (p, i) =>
      struct(lit(i).as("graft_pi"),
        ((col("graft_n") - lit(1L)).cast("double") * lit(p)).as("graft_pos"))
    }
    val ranks = stats
      .select((gc :+ explode(array(pstructs: _*)).as("graft_s")): _*)
      .select((gc :+ col("graft_s.graft_pi").as("graft_pi")
        :+ col("graft_s.graft_pos").as("graft_pos")): _*)
      .select((gc :+ col("graft_pi") :+ col("graft_pos") :+ explode(array(
        struct(lit(0).as("graft_side"), (floor(col("graft_pos")) + lit(1L)).as("graft_rank")),
        struct(lit(1).as("graft_side"), (ceil(col("graft_pos")) + lit(1L)).as("graft_rank"))))
        .as("graft_t")): _*)
      .select((gc :+ col("graft_pi") :+ col("graft_pos")
        :+ col("graft_t.graft_side").as("graft_side")
        :+ col("graft_t.graft_rank").as("graft_rank")): _*)

    // locate the bin holding each rank; residual rank inside the bin
    val located = ranks.join(cum, g)
      .filter(col("graft_rank") > col("graft_cstart") &&
        col("graft_rank") <= col("graft_cend"))
      .withColumn("graft_k", col("graft_rank") - col("graft_cstart"))
    val targetBins = located.select((gc :+ col("graft_b")): _*).distinct()
    Parts(g, bucketed, hist, located, targetBins)
  }
}
