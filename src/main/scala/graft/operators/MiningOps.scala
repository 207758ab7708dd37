package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pattern-mining and monitoring operators (SURVEY.md §2.8b
  * continuation): association rules over order baskets (the
  * market-basket primitive, Agrawal & Srikant VLDB'94 restricted to
  * pairs), calendar period-over-period comparison (the BI growth
  * metric), and PSI distribution drift (the ML-ops alarm for "did my
  * feature distribution move").
  *
  * Scale notes in each operator; the common theme is that pair
  * generation is basket-bounded, calendar joins are equi-joins on the
  * day key, and drift runs on a bounded bin frame.
  */
object MiningOps {

  private val MinSupport = 3L

  /** q212: pairwise association rules — part pairs co-occurring in ≥ 3
    * order baskets, with support, both directional confidences, and
    * lift. The market-basket member the co-occurrence family lacks:
    * q149's PMI scores token windows, q188 enumerates a ≤10-item QI
    * domain; q212 mines the REAL sparse item domain where pair
    * generation must be basket-bounded to survive scale.
    *
    * Scale: baskets are one distinct projection; the pair self-join is
    * keyed on the ORDER (fan-out ≤ C(basket,2), basket ≤ 13 here — at
    * 100 TB a basket-size cap is the q61 df-cap analogue); item supports
    * come from the SAME basket frame (pinned once — CorpusPin) and join the
    * ≥min-support pairs — vocabulary-bounded, never the corpus. */
  private def q212(spark: SparkSession, sfDir: String): DataFrame = {
    // r17 optimization (guide §2.3/§2.4, the q261 recipe): collapse each
    // basket to its sorted distinct item ARRAY first — one map-side-
    // combined exchange — then N/item-supports/pair-supports all derive
    // by in-partition explodes instead of a distinct + self-join-on-o
    // (which paid 4 corpus-scale exchanges: the distinct, both self-join
    // sides, and re-shuffled pair fan-out). Pair generation from the
    // sorted array preserves pa < pb exactly; counts are identical.
    val baskets = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .groupBy("o").agg(sort_array(collect_set(col("p"))).as("ps"))
      .transform(graft.plans.CorpusPin.pin) // pair explode, item supports, N
    val nBaskets = baskets.agg(count(lit(1)).as("n_baskets"))
    val itemSupp = baskets.select(explode(col("ps")).as("p"))
      .groupBy("p").agg(count(lit(1)).as("s"))
    val pairs = baskets.select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), " +
          "y -> struct(x AS pa, y AS pb))))")).as("pr"))
      .select(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("support"))
      .filter(col("support") >= MinSupport)
    pairs
      .join(itemSupp.select(col("p").as("pa"), col("s").as("sa")), "pa")
      .join(itemSupp.select(col("p").as("pb"), col("s").as("sb")), "pb")
      .crossJoin(broadcast(nBaskets))
      .select(col("pa"), col("pb"), col("support"), col("sa"), col("sb"),
        Tables.r6(col("support").cast("double") / col("sa")).as("conf_a_to_b"),
        Tables.r6(col("support").cast("double") / col("sb")).as("conf_b_to_a"),
        Tables.r6(col("support").cast("double") * col("n_baskets") /
          (col("sa") * col("sb"))).as("lift"))
      .orderBy("pa", "pb")
  }

  /** q213: calendar period-over-period — daily order revenue against
    * the SAME WEEKDAY one week earlier, with the growth rate. NOT a
    * lag-7 window (q22's shape): a lag over existing rows mismatches
    * weekdays wherever the series has gaps; the calendar EQUI-join on
    * day−7 compares true periods and leaves missing baselines NULL.
    *
    * Scale: one day-keyed aggregation (calendar-bounded frame), then a
    * self equi-join of that bounded frame on the shifted key. */
  private def q213(spark: SparkSession, sfDir: String): DataFrame = {
    val epoch = lit("1970-01-01").cast("date")
    val daily = Tables(spark, sfDir, "orders")
      .groupBy(datediff(col("o_orderdate").cast("date"), epoch)
        .cast("bigint").as("day"))
      .agg(Tables.r6(sum(Tables.dec(col("o_totalprice"))).cast("double"))
        .as("revenue"))
      .localCheckpoint(true) // both sides of the shifted self-join
    daily
      .join(daily.select((col("day") + 7L).as("day"),
        col("revenue").as("revenue_prev")), Seq("day"), "left")
      .select(col("day"), col("revenue"), col("revenue_prev"),
        when(col("revenue_prev").isNotNull,
          Tables.r6((col("revenue") - col("revenue_prev")) / col("revenue_prev")))
          .as("wow_growth"))
      .orderBy("day")
  }

  /** q214: PSI distribution drift — the population stability index
    * between two deterministic halves of orders (even vs odd order key,
    * a stand-in for reference vs current period) over fixed-width
    * total-price bins: Σ (p_ref − p_cur)·ln(p_ref/p_cur). The
    * DISTRIBUTIONAL drift monitor the snapshot differ (q121, row-level)
    * can't express; PSI > 0.2 is the conventional retraining alarm.
    * Laplace +1 smoothing keeps empty bins out of ln(0) — standard and
    * deterministic. The psi_total column repeats the index on every row
    * (q196's auc pattern).
    *
    * Scale: ONE (bin, parity) corpus aggregation to a bounded frame;
    * smoothing constants and totals are 1-row broadcasts; ln is the
    * parity-verified transcendental (q116 precedent). Bins come from
    * FLOOR then cast — never a bare double→int cast, whose
    * truncate-vs-round semantics differ across engines. */
  private def q214(spark: SparkSession, sfDir: String): DataFrame = {
    val binned = Tables(spark, sfDir, "orders")
      .select(expr("CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT)").as("bin"),
        (col("o_orderkey") % 2L === 0L).as("is_ref"))
      .groupBy("bin")
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur"))
      .localCheckpoint(true) // totals + final read it
    val totals = binned.agg(sum("n_ref").as("t_ref"), sum("n_cur").as("t_cur"),
      count(lit(1)).as("n_bins"))
    val pRef = (col("n_ref") + lit(1L)).cast("double") / (col("t_ref") + col("n_bins"))
    val pCur = (col("n_cur") + lit(1L)).cast("double") / (col("t_cur") + col("n_bins"))
    val part = (pRef - pCur) * log(pRef / pCur)
    val withP = binned.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        Tables.r6(pRef).as("p_ref"), Tables.r6(pCur).as("p_cur"),
        Tables.r6(part).as("psi_part"),
        part.cast(org.apache.spark.sql.types.DataTypes.createDecimalType(18, 9))
          .as("psi_exact"))
      .localCheckpoint(true) // total fold + final both read it
    val psiTot = withP.agg(sum(col("psi_exact")).as("s"))
      .select(Tables.r6(col("s").cast("double")).as("psi_total"))
    withP.crossJoin(broadcast(psiTot))
      .select(col("bin"), col("n_ref"), col("n_cur"), col("p_ref"),
        col("p_cur"), col("psi_part"), col("psi_total"))
      .orderBy("bin")
  }

  /** q219: sequential A/B test (Wald's SPRT, 1945) — the
    * peeking-safe monitor q136's fixed-horizon t-test cannot be: per
    * arm (user parity), daily conversion trials (click/purchase events,
    * success = purchase) accumulate a log-likelihood ratio for
    * H1: p=0.25 vs H0: p=0.2, and the run DECIDES the day the LLR
    * crosses ±ln(19) (α=β=0.05). Emits the full per-(arm, day)
    * trajectory with the standing decision.
    *
    * Determinism: daily LLR increments are integer-weighted ln's of
    * exact literals (parity-verified transcendental), r6-rounded, then
    * DECIMAL-cumsummed over the calendar-bounded day frame (q189's ln
    * cumsum recipe); the boundary compare runs on the rounded value
    * identically on both engines.
    *
    * Scale: ONE (arm, day) corpus aggregation; the cumulative window
    * and decisions live on the ≤2×#days frame. */
  private def q219(spark: SparkSession, sfDir: String): DataFrame = {
    val usPerDay = 86400000000L
    val daily = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy((col("user_id") % 2L).as("arm"),
        expr(s"ts_us DIV $usPerDay").as("day"))
      .agg(count(lit(1)).as("n_trials"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_succ"))
    val inc = Tables.r6(
      col("n_succ") * log(lit(1.25)) +
        (col("n_trials") - col("n_succ")) * log(lit(0.9375)))
    val w = Window.partitionBy("arm").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bound = log(lit(19.0))
    daily
      .withColumn("inc_d",
        inc.cast(org.apache.spark.sql.types.DataTypes.createDecimalType(18, 9)))
      .withColumn("cum_llr", Tables.r6(sum("inc_d").over(w).cast("double")))
      .select(col("arm"), col("day"), col("n_trials"), col("n_succ"),
        col("cum_llr"),
        when(col("cum_llr") >= bound, "accept_h1")
          .when(col("cum_llr") <= -bound, "accept_h0")
          .otherwise("continue").as("decision"))
      .orderBy("arm", "day")
  }

  val entries: Seq[Q] = Seq(
    Q("q219_sprt_sequential", q219 _, Some {
      val inc = Tables.r6sql(
        "n_succ * ln(1.25) + (n_trials - n_succ) * ln(0.9375)")
      "WITH daily AS (SELECT user_id % 2 AS arm, " +
        "epoch_us(ts) // 86400000000 AS day, " +
        "CAST(COUNT(*) AS BIGINT) AS n_trials, " +
        "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_succ FROM events WHERE event_type IN ('click', 'purchase') " +
        "GROUP BY 1, 2), " +
        s"c AS (SELECT arm, day, n_trials, n_succ, " +
        Tables.r6sql(s"CAST(SUM(CAST($inc AS DECIMAL(18,9))) OVER " +
          "(PARTITION BY arm ORDER BY day " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)") +
        " AS cum_llr FROM daily) " +
        "SELECT arm, day, n_trials, n_succ, cum_llr, " +
        "CASE WHEN cum_llr >= ln(19.0) THEN 'accept_h1' " +
        "WHEN cum_llr <= -ln(19.0) THEN 'accept_h0' " +
        "ELSE 'continue' END AS decision " +
        "FROM c ORDER BY arm, day"
    }),
    Q("q212_assoc_rules", q212 _, Some(
      "WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
        "FROM lineitem), " +
        "nb AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_baskets FROM b), " +
        "si AS MATERIALIZED (SELECT p, CAST(COUNT(*) AS BIGINT) AS s FROM b GROUP BY p), " +
        "pr AS (SELECT a.p AS pa, b2.p AS pb, CAST(COUNT(*) AS BIGINT) AS support " +
        "FROM b a JOIN b b2 ON a.o = b2.o AND a.p < b2.p " +
        s"GROUP BY 1, 2 HAVING COUNT(*) >= $MinSupport) " +
        "SELECT pa, pb, support, sa.s AS sa, sb.s AS sb, " +
        Tables.r6sql("CAST(support AS DOUBLE) / sa.s") + " AS conf_a_to_b, " +
        Tables.r6sql("CAST(support AS DOUBLE) / sb.s") + " AS conf_b_to_a, " +
        Tables.r6sql("CAST(support AS DOUBLE) * n_baskets / (sa.s * sb.s)") + " AS lift " +
        "FROM pr JOIN si sa ON sa.p = pr.pa JOIN si sb ON sb.p = pr.pb " +
        "CROSS JOIN nb ORDER BY pa, pb")),
    Q("q213_period_over_period", q213 _, Some(
      "WITH daily AS (SELECT " +
        "CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day, " +
        Tables.r6sql("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)") +
        " AS revenue FROM orders GROUP BY 1) " +
        "SELECT d.day, d.revenue, p.revenue AS revenue_prev, " +
        "CASE WHEN p.revenue IS NOT NULL THEN " +
        Tables.r6sql("(d.revenue - p.revenue) / p.revenue") + " END AS wow_growth " +
        "FROM daily d LEFT JOIN daily p ON d.day = p.day + 7 ORDER BY d.day")),
    Q("q214_psi_drift", q214 _, Some {
      val pRef = "(CAST(n_ref + 1 AS DOUBLE) / (t_ref + n_bins))"
      val pCur = "(CAST(n_cur + 1 AS DOUBLE) / (t_cur + n_bins))"
      val part = s"($pRef - $pCur) * ln($pRef / $pCur)"
      "WITH binned AS MATERIALIZED (SELECT " +
        "CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bin, " +
        "CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref, " +
        "CAST(SUM(CASE WHEN o_orderkey % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur " +
        "FROM orders GROUP BY 1), " +
        "t AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref, " +
        "CAST(SUM(n_cur) AS BIGINT) AS t_cur, " +
        "CAST(COUNT(*) AS BIGINT) AS n_bins FROM binned), " +
        "w AS (SELECT bin, n_ref, n_cur, " +
        Tables.r6sql(pRef) + " AS p_ref, " + Tables.r6sql(pCur) + " AS p_cur, " +
        Tables.r6sql(part) + " AS psi_part, " +
        s"CAST($part AS DECIMAL(18,9)) AS psi_exact " +
        "FROM binned CROSS JOIN t), " +
        "pt AS (SELECT " + Tables.r6sql("CAST(SUM(psi_exact) AS DOUBLE)") +
        " AS psi_total FROM w) " +
        "SELECT bin, n_ref, n_cur, p_ref, p_cur, psi_part, psi_total " +
        "FROM w CROSS JOIN pt ORDER BY bin"
    }))
}
