package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical-audit operators (SURVEY.md §2.8b continuation): Benford
  * first-digit conformance (the classic fraud/data-quality screen),
  * exponentially-weighted trend smoothing (the ops-dashboard staple the
  * q23/q138 rolling family lacks), and categorical mutual information
  * (the dependence measure behind feature selection and QI-correlation
  * audits — complements q133's χ², which tests the same table but
  * doesn't QUANTIFY shared information in nats).
  *
  * Scale notes: all three collapse the corpus in ONE keyed aggregation
  * to a bounded frame (9 digits / calendar hours / category-pair cells)
  * and do their arithmetic on that frame — the 100 TB side never moves
  * twice.
  */
object StatsOps {

  /** q154: Benford's-law first-digit audit over order totals — observed
    * vs expected log10(1+1/d) share per leading digit d, with the χ²
    * contribution (n_d − n·p_d)²/(n·p_d) per row (sum them = the audit
    * statistic). First digit extraction is pure integer/string math
    * (leading char of floor(x) — totals are ≥ 1 by construction), never
    * float log10, so both engines agree bit-for-bit; expected shares use
    * ln (the one transcendental with verified cross-engine parity,
    * q116/q127 precedent).
    *
    * Scale: one 9-group count shuffle; everything after is arithmetic on
    * 9 rows (the global total is a broadcast 1-row aggregate). */
  private def q154(spark: SparkSession, sfDir: String): DataFrame = {
    val digits = Tables(spark, sfDir, "orders")
      .select(substring(floor(col("o_totalprice")).cast("string"), 1, 1)
        .cast("bigint").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val total = digits.agg(sum("n_obs").as("n_total")) // 1 row, broadcasts
    val expP = Tables.r6(log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)))
    val expN = col("n_total") * (log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)))
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n_obs"),
        Tables.r6(col("n_obs") / col("n_total")).as("obs_p"),
        expP.as("exp_p"),
        Tables.r6((col("n_obs") - expN) * (col("n_obs") - expN) / expN).as("chi2_part"))
      .orderBy("digit")
  }

  /** The trailing EWMA weights (1-indexed lag 0..11): decay 0.8^k as
    * DECIMAL-EXACT literals, identical text on both engines — never
    * pow(), whose libm rounding is not contractually identical
    * cross-engine. 12 taps ≈ 93% of the mass at α=0.2. */
  private val EwmaDecay: Seq[Double] = Seq(
    1.0, 0.8, 0.64, 0.512, 0.4096, 0.32768, 0.262144, 0.2097152,
    0.16777216, 0.134217728, 0.1073741824, 0.08589934592)

  /** q155: exponentially-weighted moving average of hourly event value
    * per event type — the smoothing an ops dashboard layers on q138's
    * rolling z-scores. Expressed as a 12-tap FIR over the trailing ROWS
    * frame (lag k weighted 0.8^k, weights renormalized over the taps
    * actually present so the series starts unbiased) — the bounded-state
    * formulation of the recursive EWMA, which no engine can express as a
    * distributed window without sequential state. Like q138, the frame
    * is ROWS over existing hourly buckets (gap hours stretch the span —
    * documented, oracle-identical).
    *
    * Scale: one hour×type aggregation (calendar-bounded), then a keyed
    * window whose frame is 12 rows — constant state per partition. */
  private def q155(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = Tables(spark, sfDir, "events")
      .groupBy(col("event_type"),
        (col("ts") / lit(3600000000000L)).cast("bigint").as("hr"))
      .agg(Tables.dec(sum(Tables.dec(col("value")))).as("v"))
    val w = Window.partitionBy("event_type").orderBy("hr")
    val num = EwmaDecay.zipWithIndex.map { case (wt, k) =>
      coalesce(lag(col("v").cast("double"), k).over(w) * lit(wt), lit(0.0))
    }.reduce(_ + _)
    val den = EwmaDecay.zipWithIndex.map { case (wt, k) =>
      when(lag(col("v"), k).over(w).isNotNull, lit(wt)).otherwise(lit(0.0))
    }.reduce(_ + _)
    hourly
      .select(col("event_type"), col("hr"),
        Tables.r6(col("v").cast("double")).as("v"),
        Tables.r6(num / den).as("ewma"))
      .orderBy("event_type", "hr")
  }

  /** q156: mutual information between market segment and region — how
    * many nats of information one demographic QI leaks about another,
    * the quantitative companion to q133's χ² independence test and the
    * metric feature selection ranks by (Cover & Thomas ch. 2). Per-cell
    * PMI and weighted contribution p·ln(p/(pₓ·p_y)) ride along; the MI
    * is the contribution sum (≥ 0 up to rounding).
    *
    * Scale: one cell count shuffle (5×5-bounded), marginals and total
    * derived from the SAME cell frame (no table rescan), arithmetic on
    * 25 rows. */
  private def q156(spark: SparkSession, sfDir: String): DataFrame = {
    val natReg = Tables(spark, sfDir, "nation")
      .join(Tables(spark, sfDir, "region"), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("r_name"))
    val cells = Tables(spark, sfDir, "customer")
      .join(broadcast(natReg), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("r_name").as("region"), col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // cells, both marginals and the total all read it
    val margX = cells.groupBy("region").agg(sum("n").as("nx"))
    val margY = cells.groupBy("segment").agg(sum("n").as("ny"))
    val total = cells.agg(sum("n").as("nt")) // 1 row, broadcasts
    val pmi = log((col("n") * col("nt")).cast("double") / (col("nx") * col("ny")))
    cells.join(broadcast(margX), "region").join(broadcast(margY), "segment")
      .crossJoin(broadcast(total))
      .select(col("region"), col("segment"), col("n"),
        Tables.r6(col("n") / col("nt")).as("p"),
        Tables.r6(pmi).as("pmi"),
        Tables.r6((col("n") / col("nt")) * pmi).as("mi_part"))
      .orderBy("region", "segment")
  }

  val entries: Seq[Q] = Seq(
    Q("q154_benford_audit", q154 _, Some(
      "WITH digits AS (SELECT CAST(substring(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit, " +
        "COUNT(*) AS n_obs FROM orders GROUP BY 1), " +
        "total AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM digits) " +
        "SELECT digit, n_obs, " +
        Tables.r6sql("CAST(n_obs AS DOUBLE) / n_total") + " AS obs_p, " +
        Tables.r6sql("LN(1.0 + 1.0 / digit) / LN(10.0)") + " AS exp_p, " +
        Tables.r6sql(
          "(n_obs - n_total * (LN(1.0 + 1.0 / digit) / LN(10.0))) * " +
            "(n_obs - n_total * (LN(1.0 + 1.0 / digit) / LN(10.0))) / " +
            "(n_total * (LN(1.0 + 1.0 / digit) / LN(10.0)))") + " AS chi2_part " +
        "FROM digits CROSS JOIN total ORDER BY digit")),
    Q("q155_ewma_trend", q155 _, Some {
      val num = EwmaDecay.zipWithIndex.map { case (wt, k) =>
        s"COALESCE(LAG(CAST(v AS DOUBLE), $k) OVER w * $wt, 0.0)"
      }.mkString(" + ")
      val den = EwmaDecay.zipWithIndex.map { case (wt, k) =>
        s"(CASE WHEN LAG(v, $k) OVER w IS NOT NULL THEN $wt ELSE 0.0 END)"
      }.mkString(" + ")
      "WITH hourly AS (SELECT event_type, epoch_ns(ts) // 3600000000000 AS hr, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS v " +
        "FROM events GROUP BY 1, 2) " +
        "SELECT event_type, hr, " + Tables.r6sql("CAST(v AS DOUBLE)") + " AS v, " +
        Tables.r6sql(s"($num) / ($den)") + " AS ewma " +
        "FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY hr) " +
        "ORDER BY event_type, hr"
    }),
    Q("q156_mutual_info", q156 _, Some(
      "WITH cells AS (SELECT r_name AS region, c_mktsegment AS segment, COUNT(*) AS n " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey GROUP BY 1, 2), " +
        "mx AS (SELECT region, CAST(SUM(n) AS BIGINT) AS nx FROM cells GROUP BY region), " +
        "my AS (SELECT segment, CAST(SUM(n) AS BIGINT) AS ny FROM cells GROUP BY segment), " +
        "total AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM cells) " +
        "SELECT c.region, c.segment, c.n, " +
        Tables.r6sql("CAST(c.n AS DOUBLE) / nt") + " AS p, " +
        Tables.r6sql("LN(CAST(c.n * nt AS DOUBLE) / (nx * ny))") + " AS pmi, " +
        Tables.r6sql("(CAST(c.n AS DOUBLE) / nt) * LN(CAST(c.n * nt AS DOUBLE) / (nx * ny))") + " AS mi_part " +
        "FROM cells c JOIN mx ON c.region = mx.region JOIN my ON c.segment = my.segment " +
        "CROSS JOIN total ORDER BY c.region, c.segment")),
  )
}
