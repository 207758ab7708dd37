package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators (SURVEY.md §2.4, q20–q24).
  *
  * Every OVER carries a unique tiebreak column and uses ROWS frames
  * (§2.9 R5) — RANGE frames differ between engines on ties, and a
  * non-total sort order breaks the driver's hash compare.
  *
  * Scale notes: a window = one shuffle on its partition key, then a local
  * sort per partition. All windows here partition on natural keys
  * (customer, brand, user) whose cardinality grows with the data — no
  * global-ordering window except q23's daily series (bounded at
  * #days ≈ 2.2k rows after pre-aggregation, safe at any SF).
  */
object Windows {
  import Tables.dec

  /** q20: top-3 orders per customer by price (row_number + filter). */
  private def q20(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, sfDir, "orders")
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** q21: rank / dense_rank / ntile / percent_rank within brand. */
  private def q21(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice"), col("p_partkey"))
    Tables(spark, sfDir, "part")
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        rank().over(w).cast("bigint").as("rnk"),
        dense_rank().over(w).cast("bigint").as("drnk"),
        ntile(4).over(w).cast("bigint").as("quartile"),
        Tables.r6(percent_rank().over(w)).as("prank"))
      .orderBy("p_brand", "p_partkey")
  }

  /** q22: lag/lead — per-user Δt to previous event in canonical µs
    * (Tables.events — see Joins.q09). */
  private def q22(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        (col("ts_us") - lag(col("ts_us"), 1).over(w)).as("delta_us"),
        lead(col("event_id"), 1).over(w).as("next_event_id"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** q23: 7-row moving average of daily order totals (DECIMAL sums, ROWS
    * frame). Day series is pre-aggregated, so the global window sorts only
    * #days rows. */
  private def q23(spark: SparkSession, sfDir: String): DataFrame = {
    // the DECIMAL day-total stays internal (exact window sums); the output
    // column is r6 DOUBLE — decimal outputs hash differently across
    // engines' physical encodings (see Joins.q05)
    val daily = Tables(spark, sfDir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(dec(col("o_totalprice"))).as("day_total_dec"))
    val w = Window.orderBy("day").rowsBetween(-6, 0)
    daily
      .select(col("day"),
        Tables.r6(col("day_total_dec").cast("double")).as("day_total"),
        Tables.meanD(sum(col("day_total_dec")).over(w), count(lit(1)).over(w)).as("ma7"))
      .orderBy("day")
  }

  /** q24: running (cumulative) revenue per customer over order date —
    * ROWS frame with order-key tiebreak, not RANGE (§2.9 R5). */
  private def q24(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_day"),
        Tables.r6(sum(dec(col("o_totalprice"))).over(w).cast("double")).as("cum_rev"))
      .orderBy("o_custkey", "o_day", "o_orderkey")
  }

  /** q103: RANGE-frame window — the value-range frame q23/q24's ROWS
    * frames don't cover: per event, count + DECIMAL sum of the SAME
    * user's events within the preceding 10 minutes of EVENT TIME (a
    * trailing session-load metric; the window alternative to a range
    * self-join like q09). RANGE frames are tie-safe by construction —
    * all peers of the current order value share one frame, so the
    * result is deterministic without a tiebreaker in the ORDER BY
    * (§2.9 R5's caveat applies to ROWS, not RANGE). One shuffle on
    * user_id. */
  private def q103(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us")
      .rangeBetween(-600000000L, 0)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        count(lit(1)).over(w).as("n_10min"),
        Tables.r6(sum(dec(col("value"))).over(w).cast("double")).as("sum_10min"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** q117: window distribution/navigation functions — `cume_dist` plus
    * the frame-navigation trio `first_value`/`last_value`/`nth_value`
    * over the full partition frame; completes the window surface next to
    * q21's rank/dense_rank/ntile/percent_rank. Order includes p_partkey
    * so every order value is unique (deterministic navigation; §2.9 R5),
    * and the navigation functions use an explicit UNBOUNDED..UNBOUNDED
    * ROWS frame — last/nth over the default frame would see only the
    * prefix. One shuffle on p_brand. */
  private def q117(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(spark, sfDir, "part")
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        Tables.r6(cume_dist().over(w)).as("cdist"),
        first(col("p_partkey")).over(wf).as("cheapest_key"),
        last(col("p_partkey")).over(wf).as("priciest_key"),
        nth_value(col("p_partkey"), 2).over(wf).as("second_cheapest_key"))
      .orderBy("p_brand", "p_partkey")
  }

  val entries: Seq[Q] = Seq(
    Q("q20_win_topk_per_group", q20 _, Some(
      "SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (" +
        "SELECT o_custkey, o_orderkey, o_totalprice, " +
        "ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn " +
        "FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn")),
    Q("q21_win_rank_dense_ntile", q21 _, Some(
      "SELECT p_brand, p_partkey, p_retailprice, " +
        "RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk, " +
        "NTILE(4) OVER w AS quartile, " + Tables.r6sql("PERCENT_RANK() OVER w") + " AS prank " +
        "FROM part WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) " +
        "ORDER BY p_brand, p_partkey")),
    Q("q22_win_lag_lead", q22 _, Some(
      "SELECT user_id, event_id, epoch_us(ts) AS ts_us, " +
        "epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w AS delta_us, " +
        "LEAD(event_id, 1) OVER w AS next_event_id " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) " +
        "ORDER BY user_id, ts_us, event_id")),
    Q("q23_win_moving_avg", q23 _, Some(
      "SELECT day, " + Tables.r6sql("CAST(day_total_dec AS DOUBLE)") + " AS day_total, " +
        Tables.meanDSql("SUM(day_total_dec) OVER w", "COUNT(*) OVER w") + " AS ma7 FROM (" +
        "SELECT CAST(o_orderdate AS DATE) AS day, " +
        "SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS day_total_dec " +
        "FROM orders GROUP BY 1) WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) ORDER BY day")),
    Q("q103_win_range_frame", q103 _, Some(
      "SELECT user_id, event_id, epoch_us(ts) AS ts_us, " +
        "COUNT(*) OVER w AS n_10min, " +
        Tables.r6sql("CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)") + " AS sum_10min " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) " +
        "RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) " +
        "ORDER BY user_id, ts_us, event_id")),
    Q("q24_win_cumulative", q24 _, Some(
      "SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_day, " +
        Tables.r6sql("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)") +
        " AS cum_rev FROM orders ORDER BY o_custkey, o_day, o_orderkey")),
    Q("q117_win_distribution", q117 _, Some(
      "SELECT p_brand, p_partkey, p_retailprice, " +
        Tables.r6sql("CUME_DIST() OVER w") + " AS cdist, " +
        "FIRST_VALUE(p_partkey) OVER wf AS cheapest_key, " +
        "LAST_VALUE(p_partkey) OVER wf AS priciest_key, " +
        "NTH_VALUE(p_partkey, 2) OVER wf AS second_cheapest_key " +
        "FROM part WINDOW " +
        "w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey), " +
        "wf AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "ORDER BY p_brand, p_partkey")),
  )
}
