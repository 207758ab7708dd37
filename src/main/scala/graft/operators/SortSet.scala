package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sort / limit / set operators (SURVEY.md §2.5, q25–q28).
  *
  * q25's orderBy+limit fuses into TakeOrderedAndProject — each partition
  * keeps only its local top-k, the driver merges k·p rows; no global sort
  * at any scale. Set ops are shuffle-dedup (HashAggregate on all columns)
  * — the one correct distributed formulation.
  */
object SortSet {

  /** q25: global top-100 most expensive lineitems with full tiebreak. */
  private def q25(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)
  }

  /** q26: UNION ALL with provenance tag, then per-key counts — exercises
    * both bag-union and the dedup that follows in the agg. */
  private def q26(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables(spark, sfDir, "customer")
      .select(col("c_nationkey").as("nationkey")).withColumn("src", lit("cust"))
    val s = Tables(spark, sfDir, "supplier")
      .select(col("s_nationkey").as("nationkey")).withColumn("src", lit("supp"))
    c.unionByName(s)
      .groupBy("nationkey", "src").agg(count(lit(1)).as("cnt"))
      .orderBy("nationkey", "src")
  }

  /** q27: INTERSECT (distinct semantics in both engines). */
  private def q27(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "customer").select(col("c_nationkey").as("nationkey"))
      .intersect(
        Tables(spark, sfDir, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")
  }

  /** q28: EXCEPT — customer nations with no supplier. */
  private def q28(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "customer").select(col("c_nationkey").as("nationkey"))
      .except(
        Tables(spark, sfDir, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")
  }

  /** q102: MULTISET set ops — `exceptAll` / `intersectAll` keep
    * multiplicities (q27/q28's distinct forms collapse them): per user,
    * click occurrences left over after each one "consumes" a purchase
    * occurrence, and the matched count. The standard bag-semantics pair
    * every SQL surface carries; distributed as a counted-aggregation
    * anti/semi difference — one shuffle per side, no row explosion. */
  private def q102(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click").select("user_id")
    val purchases = ev.filter(col("event_type") === "purchase").select("user_id")
    val excess = clicks.exceptAll(purchases)
      .groupBy("user_id").agg(count(lit(1)).as("unmatched_clicks"))
    val matched = clicks.intersectAll(purchases)
      .groupBy("user_id").agg(count(lit(1)).as("matched_clicks"))
    excess.join(matched, Seq("user_id"), "full_outer")
      .na.fill(0L, Seq("unmatched_clicks", "matched_clicks"))
      .orderBy("user_id")
  }

  /** q118: skyline / Pareto frontier (Börzsönyi, Kossmann, Stocker, ICDE
    * 2001) — per brand, the parts not dominated on
    * (p_retailprice ↓, p_size ↓): a part is dominated iff another part of
    * the same mfgr is no worse on both dims and strictly better on one.
    * Formulated as the classic sort-scan: over distinct (price, size)
    * pairs in (price, size) ascending order, a pair is on the frontier
    * iff its size is strictly below the running minimum size of all
    * preceding pairs (every preceding pair is strictly better on price,
    * or price-tied and strictly better on size — either way a dominator
    * when its size ≤ ours).
    *
    * Scale: the window partitions by p_brand, so the sort-scan
    * distributes one task per brand; within a partition the
    * distinct step first collapses the pair domain (value-bounded, not
    * row-bounded). For a single-group skyline at extreme cardinality the
    * standard trick is a grid pre-pass — prune any pair whose cell is
    * wholly dominated by another cell's min corner — then this same
    * window over survivors; documented in SCALING.md. */
  private def q118(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_size")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables(spark, sfDir, "part")
      .select("p_brand", "p_retailprice", "p_size").distinct()
      .withColumn("m", min(col("p_size")).over(w))
      .filter(col("m").isNull || col("p_size") < col("m"))
      .select("p_brand", "p_retailprice", "p_size")
      .orderBy("p_brand", "p_retailprice", "p_size")
  }

  val entries: Seq[Q] = Seq(
    Q("q25_sort_limit_topk", q25 _, Some(
      "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100")),
    Q("q26_set_union", q26 _, Some(
      "SELECT nationkey, src, COUNT(*) AS cnt FROM (" +
        "SELECT c_nationkey AS nationkey, 'cust' AS src FROM customer " +
        "UNION ALL SELECT s_nationkey AS nationkey, 'supp' AS src FROM supplier) " +
        "GROUP BY nationkey, src ORDER BY nationkey, src")),
    Q("q27_set_intersect", q27 _, Some(
      "SELECT c_nationkey AS nationkey FROM customer " +
        "INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey")),
    Q("q28_set_except", q28 _, Some(
      "SELECT c_nationkey AS nationkey FROM customer " +
        "EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey")),
    Q("q102_set_multiset", q102 _, Some(
      "WITH clicks AS (SELECT user_id FROM events WHERE event_type = 'click'), " +
        "purchases AS (SELECT user_id FROM events WHERE event_type = 'purchase'), " +
        "excess AS (SELECT user_id, COUNT(*) AS unmatched_clicks FROM (" +
        "SELECT user_id FROM clicks EXCEPT ALL SELECT user_id FROM purchases) GROUP BY user_id), " +
        "matched AS (SELECT user_id, COUNT(*) AS matched_clicks FROM (" +
        "SELECT user_id FROM clicks INTERSECT ALL SELECT user_id FROM purchases) GROUP BY user_id) " +
        "SELECT COALESCE(e.user_id, m.user_id) AS user_id, " +
        "COALESCE(unmatched_clicks, 0) AS unmatched_clicks, " +
        "COALESCE(matched_clicks, 0) AS matched_clicks " +
        "FROM excess e FULL JOIN matched m ON e.user_id = m.user_id ORDER BY user_id")),
    Q("q118_skyline", q118 _, Some(
      "SELECT p_brand, p_retailprice, p_size FROM (" +
        "SELECT p_brand, p_retailprice, p_size, " +
        "MIN(p_size) OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_size " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m " +
        "FROM (SELECT DISTINCT p_brand, p_retailprice, p_size FROM part)) " +
        "WHERE m IS NULL OR p_size < m ORDER BY p_brand, p_retailprice, p_size")),
  )
}
