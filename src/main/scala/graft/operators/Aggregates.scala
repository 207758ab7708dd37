package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import java.sql.Timestamp

/** Aggregation operators (SURVEY.md §2.3, q12–q19).
  *
  * All summed/averaged doubles go through DECIMAL(18,4) (§2.9 R1) and every
  * output aggregate is pinned to an explicit final type so Spark and DuckDB
  * emit identical physical parquet types. Two-phase (partial + final)
  * HashAggregate comes free from Catalyst — at 100 TB the map-side partial
  * aggregation bounds shuffle volume by group cardinality, not input rows.
  */
object Aggregates {
  import Tables.dec

  /** q12: TPC-H Q1 analog — multi-measure hash aggregate. */
  private def q12(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables(spark, sfDir, "lineitem")
    li.filter(col("l_shipdate") <= lit(Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        // DECIMAL sums internally, r6 DOUBLE on the wire (see Joins.q05)
        Tables.r6(sum(dec(col("l_quantity"))).cast("double")).as("sum_qty"),
        Tables.r6(sum(dec(col("l_extendedprice"))).cast("double")).as("sum_base_price"),
        Tables.r6(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double")).as("sum_disc_price"),
        Tables.meanD(sum(dec(col("l_quantity"))), count(lit(1))).as("avg_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q13: distinct + count distinct — distinct customers per order status. */
  private def q13(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "orders")
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("distinct_cust"),
        count(lit(1)).as("order_cnt"))
      .orderBy("o_orderstatus")
  }

  /** q14: HLL approximate distinct (approx_count_distinct). No oracle —
    * the estimate is implementation-specific (SURVEY §2.3); the unit test
    * asserts relative error < 5% against the exact count instead. */
  private def q14(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "customer")
      .groupBy("c_mktsegment")
      .agg(approx_count_distinct(col("c_custkey")).as("approx_cust"))
      .orderBy("c_mktsegment")
  }

  /** q15: rollup — revenue by (region, nation) + subtotals + grand total.
    * Null ordering spelled explicitly on both engines (§2.9 R4). Expressed
    * via spark.sql: the DataFrame `rollup().agg().orderBy(col(...))` form
    * trips Spark 4's ambiguous-self-join detector on the grouping columns
    * (the orderBy Column re-resolves against the pre-rollup join). */
  private def q15(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("orders", "customer", "nation", "region").foreach(Tables.view(spark, sfDir, _))
    spark.sql(
      "SELECT r_name, n_name, " + Tables.r6sql("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)") + " AS revenue " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY ROLLUP (r_name, n_name) " +
        "ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST")
  }

  /** q16: cube — counts over all combos of (status, priority). */
  private def q16(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  /** q17: GROUPING SETS via spark.sql over a temp view. */
  private def q17(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.view(spark, sfDir, "orders")
    spark.sql(
      "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt, " +
        Tables.r6sql("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)") + " AS revenue " +
        "FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ()) " +
        "ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST")
  }

  /** q18: moment statistics (stddev, corr) via manual DECIMAL sums — the
    * partial sums are exact, so the final double arithmetic is identical on
    * both engines regardless of partition merge order (§2.9 R1). */
  private def q18(spark: SparkSession, sfDir: String): DataFrame = {
    val x = dec(col("l_extendedprice"))
    val y = dec(col("l_quantity"))
    val d = (c: Column) => c.cast("double")
    Tables(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(x * x).as("sxx"),
        sum(y).as("sy"), sum(y * y).as("syy"),
        sum(x * y).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        Tables.r6(sqrt((d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) /
          (d(col("n")) * (d(col("n")) - 1.0)))).as("stddev_price"),
        Tables.r6((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          (sqrt(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
            sqrt(d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))))).as("corr_price_qty"))
      .orderBy("l_returnflag")
  }

  /** q19: exact interpolated percentiles (median + p90) per market
    * segment — via [[graft.plans.BoundedQuantiles]], NOT the builtin
    * `percentile`: the builtin buffers every distinct o_totalprice of a
    * segment in one aggregation buffer (distincts ≈ rows on a money
    * column — an executor OOM at 100×), while the bounded two-pass
    * selection holds at most a 4096-bin histogram per group and returns
    * bit-identical values, so the quantile_cont oracle parity is
    * unchanged. The join input is read twice (passes 1 and 2);
    * ReuseExchange materializes its shuffle once. */
  private def q19(spark: SparkSession, sfDir: String): DataFrame = {
    val joined = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
    graft.plans.BoundedQuantiles.groupQuantiles(joined, Seq("c_mktsegment"),
        col("o_totalprice"), Seq(0.5, 0.9), Seq("q50", "q90"), pin = false)
      .select(col("c_mktsegment"),
        Tables.r6(col("q50")).as("median_price"),
        Tables.r6(col("q90")).as("p90_price"))
      .orderBy("c_mktsegment")
  }

  /** q142: equi-depth (quantile) binning — 8 equal-population bins of
    * order value: 7 exact cut points at k/8 from the bounded quantile
    * fold (§2.9 R7 — this is the second production consumer of
    * [[graft.plans.BoundedQuantiles]]), every order assigned by strict
    * cut comparison, per-bin population + value extent reported. The
    * discretizer behind feature binning and histogram-equalized
    * layouts. Cut values are r6-ROUNDED before any comparison on BOTH
    * engines: an interpolated cut CAN land on the cent grid (a k/8
    * fraction of a multiple-of-8-cents gap), where the engines'
    * algebraically-equal-but-FP-different interpolations could differ
    * by an ulp and flip an assignment — r6 pins both to the identical
    * double (the proven q19 percentile/quantile_cont parity). Scale:
    * one bounded fold + a 7-double broadcast + one bin-keyed agg. */
  private def q142(spark: SparkSession, sfDir: String): DataFrame = {
    val names = (1 to 7).map(i => s"c$i")
    val orders = Tables(spark, sfDir, "orders")
    val cuts = graft.plans.BoundedQuantiles.groupQuantiles(
      orders, Nil, col("o_totalprice"), (1 to 7).map(_ / 8.0), names)
      .select(array(names.map(n => Tables.r6(col(n))): _*).as("cuts"))
    orders.crossJoin(broadcast(cuts))
      .select(col("o_totalprice"),
        (lit(1L) + expr("size(filter(cuts, c -> c < o_totalprice))")).cast("bigint").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        Tables.r6(min(col("o_totalprice"))).as("lo"),
        Tables.r6(max(col("o_totalprice"))).as("hi"))
      .orderBy("bin")
  }

  /** q71: pivot — event counts per user across a FIXED column list
    * (explicit pivot values keep the output schema deterministic and, at
    * scale, skip the extra distinct-values job). */
  private def q71(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "events")
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .count()
      .na.fill(0L)
      .orderBy("user_id")
  }

  /** q72: ordered collect — per nation, the sorted distinct market
    * segments as one string (portable list output per §2.9 R2). */
  private def q72(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "customer")
      .groupBy("c_nationkey")
      .agg(concat_ws(",", array_sort(collect_set(col("c_mktsegment")))).as("segments"),
        count(lit(1)).as("n"))
      .orderBy("c_nationkey")
  }

  /** q73: argmax — the order key of each customer's highest-priced order,
    * tie-broken by orderkey via struct ordering (max_by alone is
    * nondeterministic on ties in both engines). */
  private def q73(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "orders")
      .groupBy("o_custkey")
      .agg(max(struct(col("o_totalprice"), col("o_orderkey"))).as("m"),
        count(lit(1)).as("n_orders"))
      .select(col("o_custkey"), col("m.o_orderkey").as("best_order"),
        col("m.o_totalprice").as("best_price"), col("n_orders"))
      .orderBy("o_custkey")
  }

  /** q101: unpivot / melt — the inverse of q71's pivot: the wide
    * per-user event-count matrix back to long (user, event_type, cnt)
    * rows via the native `Dataset.unpivot` operator. Narrow row
    * expansion over the pivoted frame — the same one shuffle q71 pays,
    * nothing more. */
  private def q101(spark: SparkSession, sfDir: String): DataFrame = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    val wide = Tables(spark, sfDir, "events")
      .groupBy("user_id")
      .pivot("event_type", types)
      .count()
      .na.fill(0L)
    wide.unpivot(Array(col("user_id")), types.map(col).toArray, "event_type", "cnt")
      .orderBy("user_id", "event_type")
  }

  /** q125: per-group OLS regression (price ~ quantity per returnflag) —
    * slope/intercept/R² from the SAME exact-DECIMAL moment sums as q18
    * (the regr_slope/regr_r2 family, re-derived from closed forms so the
    * doubles are bit-identical cross-engine instead of trusting two
    * engines' internal covariance accumulators, which fold in partition
    * order). One map-side-combined shuffle on the group key; the six
    * moments are the complete sufficient statistics, so this is also the
    * mergeable-state pattern: shard moments re-merge exactly. */
  private def q125(spark: SparkSession, sfDir: String): DataFrame = {
    val x = dec(col("l_quantity"))
    val y = dec(col("l_extendedprice"))
    val d = (c: Column) => c.cast("double")
    val n = d(col("n")); val sx = d(col("sx")); val sxx = d(col("sxx"))
    val sy = d(col("sy")); val syy = d(col("syy")); val sxy = d(col("sxy"))
    Tables(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(x * x).as("sxx"),
        sum(y).as("sy"), sum(y * y).as("syy"),
        sum(x * y).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        Tables.r6((n * sxy - sx * sy) / (n * sxx - sx * sx)).as("slope"),
        Tables.r6((sy * sxx - sx * sxy) / (n * sxx - sx * sx)).as("intercept"),
        Tables.r6((n * sxy - sx * sy) * (n * sxy - sx * sy) /
          ((n * sxx - sx * sx) * (n * syy - sy * sy))).as("r2"))
      .orderBy("l_returnflag")
  }

  /** q128: mode (most frequent value) per group with a total tie-break —
    * the built-in `mode()` (both engines) picks an arbitrary value on
    * ties, which can never hash-match; the count + rank formulation
    * pins ties to the smallest value and is the one correct distributed
    * shape anyway (two bounded shuffles: the count, then a rank over
    * group×value cardinality — never the raw rows through one task). */
  private def q128(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("cnt").desc, col("c_mktsegment"))
    Tables(spark, sfDir, "customer")
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_nationkey"), col("c_mktsegment").as("mode_segment"), col("cnt"))
      .orderBy("c_nationkey")
  }

  /** q132: incremental aggregate maintenance — the materialized-view
    * refresh pattern: a "base" aggregate state (orders before the cutoff)
    * merges with the "delta" batch's partial aggregate ALGEBRAICALLY
    * (counts add, DECIMAL sums add) instead of rescanning history. The
    * merged result provably equals the full recompute — which is exactly
    * what the oracle checks (its SQL IS the full recompute over all
    * rows). At 100 TB this is the nightly-refresh shape: the base state
    * is a stored table, only the delta is scanned; it works because
    * count/sum are commutative monoids — the same property behind
    * map-side partial aggregation and the q111 sketch rollups (avg/
    * percentiles need sum+count / sketch states, not their finals). */
  private def q132(spark: SparkSession, sfDir: String): DataFrame = {
    val cutoff = "1997-01-01"
    def partial(df: DataFrame): DataFrame = df
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), sum(dec(col("o_totalprice"))).as("rev_dec"))
    val orders = Tables(spark, sfDir, "orders")
    val base = partial(orders.filter(col("o_orderdate") < lit(cutoff)))
    // the delta leg must own NULL dates too — `>= cutoff` alone drops
    // them from BOTH partitions (NULL fails both predicates) and the
    // merged result silently diverges from the full recompute the
    // operator exists to equal
    val delta = partial(orders.filter(
      col("o_orderdate") >= lit(cutoff) || col("o_orderdate").isNull))
    base.unionByName(delta)
      .groupBy("o_custkey")
      .agg(sum(col("n_orders")).as("n_orders"),
        Tables.r6(sum(col("rev_dec")).cast("double")).as("revenue"))
      .orderBy("o_custkey")
  }

  /** q133: chi-square independence audit — the Pearson χ² statistic of
    * the nation × mktsegment contingency table, reported per nation
    * (Σ over that row's cells of (O−E)²/E, E = row·col/n). The
    * "is this attribute independent of that one" check behind feature
    * selection and anonymization-utility audits (a generalization that
    * destroyed all association pushes χ² → 0). Counts are exact; each
    * cell's double term is r6-rounded then DECIMAL-summed in any merge
    * order (the q80 EMD recipe). All shuffles are contingency-table
    * bounded. */
  private def q133(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables(spark, sfDir, "customer")
    val cells = cust.groupBy("c_nationkey", "c_mktsegment").agg(count(lit(1)).as("o0"))
    val rows_ = cust.groupBy("c_nationkey").agg(count(lit(1)).as("rn_"))
    val cols_ = cust.groupBy("c_mktsegment").agg(count(lit(1)).as("cn_"))
    val n = cust.agg(count(lit(1)).cast("double").as("n_total"))
    // the FULL marginal grid, not just observed cells: an empty (row,col)
    // cell still contributes (0−E)²/E = E — omitting it understates χ²
    // exactly when association is strongest. DECIMAL(28,9): terms grow
    // O(n) under dependence, and 18-digit capacity would overflow (ANSI
    // CAST error) around 10⁹ rows.
    rows_.crossJoin(broadcast(cols_))
      .join(cells, Seq("c_nationkey", "c_mktsegment"), "left")
      .crossJoin(broadcast(n))
      .withColumn("o", coalesce(col("o0"), lit(0L)))
      .withColumn("e", col("rn_") * col("cn_") / col("n_total"))
      .select(col("c_nationkey"),
        Tables.r6((col("o") - col("e")) * (col("o") - col("e")) / col("e"))
          .cast(DecimalType(28, 9)).as("term"))
      .groupBy("c_nationkey")
      .agg(Tables.r6(sum(col("term")).cast("double")).as("chi2_part"))
      .orderBy("c_nationkey")
  }

  /** q134: Gini concentration of customer revenue within each segment —
    * G = 2·Σᵢ i·xᵢ / (n·Σxᵢ) − (n+1)/n over ascending revenue (rank i,
    * custkey tiebreak). The inequality/concentration metric behind
    * "how top-heavy is this segment" questions. Revenue and the rank-
    * weighted sum stay DECIMAL-exact (bigint rank × DECIMAL revenue);
    * only the final ratio is a rounded double. One shuffle shared by
    * the rank window and the per-segment aggregate. */
  private def q134(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "c_custkey")
      .agg(sum(dec(col("o_totalprice"))).as("rev"))
    val w = Window.partitionBy("c_mktsegment").orderBy(col("rev"), col("c_custkey"))
    rev
      .withColumn("i", row_number().over(w).cast("bigint"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_cust"),
        sum(col("rev")).as("sum_rev"),
        sum(col("i") * col("rev")).as("iw_rev"))
      .select(col("c_mktsegment"), col("n_cust"),
        Tables.r6(
          lit(2.0) * col("iw_rev").cast("double") /
            (col("n_cust") * col("sum_rev").cast("double")) -
            (col("n_cust") + lit(1L)).cast("double") / col("n_cust")
        ).as("gini"))
      .orderBy("c_mktsegment")
  }

  /** q229: exact distinct counting via bitmap aggregation — the roaring-
    * bitmap pattern on builtin bit ops: users bucket into 32-bit words
    * (word = id div 32), per (type, word) the partial masks OR together
    * (map-side combinable — the shuffle carries ≤ domain/32 words per
    * key, not one row per VALUE like q13's count-distinct expand), and
    * popcounts sum per type. The same result as countDistinct, which
    * rides along from the same scan for the self-audit — at 100 TB the
    * bitmap path shuffles ~3% of what the expand path moves on a dense
    * integer domain.
    *
    * 32-bit words keep the set bit below the sign position on BOTH
    * engines (1 << 63 differs in overflow behavior cross-engine). */
  private def q229(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select("event_type", "user_id")
    val bitmap = ev
      .select(col("event_type"), expr("user_id DIV 32").as("word"),
        expr("shiftleft(1L, CAST(user_id % 32 AS INT))").as("bit"))
      .groupBy("event_type", "word").agg(expr("bit_or(bit)").as("mask"))
      .groupBy("event_type")
      .agg(sum(expr("bit_count(mask)")).cast("bigint").as("n_distinct_bitmap"))
    val direct = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_distinct_direct"))
    bitmap.join(direct, "event_type")
      .select(col("event_type"), col("n_distinct_bitmap"), col("n_distinct_direct"),
        (col("n_distinct_bitmap") === col("n_distinct_direct")).as("agree"))
      .orderBy("event_type")
  }

  /** q230: aggregate navigation off a materialized rollup — the OLAP
    * cube contract: the daily revenue rollup is WRITTEN to parquet (the
    * materialized view), the monthly question is answered from that
    * rollup, and the answer is proven EQUAL to recomputing from the raw
    * corpus. The claim q132's incremental maintenance doesn't make:
    * navigation answers a COARSER grain from a finer materialization —
    * legitimate only because the DECIMAL partial sums re-aggregate
    * exactly (R1); the emitted `equal` column is the proof.
    *
    * Scale: this is why 100 TB BI works — the monthly query scans the
    * ≈2k-row daily rollup, not the corpus; the raw path exists here
    * only as the audit. */
  private def q230(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.SaveMode
    val month = substring(col("o_orderdate").cast("date").cast("string"), 1, 7)
    val orders = Tables(spark, sfDir, "orders")
    // per-session unique path: two concurrent runs on the same sfDir (or a
    // hashCode collision across dirs) must not race on one Overwrite target
    val path = s"${sys.props("java.io.tmpdir")}/graft_rollup_" +
      s"${spark.sparkContext.applicationId}_${math.abs(sfDir.hashCode)}"
    orders
      .groupBy(month.as("month"), col("o_orderdate").cast("date").as("day"))
      .agg(Tables.dec(sum(Tables.dec(col("o_totalprice")))).as("rev"))
      .write.mode(SaveMode.Overwrite).parquet(path)
    val fromRollup = spark.read.parquet(path)
      .groupBy("month")
      .agg(count(lit(1)).as("n_days"),
        Tables.r6(sum(col("rev")).cast("double")).as("rev_rollup"))
    val fromRaw = orders.groupBy(month.as("month"))
      .agg(Tables.r6(sum(Tables.dec(col("o_totalprice"))).cast("double"))
        .as("rev_raw"))
    fromRollup.join(fromRaw, "month")
      .select(col("month"), col("n_days"), col("rev_rollup"), col("rev_raw"),
        (col("rev_rollup") === col("rev_raw")).as("equal"))
      .orderBy("month")
  }

  /** q239: top-k per group via the bounded-state
    * [[graft.functions.TopKByScore]] Aggregator — top-3 orders by total
    * per priority, same answer as q20's rank-window idiom but with the
    * SCALE-correct plan: the window form sorts every group's full row
    * set inside each shuffle partition and then discards all but k; the
    * Aggregator keeps O(k) state per group per map task, combines
    * map-side, and ships ≤ k pairs per (task, group) through the
    * shuffle. On a 100 TB fact with heavy groups that is the difference
    * between a spilling sort and kilobytes of state. Determinism: the
    * (score desc, id asc) order is total (id unique), so the kept set
    * is merge-tree-independent (class doc) and the oracle is the plain
    * ROW_NUMBER formulation. */
  /** The generic bounded top-k primitive behind q239, exposed as
    * [[graft.Graft.topKPerGroup]]: any frame, any group columns, a
    * double-valued score and a UNIQUE long id (the tiebreak — the
    * uniqueness contract is what makes the kept set total-ordered and
    * merge-tree-independent). Output: groupCols + (rn, id, score),
    * rn 1-based by (score desc, id asc), ordered by group + rn. */
  private[graft] def topKPerGroupOf(df: DataFrame, groupCols: Seq[String],
      score: Column, id: Column, k: Int): DataFrame = {
    require(groupCols.nonEmpty, "topKPerGroup: need at least one group column")
    val topk = udaf(new graft.functions.TopKByScore(k))
    val gs = groupCols.map(col)
    // NULL score/id rows are SKIPPED, not crashed on (r15 review): the
    // aggregator's primitive (Double, Long) encoder throws on NULL, so
    // filter here, matching the sibling aggregators' skip-null
    // convention. KNOWN DIVERGENCE from the raw ROW_NUMBER window idiom
    // (ADVICE r15): ORDER BY score DESC ranks NULL scores LAST (both
    // engines), so a group with fewer than k non-null scores returns
    // k rows under the window form but only the non-null ones here —
    // skip-NULL is the right semantic for a bounded-state primitive (a
    // NULL score is "no score", not "worst score"), and the q239 oracle
    // equivalence holds because o_totalprice/o_orderkey are non-null in
    // the house schema. Callers needing rank-NULLs-last must coalesce a
    // sentinel before calling.
    df.filter(score.isNotNull && id.isNotNull)
      .groupBy(gs: _*)
      .agg(topk(score.cast("double"), id.cast("bigint")).as("graft_top"))
      .select(gs :+ posexplode(col("graft_top")): _*)
      .select(gs ++ Seq((col("pos") + 1).cast("bigint").as("rn"),
        col("col._2").as("id"), col("col._1").as("score")): _*)
      .orderBy(gs :+ col("rn"): _*)
  }

  private def q239(spark: SparkSession, sfDir: String): DataFrame =
    // delegates to the facade primitive (q120→pageRank convention)
    topKPerGroupOf(Tables(spark, sfDir, "orders"), Seq("o_orderpriority"),
      col("o_totalprice"), col("o_orderkey"), 3)
      .withColumnRenamed("id", "o_orderkey")
      .withColumnRenamed("score", "o_totalprice")

  /** q257: approximate query processing by deterministic sample — the
    * BlinkDB/AQP pattern: a ~2% md5-bucket sample of lineitem estimates
    * total revenue, and the output carries the exact total + relative
    * error as the built-in accuracy audit. The estimator is
    * SELF-NORMALIZED (ratio form): est = sample_sum · n_total/n_sample —
    * NOT a fixed ×50 Horvitz–Thompson scale-up, because the hex-pair
    * mod-100 bucketing makes buckets 0–1 carry 6/256 ≈ 2.34% inclusion
    * mass, and a fixed multiplier assuming 2% would bake in a
    * systematic ~17% overestimate; dividing by the OBSERVED sample count
    * cancels the inclusion-probability mismatch exactly. Both aggregates
    * ride ONE scan here (the audit requires the exact answer anyway);
    * the production shape at 100 TB is the sample MATERIALIZED as its
    * own table so the estimate scans ~2% of the data — this query proves
    * the estimator math that makes that trade measurable. Sampling is
    * md5-deterministic (q79's hex-digit bucket, 'aqp:' salt) so both
    * engines draw the identical sample; all sums are DECIMAL-exact with
    * one r6 double emission (§2.9 R1).
    *
    * Scale: one scan, one 1-row map-side-combined grand aggregate. */
  private def q257(spark: SparkSession, sfDir: String): DataFrame = {
    val b = Tables(spark, sfDir, "lineitem")
      .withColumn("h",
        expr("md5(concat('aqp:', cast(l_orderkey * 10 + l_linenumber AS STRING)))"))
      .withColumn("bucket", expr(
        "((instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16 + " +
          "(instr('0123456789abcdef', substring(h, 2, 1)) - 1)) % 100"))
    b.agg(
        count(lit(1)).as("n_total"),
        sum(when(col("bucket") < 2, 1L).otherwise(0L)).as("n_sample"),
        sum(dec(col("l_extendedprice"))).as("exact_dec"),
        sum(when(col("bucket") < 2, dec(col("l_extendedprice")))
          .otherwise(dec(lit(0)))).as("samp_dec"))
      .select(col("n_total"), col("n_sample"),
        Tables.r6(col("exact_dec").cast("double")).as("exact_sum"),
        Tables.r6(col("samp_dec").cast("double") *
          col("n_total").cast("double") / col("n_sample").cast("double"))
          .as("est_sum"),
        Tables.r6(abs(col("samp_dec").cast("double") *
          col("n_total").cast("double") / col("n_sample").cast("double") -
          col("exact_dec").cast("double")) /
          col("exact_dec").cast("double")).as("rel_err"))
  }

  val entries: Seq[Q] = Seq(
    Q("q257_agg_approx_sample", q257 _, Some {
      val bucket = "((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 + " +
        "(strpos('0123456789abcdef', substr(h, 2, 1)) - 1)) % 100"
      "WITH b AS (SELECT l_extendedprice, " +
        s"$bucket AS bucket FROM (" +
        "SELECT l_extendedprice, " +
        "md5(concat('aqp:', CAST(l_orderkey * 10 + l_linenumber AS VARCHAR))) AS h " +
        "FROM lineitem)), " +
        "a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total, " +
        "CAST(SUM(CASE WHEN bucket < 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_sample, " +
        "SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS exact_dec, " +
        "SUM(CASE WHEN bucket < 2 THEN CAST(l_extendedprice AS DECIMAL(18,4)) " +
        "ELSE CAST(0 AS DECIMAL(18,4)) END) AS samp_dec FROM b) " +
        "SELECT n_total, n_sample, " +
        Tables.r6sql("CAST(exact_dec AS DOUBLE)") + " AS exact_sum, " +
        Tables.r6sql("CAST(samp_dec AS DOUBLE) * CAST(n_total AS DOUBLE) / " +
          "CAST(n_sample AS DOUBLE)") + " AS est_sum, " +
        Tables.r6sql("ABS(CAST(samp_dec AS DOUBLE) * CAST(n_total AS DOUBLE) / " +
          "CAST(n_sample AS DOUBLE) - CAST(exact_dec AS DOUBLE)) / " +
          "CAST(exact_dec AS DOUBLE)") + " AS rel_err " +
        "FROM a"
    }),
    Q("q239_agg_topk_bounded", q239 _, Some(
      "SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (" +
        "SELECT o_orderpriority, o_orderkey, o_totalprice, " +
        "CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority " +
        "ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn FROM orders) " +
        "WHERE rn <= 3 ORDER BY o_orderpriority, rn")),
    Q("q230_agg_rollup_navigation", q230 _, Some(
      "WITH daily AS (SELECT SUBSTR(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 1, 7) " +
        "AS month, CAST(o_orderdate AS DATE) AS day, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS rev " +
        "FROM orders GROUP BY 1, 2), " +
        "m1 AS (SELECT month, CAST(COUNT(*) AS BIGINT) AS n_days, " +
        Tables.r6sql("CAST(SUM(rev) AS DOUBLE)") + " AS rev_rollup " +
        "FROM daily GROUP BY 1), " +
        "m2 AS (SELECT SUBSTR(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 1, 7) " +
        "AS month, " +
        Tables.r6sql("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)") +
        " AS rev_raw FROM orders GROUP BY 1) " +
        "SELECT m1.month, n_days, rev_rollup, rev_raw, " +
        "rev_rollup = rev_raw AS equal FROM m1 JOIN m2 ON m1.month = m2.month " +
        "ORDER BY m1.month")),
    Q("q229_agg_bitmap_distinct", q229 _, Some(
      "WITH b AS (SELECT event_type, user_id // 32 AS word, " +
        "(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INTEGER)) AS bit " +
        "FROM events), " +
        "m AS (SELECT event_type, word, BIT_OR(bit) AS mask FROM b GROUP BY 1, 2), " +
        "bm AS (SELECT event_type, CAST(SUM(bit_count(mask)) AS BIGINT) " +
        "AS n_distinct_bitmap FROM m GROUP BY 1), " +
        "d AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) " +
        "AS n_distinct_direct FROM events GROUP BY 1) " +
        "SELECT bm.event_type, n_distinct_bitmap, n_distinct_direct, " +
        "n_distinct_bitmap = n_distinct_direct AS agree " +
        "FROM bm JOIN d ON bm.event_type = d.event_type " +
        "ORDER BY bm.event_type")),
    Q("q12_agg_hash", q12 _, Some(
      "SELECT l_returnflag, l_linestatus, " +
        Tables.r6sql("CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)") + " AS sum_qty, " +
        Tables.r6sql("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)") + " AS sum_base_price, " +
        Tables.r6sql("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)") + " AS sum_disc_price, " +
        Tables.meanDSql("SUM(CAST(l_quantity AS DECIMAL(18,4)))", "COUNT(*)") + " AS avg_qty, " +
        "COUNT(*) AS cnt " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus")),
    Q("q13_agg_distinct", q13 _, Some(
      "SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS distinct_cust, COUNT(*) AS order_cnt " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus")),
    Q("q14_agg_approx_distinct", q14 _, None),
    Q("q15_agg_rollup", q15 _, Some(
      "SELECT r_name, n_name, " + Tables.r6sql("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)") + " AS revenue " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY ROLLUP (r_name, n_name) " +
        "ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST")),
    Q("q16_agg_cube", q16 _, Some(
      "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt FROM orders " +
        "GROUP BY CUBE (o_orderstatus, o_orderpriority) " +
        "ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST")),
    Q("q17_agg_grouping_sets", q17 _, Some(
      "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt, " +
        Tables.r6sql("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)") + " AS revenue " +
        "FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ()) " +
        "ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST")),
    Q("q18_agg_stats", q18 _, Some(
      "SELECT l_returnflag, n, " +
        Tables.r6sql("SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / " +
        "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))") + " AS stddev_price, " +
        Tables.r6sql("(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
        "(SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * " +
        "SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))") + " AS corr_price_qty " +
        "FROM (SELECT l_returnflag, COUNT(*) AS n, " +
        "SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS sx, " +
        "SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS sxx, " +
        "SUM(CAST(l_quantity AS DECIMAL(19,4))) AS sy, " +
        "SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS syy, " +
        "SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS sxy " +
        "FROM lineitem GROUP BY l_returnflag) ORDER BY l_returnflag")),
    Q("q19_agg_median", q19 _, Some(
      "SELECT c_mktsegment, " + Tables.r6sql("quantile_cont(o_totalprice, 0.5)") + " AS median_price, " +
        Tables.r6sql("quantile_cont(o_totalprice, 0.9)") + " AS p90_price " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment")),
    Q("q71_agg_pivot", q71 _, Some(
      "SELECT user_id, " +
        Seq("click", "view", "purchase", "signup", "error").map(t =>
          s"COUNT(CASE WHEN event_type = '$t' THEN 1 END) AS \"$t\"").mkString(", ") +
        " FROM events GROUP BY user_id ORDER BY user_id")),
    Q("q101_agg_unpivot", q101 _, Some(
      "WITH wide AS (SELECT user_id, " +
        Seq("click", "view", "purchase", "signup", "error").map(t =>
          s"COUNT(CASE WHEN event_type = '$t' THEN 1 END) AS \"$t\"").mkString(", ") +
        " FROM events GROUP BY user_id) " +
        "SELECT user_id, event_type, cnt FROM wide " +
        "UNPIVOT (cnt FOR event_type IN (click, \"view\", purchase, signup, error)) " +
        "ORDER BY user_id, event_type")),
    Q("q72_agg_collect", q72 _, Some(
      "SELECT c_nationkey, string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) " +
        "AS segments, COUNT(*) AS n FROM customer GROUP BY c_nationkey ORDER BY c_nationkey")),
    Q("q73_agg_argmax", q73 _, Some(
      "SELECT o_custkey, best_order, best_price, n_orders FROM (" +
        "SELECT o_custkey, o_orderkey AS best_order, o_totalprice AS best_price, " +
        "COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders, " +
        "ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn " +
        "FROM orders) WHERE rn = 1 ORDER BY o_custkey")),
    Q("q125_agg_regression", q125 _, Some {
      val n = "CAST(n AS DOUBLE)"; val sx = "CAST(sx AS DOUBLE)"
      val sxx = "CAST(sxx AS DOUBLE)"; val sy = "CAST(sy AS DOUBLE)"
      val syy = "CAST(syy AS DOUBLE)"; val sxy = "CAST(sxy AS DOUBLE)"
      "SELECT l_returnflag, n, " +
        Tables.r6sql(s"($n * $sxy - $sx * $sy) / ($n * $sxx - $sx * $sx)") + " AS slope, " +
        Tables.r6sql(s"($sy * $sxx - $sx * $sxy) / ($n * $sxx - $sx * $sx)") + " AS intercept, " +
        Tables.r6sql(s"($n * $sxy - $sx * $sy) * ($n * $sxy - $sx * $sy) / " +
          s"(($n * $sxx - $sx * $sx) * ($n * $syy - $sy * $sy))") + " AS r2 " +
        "FROM (SELECT l_returnflag, COUNT(*) AS n, " +
        "SUM(CAST(l_quantity AS DECIMAL(19,4))) AS sx, " +
        "SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS sxx, " +
        "SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS sy, " +
        "SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS syy, " +
        "SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS sxy " +
        "FROM lineitem GROUP BY l_returnflag) ORDER BY l_returnflag"
    }),
    Q("q128_agg_mode", q128 _, Some(
      "SELECT c_nationkey, mode_segment, cnt FROM (" +
        "SELECT c_nationkey, c_mktsegment AS mode_segment, cnt, " +
        "ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY cnt DESC, c_mktsegment) AS rn " +
        "FROM (SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt " +
        "FROM customer GROUP BY 1, 2)) WHERE rn = 1 ORDER BY c_nationkey")),
    // the oracle IS the full recompute — merged base+delta must equal it
    Q("q132_incremental_agg", q132 _, Some(
      "SELECT o_custkey, COUNT(*) AS n_orders, " +
        Tables.r6sql("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)") +
        " AS revenue FROM orders GROUP BY o_custkey ORDER BY o_custkey")),
    Q("q133_agg_chi_square", q133 _, Some(
      "WITH cells AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS o0 FROM customer GROUP BY 1, 2), " +
        "r AS (SELECT c_nationkey, COUNT(*) AS rn_ FROM customer GROUP BY 1), " +
        "c AS (SELECT c_mktsegment, COUNT(*) AS cn_ FROM customer GROUP BY 1), " +
        "n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_total FROM customer), " +
        "grid AS (SELECT r.c_nationkey, COALESCE(o0, 0) AS o, rn_ * cn_ / n_total AS e " +
        "FROM r CROSS JOIN c LEFT JOIN cells ON cells.c_nationkey = r.c_nationkey " +
        "AND cells.c_mktsegment = c.c_mktsegment CROSS JOIN n), " +
        "terms AS (SELECT c_nationkey, CAST(" +
        Tables.r6sql("(o - e) * (o - e) / e") + " AS DECIMAL(28,9)) AS term FROM grid) " +
        "SELECT c_nationkey, " + Tables.r6sql("CAST(SUM(term) AS DOUBLE)") + " AS chi2_part " +
        "FROM terms GROUP BY c_nationkey ORDER BY c_nationkey")),
    Q("q134_agg_gini", q134 _, Some(
      "WITH rev AS (SELECT c_mktsegment, c_custkey, " +
        "SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev " +
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2), " +
        "ranked AS (SELECT c_mktsegment, rev, " +
        "ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY rev, c_custkey) AS i FROM rev), " +
        "g AS (SELECT c_mktsegment, COUNT(*) AS n_cust, SUM(rev) AS sum_rev, " +
        "SUM(i * rev) AS iw_rev FROM ranked GROUP BY 1) " +
        "SELECT c_mktsegment, n_cust, " +
        Tables.r6sql("2.0 * CAST(iw_rev AS DOUBLE) / (n_cust * CAST(sum_rev AS DOUBLE)) - " +
          "CAST(n_cust + 1 AS DOUBLE) / n_cust") + " AS gini " +
        "FROM g ORDER BY c_mktsegment")),
    Q("q142_equidepth_bins", q142 _, Some {
      val cutsSel = (1 to 7).map(i =>
        Tables.r6sql(s"quantile_cont(o_totalprice, ${i / 8.0})") + s" AS c$i").mkString(", ")
      val binExpr = "1 + " + (1 to 7).map(i =>
        s"CAST(c$i < o_totalprice AS BIGINT)").mkString(" + ")
      s"WITH cuts AS (SELECT $cutsSel FROM orders), " +
        s"b AS (SELECT o_totalprice, $binExpr AS bin FROM orders CROSS JOIN cuts) " +
        "SELECT bin, COUNT(*) AS n, " +
        Tables.r6sql("MIN(o_totalprice)") + " AS lo, " +
        Tables.r6sql("MAX(o_totalprice)") + " AS hi " +
        "FROM b GROUP BY bin ORDER BY bin"
    }),
  )
}
