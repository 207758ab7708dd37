package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.2, q04–q11).
  *
  * Scale strategy per join shape (100 TB notes):
  *  - dimension tables (region/nation/customer-at-dim-size) are explicitly
  *    `broadcast()` — no shuffle of the fact side, ever;
  *  - fact⋈fact equi-joins (q05, q09) shuffle on the join key and rely on
  *    AQE for skew-split; the join key is the natural partition key so the
  *    shuffle is unavoidable and minimal;
  *  - the as-of join (q10) is a *window*, not a join — one shuffle on
  *    user_id, no row explosion, the standard distributed as-of plan;
  *  - the vector cross join (q11) is bounded to 10 probe rows and the probe
  *    side is broadcast → BroadcastNestedLoopJoin with no shuffle at all.
  *    At full scale the LSH machinery of q50/q62 replaces brute force.
  */
object Joins {
  import Tables.dec

  /** q04: broadcast inner equi-join chain customer⋈nation⋈region. */
  private def q04(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "customer")
      .join(broadcast(Tables(spark, sfDir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, sfDir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name").agg(count(lit(1)).as("cnt"))
      .orderBy("r_name")
  }

  /** q05: shuffle join lineitem⋈orders⋈customer⋈nation — flagship revenue
    * rollup (TPC-H Q5 analog). Facts shuffle on their join keys; nation is
    * broadcast. */
  private[graft] def q05(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(spark, sfDir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      // DECIMAL math internally (§2.9 R1), r6 DOUBLE on the wire: decimal
      // outputs hash differently across engines' physical encodings even
      // when values match (round-1 q05 lesson)
      .agg(Tables.r6(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double")).as("revenue"))
      .orderBy("n_name")
  }

  /** q06: left outer join keeping customers with zero orders. */
  private def q06(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "customer")
      .join(Tables(spark, sfDir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("order_cnt"))
      .orderBy("c_custkey")
  }

  /** q07: left semi — customers having ≥1 'F' order. */
  private def q07(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "customer")
      .join(Tables(spark, sfDir, "orders").filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_nationkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** q08: left anti — customers with no orders at all. */
  private def q08(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "customer")
      .join(Tables(spark, sfDir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_nationkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** q09: non-equi interval self-join — event pairs of the same user where
    * e2 falls within 5 minutes after e1. Event time is the canonical µs
    * `ts_us` (Tables.events) — both engines compare the same values
    * whatever the parquet physical encoding. The user_id equi-key keeps
    * this a shuffled equi-join with a range residual, NOT a nested-loop —
    * essential at scale. */
  private def q09(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val a = e.toDF("id1", "u1", "ts1")
    val b = e.toDF("id2", "u2", "ts2")
    a.join(b, col("u1") === col("u2") &&
        col("ts2") > col("ts1") &&
        col("ts2") <= col("ts1") + lit(300000000L) &&
        col("id1") < col("id2"))
      .select("id1", "id2")
      .orderBy("id1", "id2")
  }

  /** q10: as-of join — each purchase ↦ most recent prior signup ts of that
    * user, in canonical µs (see q09). Window formulation: one shuffle on
    * user_id, no join explosion. */
  private def q10(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, sfDir)
      .withColumn("last_signup_us",
        max(when(col("event_type") === "signup", col("ts_us"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("last_signup_us"))
      .orderBy("event_id")
  }

  /** Hard ceiling on the probe side of [[crossDotProducts]]. 1024 probe
    * rows × a 64-float embedding ≈ 0.3 MB broadcast — three orders of
    * magnitude under the 8 GB broadcast limit, and the corpus side
    * streams once per probe batch. Anything larger is no longer a
    * "bounded probe set" and must take an index path instead. */
  private[graft] val MaxCrossProbe = 1024L

  /** The brute-force probe×corpus dot-product behind q11, with the one
    * guard that keeps it scale-safe (VERDICT r9 item 1): the probe side
    * is COUNTED (a cheap pushed-down scan) and rejected above
    * [[MaxCrossProbe]] rows, so this path can never be handed a
    * corpus-sized frame and silently plan an O(n²) nested-loop join.
    * Corpus-scale similarity belongs to the index paths: LSH
    * (q124_ann_hyperplane) or IVF (q63_ann_ivf / NearDup.ivfTopK).
    * The RAW user-written shape (no helper, no guard) is governed by
    * [[graft.plans.SimilarityBandRewrite]]: above the measured pair-count
    * crossover the optimizer substitutes the banded LSH equi-join
    * automatically (r12 item 1) — this helper's broadcast hint marks the
    * probe side as deliberately bounded, which that rule honors. */
  private[graft] def crossDotProducts(probe: DataFrame, corpus: DataFrame): DataFrame = {
    val nProbe = probe.count()
    require(nProbe <= MaxCrossProbe,
      s"crossDotProducts: probe side has $nProbe rows (limit $MaxCrossProbe) — " +
        "the brute-force cross join is reserved for a bounded probe set; " +
        "use the LSH path (q124_ann_hyperplane) or the IVF path " +
        "(q63_ann_ivf / NearDup.ivfTopK) for corpus-scale similarity")
    broadcast(probe).join(corpus, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Tables.r6(aggregate(
          zip_with(col("ea"), col("eb"), (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x)).as("dot"))
      .orderBy("id_a", "id_b")
  }

  /** q11: bounded cross join — 10 probe vectors × all embeddings, exact
    * dot product via zip_with/aggregate fold (fixed element order ⇒
    * deterministic double). Probe side size-gated then broadcast ⇒ no
    * shuffle; see [[crossDotProducts]]. */
  private def q11(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables(spark, sfDir, "embeddings")
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea")).filter(col("id_a") < 10)
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    crossDotProducts(a, b)
  }

  /** q88: bucketed co-located join — both sides written `bucketBy` on the
    * join key, then joined WITHOUT a join-side shuffle (the bucketed scan
    * already satisfies the join's required distribution; ScaleJoinsSuite
    * asserts the exchange-free plan). This is the layout that carries a
    * fact table joined on the same key daily at 100 TB: pay the shuffle
    * once at write time, never again. Output is layout-independent, so
    * the oracle is the plain join on the original parquet. */
  private def q88(spark: SparkSession, sfDir: String): DataFrame = {
    // the sfDir tag is part of the CATALOG NAME, not only the path:
    // fixed names let two scale factors (or two sessions on one
    // metastore) clobber each other's tables mid-query. Re-invocations
    // for the same sfDir reuse the existing layout instead of re-paying
    // the bucketed write — which is the whole point of the operator
    // (pay the shuffle once at write time). First invocation per sfDir
    // still includes the write in its bench time; documented.
    val tag = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_bucketed$tag"
    val ordersT = s"graft_orders_b$tag"
    val custT = s"graft_customer_b$tag"
    // project to the join/agg columns before the bucketed write — the
    // layout is what this operator proves; unread columns only add sink IO
    // skip only when the catalog entry AND its files both survive — a
    // catalog entry can outlive a cleaned tmpdir within one session
    def layoutReady(table: String, path: String): Boolean =
      spark.catalog.tableExists(table) && new java.io.File(path).exists()
    if (!layoutReady(ordersT, s"$base/orders_b"))
      Tables(spark, sfDir, "orders").select("o_custkey", "o_totalprice")
        .write.mode("overwrite")
        .format("parquet").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$base/orders_b").saveAsTable(ordersT)
    if (!layoutReady(custT, s"$base/customer_b"))
      Tables(spark, sfDir, "customer").select("c_custkey", "c_mktsegment")
        .write.mode("overwrite")
        .format("parquet").bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$base/customer_b").saveAsTable(custT)
    spark.table(ordersT)
      .join(spark.table(custT), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        Tables.r6(sum(dec(col("o_totalprice"))).cast("double")).as("revenue"))
      .orderBy("c_mktsegment")
  }

  /** q89: salted skew join as a first-class VERIFIED operator — the
    * explicit fallback for key skew so pathological that even AQE's
    * split partitions of one key overwhelm a task (ScaleJoins.saltedJoin:
    * hot keys spread over 8 salt buckets, dim side replicated per salt).
    * Output is layout/salt-independent, so the oracle is the plain join —
    * the same guarantee ScaleJoinsSuite asserts on a synthetic skewed
    * key, here proven through the driver's hash gate on real tables. */
  private def q89(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables(spark, sfDir, "orders").select("o_custkey", "o_totalprice")
    val cust = Tables(spark, sfDir, "customer").select("c_custkey", "c_nationkey")
    graft.plans.ScaleJoins.saltedJoin(orders, cust, col("o_custkey"), col("c_custkey"), 8)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_orders"),
        Tables.r6(sum(dec(col("o_totalprice"))).cast("double")).as("revenue"))
      .orderBy("c_nationkey")
  }

  /** q90: fuzzy string match — levenshtein top-3 most-similar names per
    * probe (10 probes, broadcast ⇒ the big side streams once, no
    * shuffle until the top-k window). Rank on (distance, id) so ties
    * resolve identically on both engines; levenshtein cast to bigint
    * (Spark INT vs DuckDB BIGINT — §2.9 type-width rule). The bounded
    * probe side is the scale contract, exactly like q51's top-k. */
  private def q90(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables(spark, sfDir, "customer")
    val probes = cust.filter(col("c_custkey") <= 10)
      .select(col("c_custkey").as("id_p"), col("c_name").as("name_p"))
    val cand = cust.select(col("c_custkey").as("id_c"), col("c_name").as("name_c"))
    val w = Window.partitionBy("id_p").orderBy(col("dist"), col("id_c"))
    broadcast(probes).join(cand, col("id_p") =!= col("id_c"))
      .select(col("id_p"), col("id_c"),
        levenshtein(col("name_p"), col("name_c")).cast("bigint").as("dist"))
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= 3)
      .orderBy("id_p", "rn")
  }

  /** q96: large-order pipeline (TPC-H Q18 shape) — the integration query
    * that chains the core operators: a HAVING subquery over lineitem
    * (big-order keys), IN-semi-joined back to the fact, joined to the
    * customer dim, re-aggregated, global top-100. At scale: the
    * big-order key set is small (the HAVING filter is selective) so the
    * semi join broadcasts; the remaining shuffles are the two
    * natural-key aggregations; the top-100 fuses to
    * TakeOrderedAndProject — no global sort of the join output. */
  private def q96(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables(spark, sfDir, "lineitem")
    val bigOrders = li.groupBy("l_orderkey")
      .agg(sum(dec(col("l_quantity"))).as("qty"))
      .filter(col("qty") > 150)
      .select("l_orderkey")
    li.join(broadcast(bigOrders), "l_orderkey")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "o_orderkey", "o_totalprice")
      .agg(Tables.r6(sum(dec(col("l_quantity"))).cast("double")).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** q139: join-key skew diagnostics — the pre-flight report that decides
    * between a plain shuffle join, AQE skew-split, and q89's salted join:
    * per candidate key column (lineitem.l_orderkey, orders.o_custkey,
    * events.user_id), the row count, distinct keys, the hottest key's
    * share of all rows, and the p50/p99 per-key multiplicities. One
    * count-per-key aggregate per column plus a bounded two-pass quantile
    * fold ([[graft.plans.BoundedQuantiles]]) — shuffle bounded by key
    * cardinality, never raw rows past the partial agg, and no
    * aggregation buffer grows with the distinct-multiplicity count. The top1/p99-vs-p50 ratio is exactly what sizes the salt fan-out
    * (ScaleJoins.saltedJoin's bucket count). */
  private def q139(spark: SparkSession, sfDir: String): DataFrame = {
    // per-key multiplicities of all three tables in ONE tagged frame: the
    // tag is the quantile fold's group key, so the whole report needs a
    // single BoundedQuantiles invocation (not one per table — measured 2×
    // cheaper in bench-scale stage overhead). The frame feeds the summary
    // aggregate and both quantile passes — materialize once (bounded by
    // key cardinality; a cluster deployment would use durable
    // checkpoint()). BoundedQuantiles replaces the builtin percentile
    // whose single merge buffer held every distinct multiplicity —
    // unbounded when per-key counts are all-distinct (e.g. key i seen i
    // times).
    def keyCounts(df: DataFrame, keyCol: String, tag: String): DataFrame =
      df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
        .select(lit(tag).as("key_col"), col("c"))
    val counts =
      keyCounts(Tables(spark, sfDir, "lineitem"), "l_orderkey", "lineitem.l_orderkey")
        .unionByName(keyCounts(Tables(spark, sfDir, "orders"), "o_custkey", "orders.o_custkey"))
        .unionByName(keyCounts(Tables(spark, sfDir, "events"), "user_id", "events.user_id"))
        .transform(graft.plans.CorpusPin.pin)
    val summary = counts.groupBy("key_col").agg(
      sum(col("c")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("c")).as("max_per_key"))
    val qs = graft.plans.BoundedQuantiles.groupQuantiles(
      counts, Seq("key_col"), col("c"), Seq(0.5, 0.99), Seq("p50_raw", "p99_raw"), pin = false)
    summary.join(broadcast(qs), "key_col")
      .select(col("key_col"),
        col("n_rows").cast("bigint").as("n_rows"),
        col("n_keys"), col("max_per_key"),
        Tables.r6(col("max_per_key").cast("double") / col("n_rows")).as("top1_share"),
        Tables.r6(col("p50_raw")).as("p50_per_key"),
        Tables.r6(col("p99_raw")).as("p99_per_key"))
      .orderBy("key_col")
  }

  /** q276: join-fanout audit — the "will this join explode" guard run
    * BEFORE a planned join (here orders.o_custkey ⋈ events.user_id, the
    * enrichment shape): per-key multiplicities on both sides multiply
    * into exact pair counts, Σ products = the exact output cardinality
    * the join would produce, amplification = est_rows / max(input
    * sizes). Output = the top-10 contributing keys with the global
    * estimate attached — the keys you'd salt (q89) or pre-aggregate
    * away. Complements q139 (single-table skew): this is the JOINT
    * statistic, which single-side histograms can't give.
    *
    * Scale: two map-side-combined groupBys collapse each side to its
    * key domain; the count-join and Σ-product run on key-bounded
    * frames; totals are 1-row folds; top-10 is TakeOrderedAndProject.
    * The estimate costs two scans and key-sized shuffles — strictly
    * cheaper than the join it predicts. */
  private def q276(spark: SparkSession, sfDir: String): DataFrame = {
    val ca = Tables(spark, sfDir, "orders")
      .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("cnt_a"))
    val cb = Tables(spark, sfDir, "events")
      .groupBy(col("user_id").as("k")).agg(count(lit(1)).as("cnt_b"))
    val prod = ca.join(cb, "k")
      .select(col("k"), col("cnt_a"), col("cnt_b"),
        (col("cnt_a") * col("cnt_b")).as("pair_rows"))
      .transform(graft.plans.CorpusPin.pin) // key-bounded; est fold + top-10 share it
    val na = Tables(spark, sfDir, "orders").agg(count(lit(1)).as("na"))
    val nb = Tables(spark, sfDir, "events").agg(count(lit(1)).as("nb"))
    val est = prod.agg(sum("pair_rows").as("est_rows"))
    prod.orderBy(col("pair_rows").desc, col("k")).limit(10)
      .crossJoin(broadcast(est)).crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("k").as("join_key"), col("cnt_a"), col("cnt_b"),
        col("pair_rows"), col("est_rows"),
        Tables.r6(col("est_rows") / greatest(col("na"), col("nb")))
          .as("amplification"))
      .orderBy(col("pair_rows").desc, col("join_key"))
  }

  /** q180: dimension-enrichment aggregate — the batch proof of the
    * stream–static join (StreamOps.enrichStatic runs the SAME shape on
    * the incremental engine): the events fact stream joined to the
    * broadcast customer dimension on user_id, aggregated per
    * (segment, type). The canonical "enrich the stream with a slowly-
    * changing dim, then aggregate" pipeline stage.
    *
    * Scale: the dimension broadcasts (dims are orders of magnitude below
    * fact volume by construction); the fact side streams through ONE
    * map-side-combined aggregation whose shuffle is bounded by
    * segments × types — raw events never shuffle. */
  private def q180(spark: SparkSession, sfDir: String): DataFrame = {
    val seg = Tables(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    Tables(spark, sfDir, "events")
      .join(broadcast(seg), col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("cnt"),
        Tables.r6(sum(Tables.dec(col("value"))).cast("double")).as("sum_value"))
      .orderBy("c_mktsegment", "event_type")
  }

  /** q194: point-in-time VALIDITY-WINDOW join — each lineitem shipment
    * is assigned the customer's order-priority regime valid at its ship
    * date, where a regime (set by each order) EXPIRES after 30 days.
    * This is the temporal join q10's as-of cannot express: as-of always
    * matches the latest earlier version, but with bounded validity a
    * shipment landing in a coverage GAP (last regime older than the
    * TTL) must get NO match — the point-in-time-correctness shape of
    * feature stores and TTL'd dimension caches.
    *
    * Plan: the standard single-shuffle formulation — regimes and facts
    * UNION into one stream, ONE customer-keyed window carries the last
    * regime's (priority, day) forward (IGNORE NULLS last_value), and
    * the TTL gate is a per-row comparison. No range join, no
    * per-interval explode; the shuffle is the same one any per-customer
    * window pays. Day arithmetic is pure integer (epoch days from the
    * naive DATE cast — timezone-independent, R3). Total order inside a
    * customer: (day, kind, orderkey, linenumber) with regimes sorted
    * BEFORE same-day shipments so a same-day order covers its own
    * shipment. */
  private def q194(spark: SparkSession, sfDir: String): DataFrame = {
    val epoch = lit("1970-01-01").cast("date")
    val orders = Tables(spark, sfDir, "orders")
    val regimes = orders
      .select(col("o_custkey").as("cust"),
        datediff(col("o_orderdate").cast("date"), epoch).cast("bigint").as("t"),
        lit(0L).as("kind"), col("o_orderkey").as("id"), lit(0).as("line"),
        col("o_orderpriority").as("prio"))
    val facts = Tables(spark, sfDir, "lineitem")
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"),
        datediff(col("l_shipdate").cast("date"), epoch).cast("bigint").as("t"),
        lit(1L).as("kind"), col("l_orderkey").as("id"),
        col("l_linenumber").as("line"), lit(null).cast("string").as("prio"))
    val w = Window.partitionBy("cust")
      .orderBy(col("t"), col("kind"), col("id"), col("line"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    regimes.unionByName(facts)
      .withColumn("p_carr", last(col("prio"), ignoreNulls = true).over(w))
      .withColumn("t_carr",
        last(when(col("kind") === 0L, col("t")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1L)
      .select(col("cust"), col("id").as("l_orderkey"), col("line").as("l_linenumber"),
        col("t").as("ship_day"),
        when(col("t") - col("t_carr") <= 30L, col("p_carr")).as("prio_at_ship"))
      .withColumn("covered", col("prio_at_ship").isNotNull)
      .orderBy("cust", "ship_day", "l_orderkey", "l_linenumber")
  }

  /** q221: the NATIVE as-of join exec (graft.plans.AsOfJoinPlan) under
    * the oracle gate — q10 proves the window FORMULATION of as-of, q221
    * proves the custom LogicalPlan + Strategy + SparkPlan path end-to-end
    * against DuckDB's own built-in ASOF JOIN: each lineitem shipment
    * picks up the customer's priority regime from the latest order at or
    * before its ship date. Versions dedup to one row per (customer, day)
    * first (max orderkey wins) — the native exec resolves (key, t) ties
    * by partition sort order, which a distributed sort leaves undefined.
    *
    * Scale: see AsOfJoinPlan — SortMergeJoin's co-partitioning contract,
    * one forward merge pass, O(1) state, no window re-sort of the
    * version side. */
  private def q221(spark: SparkSession, sfDir: String): DataFrame = {
    val epoch = lit("1970-01-01").cast("date")
    val orders = Tables(spark, sfDir, "orders")
    val versions = orders
      .groupBy(col("o_custkey").as("key"),
        datediff(col("o_orderdate").cast("date"), epoch).cast("bigint").as("t"))
      .agg(max(struct(col("o_orderkey"), col("o_orderpriority"))).as("m"))
      .select(col("key"), col("t"), col("m.o_orderpriority").as("v"))
    val facts = Tables(spark, sfDir, "lineitem")
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("key"),
        datediff(col("l_shipdate").cast("date"), epoch).cast("bigint").as("t"),
        col("l_orderkey"), col("l_linenumber"))
    graft.Graft.asofJoinNative(facts, versions)
      .select(col("key").as("custkey"), col("l_orderkey"), col("l_linenumber"),
        col("t").as("ship_day"), col("v_asof").as("prio_asof"))
      .orderBy("custkey", "ship_day", "l_orderkey", "l_linenumber")
  }

  /** Band half-width for q249 (µs): ±4 hours — wide enough that the
    * window buffer holds multiple candidates per click at test SFs
    * (exercising the multi-match sweep, not just 0/1 windows). */
  private val BandDeltaUs = 14400000000L

  /** q249: NATIVE band join — every click paired with every purchase by
    * the SAME user within ±4 hours ([[BandDeltaUs]]), via the second custom physical
    * operator ([[graft.plans.BandJoin]] + Strategy + BandJoinExec; the
    * q221 tier). The "events near events" interval shape: q10/q221
    * carry ONE latest version forward, q249 emits the whole admissible
    * WINDOW — what the declarative theta join (key-equi then band
    * filter AFTER a full per-key fan-out) and the q205 bucket trick
    * (3× explode + dedup) both approximate.
    *
    * Exec contract: ClusteredDistribution on the key + per-partition
    * (key, t) sorts (SortMergeJoin's contract — free on bucketed/sorted
    * layouts), then one forward sweep whose state is the rows inside a
    * 2·delta span per key, never the key's row count. Oracle: the
    * band theta join stated directly in SQL — the result sets must
    * agree row-for-row (the two-native-engines pattern). */
  private def q249(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("key"), col("ts_us").as("t"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("key"), col("ts_us").as("t"),
        col("event_id").cast("string").as("v"))
    graft.Graft.bandJoinNative(clicks, purchases, BandDeltaUs)
      .select(col("key").as("user_id"), col("t").as("click_us"),
        col("event_id").as("click_id"), col("t_match").as("purchase_us"),
        col("v_match").as("purchase_id"))
      .orderBy("user_id", "click_us", "click_id", "purchase_us", "purchase_id")
  }

  /** q225: grid-bucketed spatial proximity join — all point pairs within
    * radius 5 on a synthetic 1000×1000 integer plane (coordinates
    * md5-derived from the customer key, so both engines construct the
    * identical point set). The SPATIAL-JOIN PATTERN is the payload: index
    * side keyed by its grid cell (cell = coord DIV 10, cell size ≥
    * radius), probe side exploded to its 3×3 neighbor cells, candidates
    * from the pure EQUI-join on the cell key, exact distance filter
    * per-row. Integer coordinates make d² exact int64 — the geo family's
    * algorithm without the sin/cos cross-engine parity hazard (§2.9 R6:
    * only ln has verified libm parity).
    *
    * Scale: this is how every distributed spatial join runs (geohash/S2
    * cells at planet scale): fan-out is a constant 9, the join is
    * hash-partitioned on cells, and no point ever compares against more
    * than its neighborhood. */
  private def q225(spark: SparkSession, sfDir: String): DataFrame = {
    def hx(salt: String): Column = expr(
      s"((instr('0123456789abcdef', substring(md5(concat('$salt', " +
        "CAST(c_custkey AS STRING))), 1, 1)) - 1) * 256 + " +
        s"(instr('0123456789abcdef', substring(md5(concat('$salt', " +
        "CAST(c_custkey AS STRING))), 2, 1)) - 1) * 16 + " +
        s"(instr('0123456789abcdef', substring(md5(concat('$salt', " +
        "CAST(c_custkey AS STRING))), 3, 1)) - 1)) % 1000")
    val pts = Tables(spark, sfDir, "customer")
      .select(col("c_custkey").as("id"),
        hx("px:").cast("bigint").as("x"), hx("py:").cast("bigint").as("y"))
      .transform(graft.plans.CorpusPin.pin) // index side + probe side read it
    val indexed = pts.select(col("id").as("id_b"), col("x").as("xb"),
      col("y").as("yb"), expr("x DIV 10").as("cx"), expr("y DIV 10").as("cy"))
    val probes = pts.select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        explode(expr("flatten(transform(sequence(-1, 1), dx -> " +
          "transform(sequence(-1, 1), dy -> " +
          "named_struct('cx', x DIV 10 + dx, 'cy', y DIV 10 + dy))))")).as("c"))
      .select(col("id_a"), col("xa"), col("ya"), col("c.cx"), col("c.cy"))
    probes.join(indexed, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("d2", (col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("d2") <= 25L)
      .select("id_a", "id_b", "d2").distinct()
      .orderBy("id_a", "id_b")
  }

  /** q234: Bloom-prefiltered selective join — orders joined to the
    * BUILDING-segment customers with the fact side pruned by an 8 KB
    * Bloom mask of the dim keys BEFORE the join
    * ([[graft.plans.ScaleJoins.bloomPrefilter]]; the runtime row-level
    * filtering pattern). The scale gap this fills: q04's broadcast join
    * needs the dim's full hash relation to fit on every executor, q05's
    * shuffle join ships EVERY fact row; when the dim is
    * broadcast-too-big but the join selective, the dim's KEY SET still
    * compresses to a constant-size bit mask that broadcasts at any
    * cardinality and kills non-matching fact rows map-side, pre-shuffle.
    *
    * Correctness is exact, not approximate: the Bloom admits no false
    * negatives and the exact join removes its false positives, so the
    * result — and the oracle — is the plain join's (the join itself is
    * left unhinted: stats/AQE pick broadcast here and sort-merge at
    * scale, with the mask having already shrunk the fact side either
    * way). ScaleJoinsSuite measures the pruning and the FPR. */
  private def q234(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .transform(graft.plans.CorpusPin.pin) // key projection (mask build) + exact join side
    val pruned = graft.plans.ScaleJoins.bloomPrefilter(
      Tables(spark, sfDir, "orders"), col("o_custkey"), cust.select("c_custkey"))
    pruned.join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        Tables.r6(sum(dec(col("o_totalprice"))).cast("double")).as("revenue"))
      .orderBy("o_orderpriority")
  }

  val entries: Seq[Q] = Seq(
    Q("q249_join_band_native", q249 _, Some(
      "SELECT c.user_id, epoch_us(c.ts) AS click_us, c.event_id AS click_id, " +
        "epoch_us(p.ts) AS purchase_us, CAST(p.event_id AS VARCHAR) AS purchase_id " +
        "FROM events c JOIN events p ON c.user_id = p.user_id " +
        s"AND abs(epoch_us(c.ts) - epoch_us(p.ts)) <= $BandDeltaUs " +
        "WHERE c.event_type = 'click' AND p.event_type = 'purchase' " +
        "ORDER BY 1, 2, 3, 4, 5")),
    Q("q234_join_bloom_prefilter", q234 _, Some(
      // the Bloom is a pure pre-shuffle reduction: the exact join result
      // IS the plain selective join, which is what the oracle states
      "SELECT o_orderpriority, COUNT(*) AS n_orders, " +
        Tables.r6sql("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)") +
        " AS revenue FROM orders JOIN customer ON o_custkey = c_custkey " +
        "WHERE c_mktsegment = 'BUILDING' " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority")),
    Q("q225_join_spatial_grid", q225 _, Some {
      // the oracle states the SEMANTICS as the direct all-pairs
      // inequality join over the identically-constructed point set
      def hx(salt: String) =
        s"((strpos('0123456789abcdef', substr(md5('$salt' || " +
          "CAST(c_custkey AS VARCHAR)), 1, 1)) - 1) * 256 + " +
          s"(strpos('0123456789abcdef', substr(md5('$salt' || " +
          "CAST(c_custkey AS VARCHAR)), 2, 1)) - 1) * 16 + " +
          s"(strpos('0123456789abcdef', substr(md5('$salt' || " +
          "CAST(c_custkey AS VARCHAR)), 3, 1)) - 1)) % 1000"
      s"WITH pts AS (SELECT c_custkey AS id, CAST(${hx("px:")} AS BIGINT) AS x, " +
        s"CAST(${hx("py:")} AS BIGINT) AS y FROM customer) " +
        "SELECT a.id AS id_a, b.id AS id_b, " +
        "(a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2 " +
        "FROM pts a JOIN pts b ON a.id < b.id " +
        "WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 25 " +
        "ORDER BY id_a, id_b"
    }),
    Q("q221_join_asof_native", q221 _, Some(
      // the oracle is DuckDB's OWN built-in ASOF JOIN — two independent
      // native implementations of the same semantics must agree
      "WITH v AS (SELECT o_custkey AS key, " +
        "CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS t, " +
        "MAX({'k': o_orderkey, 'p': o_orderpriority}).p AS v " +
        "FROM orders GROUP BY 1, 2), " +
        "f AS (SELECT o_custkey AS key, " +
        "CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS t, " +
        "l_orderkey, l_linenumber " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey) " +
        "SELECT f.key AS custkey, f.l_orderkey, f.l_linenumber, " +
        "f.t AS ship_day, v.v AS prio_asof " +
        "FROM f ASOF LEFT JOIN v ON f.key = v.key AND v.t <= f.t " +
        "ORDER BY custkey, ship_day, l_orderkey, l_linenumber")),
    Q("q194_join_point_in_time", q194 _, Some(
      "WITH reg AS (SELECT o_custkey AS cust, " +
        "CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS t, " +
        "CAST(0 AS BIGINT) AS kind, o_orderkey AS id, 0 AS line, " +
        "o_orderpriority AS prio FROM orders), " +
        "fct AS (SELECT o_custkey AS cust, " +
        "CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS t, " +
        "CAST(1 AS BIGINT) AS kind, l_orderkey AS id, l_linenumber AS line, " +
        "CAST(NULL AS VARCHAR) AS prio " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey), " +
        "u AS (SELECT * FROM reg UNION ALL SELECT * FROM fct), " +
        "c AS (SELECT cust, t, kind, id, line, " +
        "LAST_VALUE(prio IGNORE NULLS) OVER w AS p_carr, " +
        "LAST_VALUE(CASE WHEN kind = 0 THEN t END IGNORE NULLS) OVER w AS t_carr " +
        "FROM u WINDOW w AS (PARTITION BY cust ORDER BY t, kind, id, line " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
        "SELECT cust, id AS l_orderkey, line AS l_linenumber, t AS ship_day, " +
        "CASE WHEN t - t_carr <= 30 THEN p_carr END AS prio_at_ship, " +
        "(CASE WHEN t - t_carr <= 30 THEN p_carr END) IS NOT NULL AS covered " +
        "FROM c WHERE kind = 1 ORDER BY cust, ship_day, l_orderkey, l_linenumber")),
    Q("q04_join_broadcast", q04 _, Some(
      "SELECT r_name, COUNT(*) AS cnt FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY r_name ORDER BY r_name")),
    Q("q05_join_shuffle", q05 _, Some(
      "SELECT n_name, " + Tables.r6sql("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)") + " AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY n_name ORDER BY n_name")),
    Q("q06_join_left_outer", q06 _, Some(
      "SELECT c_custkey, COUNT(o_orderkey) AS order_cnt FROM customer " +
        "LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey ORDER BY c_custkey")),
    Q("q07_join_semi", q07 _, Some(
      "SELECT c_custkey, c_nationkey, c_mktsegment FROM customer WHERE EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F') " +
        "ORDER BY c_custkey")),
    Q("q08_join_anti", q08 _, Some(
      "SELECT c_custkey, c_nationkey, c_mktsegment FROM customer WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey")),
    Q("q09_join_range_theta", q09 _, Some(
      "SELECT a.event_id AS id1, b.event_id AS id2 FROM events a JOIN events b " +
        "ON a.user_id = b.user_id AND epoch_us(b.ts) > epoch_us(a.ts) " +
        "AND epoch_us(b.ts) <= epoch_us(a.ts) + 300000000 AND a.event_id < b.event_id " +
        "ORDER BY id1, id2")),
    Q("q10_join_asof", q10 _, Some(
      "SELECT event_id, user_id, ts_us, last_signup_us FROM (" +
        "SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, " +
        "MAX(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) OVER (" +
        "PARTITION BY user_id ORDER BY epoch_us(ts), event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_signup_us FROM events) " +
        "WHERE event_type = 'purchase' ORDER BY event_id")),
    Q("q96_join_bigorder_pipeline", q96 _, Some(
      "SELECT c_custkey, o_orderkey, o_totalprice, " +
        Tables.r6sql("CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)") + " AS sum_qty " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "WHERE l_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey " +
        "HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 150) " +
        "GROUP BY c_custkey, o_orderkey, o_totalprice " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100")),
    Q("q89_join_salted", q89 _, Some(
      "SELECT c_nationkey, COUNT(*) AS n_orders, " +
        Tables.r6sql("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)") + " AS revenue " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_nationkey ORDER BY c_nationkey")),
    Q("q90_join_fuzzy_topk", q90 _, Some(
      "SELECT id_p, id_c, dist, rn FROM (SELECT a.c_custkey AS id_p, b.c_custkey AS id_c, " +
        "levenshtein(a.c_name, b.c_name) AS dist, " +
        "ROW_NUMBER() OVER (PARTITION BY a.c_custkey " +
        "ORDER BY levenshtein(a.c_name, b.c_name), b.c_custkey) AS rn " +
        "FROM customer a JOIN customer b ON a.c_custkey <= 10 AND a.c_custkey <> b.c_custkey) " +
        "WHERE rn <= 3 ORDER BY id_p, rn")),
    Q("q88_join_bucketed", q88 _, Some(
      "SELECT c_mktsegment, COUNT(*) AS n_orders, " +
        Tables.r6sql("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)") + " AS revenue " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment")),
    Q("q11_join_cross_topk", q11 _, Some(
      "SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        Tables.r6sql("list_sum(list_transform(range(1,65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))") + " AS dot " +
        "FROM embeddings a, embeddings b WHERE a.vec_id < 10 AND a.vec_id < b.vec_id " +
        "ORDER BY id_a, id_b")),
    Q("q139_skew_report", q139 _, Some {
      def prof(table: String, key: String) =
        s"SELECT '$table.$key' AS key_col, CAST(SUM(c) AS BIGINT) AS n_rows, " +
          "COUNT(*) AS n_keys, MAX(c) AS max_per_key, " +
          Tables.r6sql("CAST(MAX(c) AS DOUBLE) / SUM(c)") + " AS top1_share, " +
          Tables.r6sql("quantile_cont(c, 0.5)") + " AS p50_per_key, " +
          Tables.r6sql("quantile_cont(c, 0.99)") + " AS p99_per_key " +
          s"FROM (SELECT $key AS k, COUNT(*) AS c FROM $table GROUP BY $key)"
      prof("lineitem", "l_orderkey") + " UNION ALL " +
        prof("orders", "o_custkey") + " UNION ALL " +
        prof("events", "user_id") + " ORDER BY key_col"
    }),
    Q("q180_stream_enrich", q180 _, Some(
      "SELECT c_mktsegment, event_type, COUNT(*) AS cnt, " +
        Tables.r6sql("CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)") + " AS sum_value " +
        "FROM events JOIN customer ON user_id = c_custkey " +
        "GROUP BY 1, 2 ORDER BY 1, 2")),
    Q("q276_join_fanout_audit", q276 _, Some(
      "WITH ca AS (SELECT o_custkey AS k, COUNT(*) AS cnt_a FROM orders GROUP BY 1), " +
        "cb AS (SELECT user_id AS k, COUNT(*) AS cnt_b FROM events GROUP BY 1), " +
        "prod AS (SELECT k, cnt_a, cnt_b, cnt_a * cnt_b AS pair_rows " +
        "FROM ca JOIN cb USING (k)), " +
        "est AS (SELECT CAST(SUM(pair_rows) AS BIGINT) AS est_rows FROM prod), " +
        "na AS (SELECT COUNT(*) AS na FROM orders), " +
        "nb AS (SELECT COUNT(*) AS nb FROM events), " +
        "top AS (SELECT * FROM prod ORDER BY pair_rows DESC, k LIMIT 10) " +
        "SELECT k AS join_key, cnt_a, cnt_b, pair_rows, est_rows, " +
        Tables.r6sql("est_rows / greatest(na, nb)") + " AS amplification " +
        "FROM top CROSS JOIN est CROSS JOIN na CROSS JOIN nb " +
        "ORDER BY pair_rows DESC, join_key")),
  )
}
