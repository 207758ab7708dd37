package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch aggregates (SURVEY.md §2.8b, q111–q113) over the
  * Apache DataSketches integration that ships with Spark 4.1 — the
  * canonical 100 TB answer to distinct counting, quantiles, and set
  * overlap:
  *
  *  - exact DISTINCT/percentile over 100 TB needs a full shuffle of the
  *    key universe; a sketch is a few KB per partition, partial-
  *    aggregates map-side, merges associatively, and can be PERSISTED
  *    per day/shard and re-merged later without touching the raw data —
  *    the pre-aggregated-rollup pattern (build once per partition,
  *    answer forever);
  *  - HLL and Theta sketches are order- and partitioning-independent
  *    (register-max / k-min-hash structures), so estimates are stable
  *    across cluster layouts.
  *
  * No DuckDB oracle exists for sketch estimates (DuckDB's approx_* uses
  * a different HLL implementation), so like q14 these three are
  * documented no-oracle entries: the driver records a rows-only check
  * and SketchSuite asserts error bounds against exact answers plus the
  * merge-equals-whole-corpus identity that makes sketches trustworthy
  * at scale.
  */
object SketchOps {

  private val usPerDay = 86400000000L

  /** q111: mergeable distinct counting — per-day HLL sketches of
    * user_id; the global count re-derives by UNIONING the daily
    * sketches (hll_union_agg), never re-scanning the corpus. Output:
    * one row per day with the daily estimate and the shared
    * merged-global estimate. */
  private def q111(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .withColumn("day", expr(s"ts_us DIV $usPerDay"))
      .groupBy("day")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val global = daily.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("global_users"))
    daily
      .select(col("day"), hll_sketch_estimate(col("sk")).as("daily_users"))
      .crossJoin(broadcast(global))
      .orderBy("day")
  }

  /** q112: mergeable quantiles — per-language KLL sketches of document
    * length; p50/p90/p99 read from the sketch. At scale the per-shard
    * sketches persist and re-merge (kll_sketch_merge) instead of
    * re-sorting the corpus for every percentile question. */
  private def q112(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "documents")
      .groupBy("lang")
      .agg(kll_sketch_agg_bigint(col("n_chars")).as("sk"),
        count(lit(1)).as("n_docs"))
      .select(col("lang"), col("n_docs"),
        kll_sketch_get_quantile_bigint(col("sk"), lit(0.5)).as("p50"),
        kll_sketch_get_quantile_bigint(col("sk"), lit(0.9)).as("p90"),
        kll_sketch_get_quantile_bigint(col("sk"), lit(0.99)).as("p99"))
      .orderBy("lang")
  }

  /** q113: set-overlap without a join — Theta sketches of the click and
    * purchase user sets; union and intersection cardinalities come from
    * sketch algebra (theta_union_agg / theta_intersection_agg) instead
    * of a distinct-distinct join of the two key universes. The audience-
    * overlap question every analytics pipeline asks, answerable from
    * per-segment sketches alone. */
  private def q113(spark: SparkSession, sfDir: String): DataFrame = {
    val sk = Tables(spark, sfDir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy("event_type")
      .agg(theta_sketch_agg(col("user_id")).as("sk"))
    sk.agg(
      theta_sketch_estimate(theta_union_agg(col("sk"))).as("users_either"),
      theta_sketch_estimate(theta_intersection_agg(col("sk"))).as("users_both"))
  }

  /** Summary size for q123 — any word with frequency > n/(K+1) of the
    * word stream is guaranteed in the summary (MisraGries doc). */
  private val MgK = 256

  /** q123: Misra–Gries heavy hitters — frequent words over the document
    * corpus from a custom typed `Aggregator` (functions.MisraGries), the
    * one-pass bounded-state answer to "what are the common tokens"
    * (vocabulary skew checks, stopword discovery, boilerplate tells).
    * The full groupBy(word) alternative shuffles the whole token
    * universe; the MG summary is O(k) state that map-side combines with
    * an order-insensitive exact merge. Output: summary items with
    * estimate ≥ n/(MgK+1) — the guarantee region — with their estimates;
    * like q14/q111–q113 the estimates are implementation-defined, so no
    * SQL oracle: SketchSuite asserts the MG bounds against exact counts.
    * The threshold count rides along as a 1-row broadcast (q80 pattern). */
  private def q123(spark: SparkSession, sfDir: String): DataFrame = {
    val mg = udaf(new graft.functions.MisraGries(MgK))
    val words = Tables(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    // summary AND stream length from ONE agg over ONE scan — a separate
    // count aggregate would re-scan and re-explode the corpus (the
    // dominant cost at scale) just to recompute what this pass already
    // counts
    words.agg(mg(col("word")).as("summary"), count(lit(1)).as("n_words"))
      .select(col("n_words"), explode(col("summary")).as(Seq("word", "est")))
      .filter(col("est") >= col("n_words") / (MgK + 1))
      .select("word", "est")
      .orderBy("word")
  }

  /** Count–Min geometry for q233 — ε = e/1024 ≈ 0.27% of the stream per
    * estimate, δ = (1/2)^4; 32 KB of state. */
  private[graft] val CmDepth = 4
  private[graft] val CmWidth = 1024

  /** The fixed probe vocabulary q233 reads back: frequent types, a
    * mid-frequency type, stopword-length strings, and one token that
    * never occurs (its estimate exposes pure collision mass — the
    * overcount the ε-bound budgets for). Static ⇒ probe cell indexes
    * compile to literals (see [[graft.functions.CountMin.positions]]). */
  private val CmProbes = Seq("a", "batch", "graft_absent_token", "hash",
    "join", "row", "scan", "the", "vector")

  /** q233: Count–Min point-frequency estimates — the frequency-oracle
    * member of the sketch family: q111 answers distinct counts, q112
    * quantiles, q123 WHICH items are frequent; q233 answers "how often
    * did item x occur" for ANY x from 32 KB of order-insensitive
    * integer state (class doc: est ≥ true always, est ≤ true + εN
    * w.h.p.). One aggregation over one scan yields the sketch AND the
    * stream length; the probe read-back is a per-cell `element_at` min
    * fold over driver-side constant indexes — codegen'd, no UDF, no
    * second scan. Like q14/q111–q113 the estimates are implementation-
    * defined (they depend on the sketch geometry and seeds), so no SQL
    * oracle: SketchSuite asserts est ≥ exact and est ≤ exact + 4·N/width
    * per probe, plus the bit-exact merge identity on a corpus split. */
  private def q233(spark: SparkSession, sfDir: String): DataFrame = {
    val cm = udaf(new graft.functions.CountMin(CmDepth, CmWidth))
    val words = Tables(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val sk = words.agg(cm(col("word")).as("sketch"), count(lit(1)).as("n_words"))
      .localCheckpoint(true) // 1-row; each probe row reads it, never re-aggregates
    val probeRows = CmProbes.map { w =>
      // element_at is 1-based; the flat cell index is i*width + pos(i)
      val est = graft.functions.CountMin.positions(w, CmDepth, CmWidth)
        .zipWithIndex
        .map { case (p, i) => element_at(col("sketch"), i * CmWidth + p + 1) }
        .reduce(least(_, _))
      sk.select(lit(w).as("word"), est.as("est"), col("n_words"))
    }
    probeRows.reduce(_.unionAll(_)).orderBy("word")
  }

  val entries: Seq[Q] = Seq(
    Q("q111_agg_sketch_distinct", q111 _, None),
    Q("q112_agg_sketch_quantile", q112 _, None),
    Q("q113_agg_sketch_overlap", q113 _, None),
    Q("q123_agg_heavy_hitters", q123 _, None),
    Q("q233_agg_sketch_countmin", q233 _, None),
  )
}
