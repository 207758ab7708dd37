package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Embedding clustering (SURVEY.md §2.8b, q106): fixed-iteration Lloyd's
  * k-means over the embeddings table — the corpus-organization step a
  * training-data pipeline runs before cluster-balanced sampling or
  * semantic sharding (and the quantizer-training step behind q63's IVF
  * cells).
  *
  * Scale design: centroids are K rows — they BROADCAST each iteration,
  * so assignment is a narrow per-row argmin over the corpus (no shuffle
  * of the big side, no pair space). The centroid update is a
  * groupBy(cluster, pos) over K×dim groups with map-side partial
  * aggregation — shuffle volume is bounded by K×dim×partitions, not the
  * corpus. Each Lloyd iteration re-scans the corpus (inherent to the
  * algorithm); the input frame is materialized once via localCheckpoint
  * (durable checkpoint on a real cluster) so the scan is a cached-read,
  * and the iteration count is a fixed constant. Determinism: init =
  * the K lowest vec_ids; distances are r6-rounded in-order folds with a
  * cluster-id tiebreak; centroid means are exact DECIMAL sums → r6
  * (the q63 centroid recipe) — bit-identical cross-engine.
  */
object ClusterOps {

  /** Cluster count and Lloyd iterations — fixed constants so the oracle
    * SQL can unroll the loop (2 updates + final assignment). */
  private val K = 8
  private val Iters = 2

  /** In-order squared-L2 fold between a float[] embedding column and a
    * double[] centroid column — same left-to-right summation as the
    * oracle's list_sum(list_transform(...)). */
  private def d2(ep: Column, ca: Column): Column =
    aggregate(zip_with(ep, ca, (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Nearest-centroid assignment: broadcast the K centroid arrays, rank
    * cells per vector on (r6 distance, cluster id). Narrow except the
    * per-vector rank, which shuffles on vec_id — the corpus key. */
  private def assign(emb: DataFrame, cent: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("cl"))
    emb.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("embedding"), col("cl"),
        Tables.r6(d2(col("embedding"), col("ca"))).as("d2"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "embedding", "cl", "d2")
  }

  /** Centroid update: per-(cluster, position) mean from exact DECIMAL
    * sums, repacked to one array row per cluster (tiny → broadcastable). */
  private def centroids(assigned: DataFrame): DataFrame =
    assigned.select(col("cl"), posexplode(col("embedding")))
      .select(col("cl"), col("pos"),
        col("col").cast("double").cast(DecimalType(18, 9)).as("v"))
      .groupBy("cl", "pos")
      .agg(Tables.r6(sum(col("v")).cast("double") / count(lit(1))).as("c"))
      .groupBy("cl")
      .agg(expr("transform(sort_array(collect_list(struct(pos, c))), s -> s.c)").as("ca"))

  /** The generic k-means primitive behind q106, exposed as
    * [[graft.Graft.kmeans]]: `emb` is ANY frame with
    * (vec_id, embedding: array<float>); init = the k lowest vec_ids.
    * Returns one row per vector: (vec_id, cl, d2) with the final cluster
    * and r6 squared distance to its centroid. */
  private[graft] def kmeansAssign(emb0: DataFrame, k: Int, iters: Int): DataFrame = {
    val emb = emb0.select(col("vec_id"), col("embedding")).transform(graft.plans.CorpusPin.pin)
    // init = the k lowest vec_ids, labelled 0..k−1 by that order — NOT
    // filter(vec_id < k), which silently returns an empty frame when ids
    // don't start near 0 (the facade promises ANY (vec_id, embedding)
    // frame). orderBy+limit fuses to TakeOrdered; the ranking window then
    // runs on k rows only (bounded — not a data-sized single partition).
    // For inputs with ids 0..n−1 (the q106 table) the labels coincide
    // with vec_id, so the unrolled oracle SQL is unchanged.
    var cent = emb.orderBy("vec_id").limit(k)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("ca"))
      .withColumn("cl",
        (row_number().over(Window.orderBy("vec_id")) - 1).cast("int"))
      .select("cl", "ca")
    // checkpoint each centroid update (k rows): without the barrier the
    // final plan nests 3 assignments × 2 updates into one tree whose
    // analysis+codegen dominates wall time (measured 5.8 s cold vs 2.6 s
    // warm); with it every iteration compiles a small flat plan. On a
    // cluster this is also where a driver would persist iteration state.
    for (_ <- 1 to iters)
      cent = centroids(assign(emb, cent)).localCheckpoint(true)
    assign(emb, cent).select(col("vec_id"), col("cl"), col("d2"))
  }

  /** q106: k-means cluster assignment — K=8, 2 Lloyd iterations. */
  private def q106(spark: SparkSession, sfDir: String): DataFrame =
    kmeansAssign(Tables(spark, sfDir, "embeddings"), K, Iters)
      .orderBy("vec_id")

  // ---- oracle SQL (DuckDB), loop unrolled: c0 → a1 → c1 → a2 → c2 → final

  private def d2Sql(ep: String, ca: String) =
    s"list_sum(list_transform(range(1,65), i -> (CAST($ep[i] AS DOUBLE) - $ca[CAST(i AS INT)]) " +
      s"* (CAST($ep[i] AS DOUBLE) - $ca[CAST(i AS INT)])))"

  /** Assignment CTE a`n` from centroid CTE c`prev`. */
  private def assignCte(n: Int, prev: Int) =
    s"a$n AS (SELECT vec_id, ep, cl FROM (SELECT e.vec_id, e.ep, c.cl, " +
      s"ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY " +
      Tables.r6sql(d2Sql("e.ep", "c.ca")) + s", c.cl) AS rn " +
      s"FROM e CROSS JOIN c$prev c) WHERE rn = 1)"

  /** Centroid-update CTEs c`n` from assignment CTE a`n`. */
  private def centCte(n: Int) =
    s"p${n}0 AS (SELECT cl, unnest(range(1,65)) AS pos, unnest(ep) AS v0 FROM a$n), " +
      s"p$n AS (SELECT cl, pos, CAST(CAST(v0 AS DOUBLE) AS DECIMAL(18,9)) AS v FROM p${n}0), " +
      s"m$n AS (SELECT cl, pos, " + Tables.r6sql("CAST(SUM(v) AS DOUBLE) / COUNT(*)") +
      s" AS c FROM p$n GROUP BY cl, pos), " +
      s"c$n AS (SELECT cl, list(c ORDER BY pos) AS ca FROM m$n GROUP BY cl)"

  val entries: Seq[Q] = Seq(
    Q("q106_kmeans", q106 _, Some(
      "WITH e AS (SELECT vec_id, embedding AS ep FROM embeddings), " +
        s"c0 AS (SELECT CAST(vec_id AS INT) AS cl, " +
        s"list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ca FROM embeddings WHERE vec_id < $K), " +
        assignCte(1, 0) + ", " + centCte(1) + ", " +
        assignCte(2, 1) + ", " + centCte(2) + " " +
        "SELECT vec_id, cl, d2 FROM (SELECT e.vec_id, c.cl, " +
        Tables.r6sql(d2Sql("e.ep", "c.ca")) + " AS d2, " +
        "ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY " +
        Tables.r6sql(d2Sql("e.ep", "c.ca")) + ", c.cl) AS rn " +
        "FROM e CROSS JOIN c2 c) WHERE rn = 1 ORDER BY vec_id")),
  )
}
