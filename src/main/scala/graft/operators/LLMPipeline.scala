package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** LLM-data-pipeline operators (SURVEY.md §2.8, q49–q55): dedup, near-dup
  * candidates, similarity search, text analysis over `documents` and
  * `embeddings`.
  *
  * Scale design: every operator is a pure shuffle-bounded dataflow —
  * content-hash dedup is a groupBy on the hash (combiner-reduced);
  * MinHash banding turns O(n²) near-dup into an equi-join on band
  * signatures (the standard LSH plan, linear in candidates); the
  * brute-force cosine top-k bounds its probe side (10 ids, broadcast) so
  * the big side streams once with no shuffle. At 100 TB the banding join
  * IS the scale path — brute force exists as the correctness baseline.
  */
object LLMPipeline {

  /** q49: exact dedup via sha2 content hash — keep min doc_id per hash,
    * count members. groupBy(hash) = map-side combine + one shuffle. */
  private def q49(spark: SparkSession, sfDir: String): DataFrame =
    graft.Graft.exactDedup(Tables(spark, sfDir, "documents"))
      .orderBy("keep_id")

  /** q50: MinHash near-dup candidates — k=8 signatures over word TRIGRAM
    * shingles (Kirsch–Mitzenmacher composite hashes), 4 bands × 2 rows;
    * docs sharing a band are candidate pairs. Trigram shingles (MMDS ch.3)
    * keep signatures distinctive on a small vocabulary — unigram tokens
    * over a ~40-word vocabulary collapse most docs into identical
    * signatures and the band join degenerates toward the n² cross join it
    * exists to avoid. The band equi-join replaces the O(n²) cross join.
    *
    * `minhashPairs` is the shared dataflow: q50 lists the pairs, q76
    * clusters them. */
  private[operators] def minhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    graft.plans.FrameMemo.shared(spark, "minhash_pairs", sfDir)(
      pairsFromSigs(minhashSigs(spark, sfDir)))

  /** Memoized signature frame over the canonical `documents` table —
    * q50/q76/q193/q296/q300/q305 all consume the identical frame, so it
    * builds once per (session, sfDir) (VERDICT r10 item 6; contract at
    * [[graft.plans.FrameMemo]]). */
  private[operators] def minhashSigs(spark: SparkSession, sfDir: String): DataFrame =
    graft.plans.FrameMemo.shared(spark, "minhash_sigs", sfDir)(
      minhashSigsOf(Tables(spark, sfDir, "documents")))

  /** The generic core — `docs` is ANY frame with (doc_id, text); exposed
    * to library users via [[graft.Graft.minhashPairs]]. */
  /** The 8-component signature frame (doc_id, s0..s7) behind
    * [[minhashPairsOf]] — shared with q193's estimator-accuracy audit. */
  private[graft] def minhashSigsOf(docs: DataFrame): DataFrame = {
    // NO pre-distinct on shingles: min() is idempotent over duplicates, so
    // the signature is identical without it, and dropping it removes a
    // full shuffle of the exploded shingle rows — the groupBy(doc_id)
    // partial-aggregates each partition down to one row per doc before any
    // data moves. The 8 hash functions come from ONE md5 per occurrence
    // via the Kirsch–Mitzenmacher composite h_i = (h1 + i·h2) mod p
    // (i.i.d.-enough for LSH; standard practice), as exact BIGINT
    // arithmetic both engines evaluate identically — integer mins beat 8
    // full md5 string mins per row on both sides.
    val toks = docs
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ts) - 3), i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2]))")).as("token"))
    // df-cap (NearDup.MaxShingleDf): shingles in > 10% of documents are
    // dropped BEFORE signatures — a ubiquitous shingle otherwise drags
    // every signature toward the same minima and the band join degenerates
    // toward n². The cap is on the token STRING, pre-hash (no collision
    // semantics), and two scale properties keep it nearly free:
    //  - exact document frequency needs NO distinct over the (doc,
    //    shingle) pair space: `array_distinct` dedups per-doc INSIDE the
    //    row (narrow), so the explode emits doc-distinct tokens and a
    //    map-side-combined groupBy(token) counts docs directly — cheap
    //    string ops only, no md5 on this pass;
    //  - the hot set is tiny at any scale (≤ shingles-per-doc/MaxShingleDf
    //    entries by a counting bound), so the cap on the main path is a
    //    broadcast ANTI-join — the exploded signature path never shuffles.
    // ndocs is a broadcast 1-row aggregate, not a driver count. The cap
    // never binds on the benchmark corpus — see the constant's doc.
    val ndocs = docs.agg(count(lit(1)).cast("double").as("nd"))
    val hot = docs
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(explode(array_distinct(expr(
        "transform(sequence(0, size(ts) - 3), i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2]))"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(ndocs))
      .filter(col("df") > greatest(col("nd") * lit(NearDup.MaxShingleDf),
        lit(NearDup.MinHotDf)))
      .select("token")
    val capped = toks.join(broadcast(hot), Seq("token"), "left_anti")
    val base = capped.select(col("doc_id"),
      expr("cast(conv(substring(md5(token), 1, 8), 16, 10) as bigint)").as("h1"),
      expr("cast(conv(substring(md5(token), 9, 8), 16, 10) as bigint)").as("h2"))
    val sigCols = (0 until 8).map(i =>
      min((col("h1") + lit(i.toLong) * col("h2")) % lit(1000000007L)).as(s"s$i"))
    base.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
  }

  private[graft] def minhashPairsOf(docs: DataFrame): DataFrame =
    pairsFromSigs(minhashSigsOf(docs))

  private def pairsFromSigs(sigs: DataFrame): DataFrame = {
    // materialize ONCE: the band self-join references this frame twice and
    // its signature pipeline (two corpus scans + the anti-join) would
    // otherwise re-run per side. One row per (doc, band) — small at any
    // scale; on a cluster checkpoint() to durable storage instead.
    // Long form (doc_id, band_idx, band_val) so ALL four bands resolve in
    // ONE self-join keyed (b, band): same candidate set as four per-band
    // joins, but one shuffle over 4n rows instead of four shuffles over n
    // rows + a union — fewer stages, and the q83 structure.
    val bands = sigs.select(col("doc_id"), expr(
      "stack(4, 0, concat_ws('|', s0, s1), 1, concat_ws('|', s2, s3), " +
        "2, concat_ws('|', s4, s5), 3, concat_ws('|', s6, s7)) AS (b, band)"))
      .transform(graft.plans.CorpusPin.pin)
    val l = bands.select(col("doc_id").as("id_a"), col("b"), col("band"))
    val r = bands.select(col("doc_id").as("id_b"), col("b"), col("band"))
    l.join(r, Seq("b", "band")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  private def q50(spark: SparkSession, sfDir: String): DataFrame =
    minhashPairs(spark, sfDir).orderBy("id_a", "id_b")

  /** The shared oracle-SQL CTE prefix producing the same candidate pairs
    * (same Kirsch–Mitzenmacher composite hashes — exact BIGINT math). */
  private[operators] val minhashPairsSql: String =
    "WITH split AS (SELECT doc_id, str_split(text, ' ') AS ts FROM documents WHERE len(str_split(text, ' ')) >= 3), " +
      "toks AS (SELECT doc_id, unnest(list_transform(range(1, len(ts) - 1), i -> " +
      "ts[CAST(i AS INT)] || ' ' || ts[CAST(i + 1 AS INT)] || ' ' || ts[CAST(i + 2 AS INT)])) AS token FROM split), " +
      "hot AS (SELECT token FROM (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY token) " +
      s"WHERE df > ${NearDup.hotThresholdSql}), " +
      "capped AS (SELECT * FROM toks WHERE token NOT IN (SELECT token FROM hot)), " +
      "base AS (SELECT doc_id, CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) AS h1, " +
      "CAST(('0x' || substr(md5(token), 9, 8)) AS BIGINT) AS h2 FROM capped), " +
      "sigs AS (SELECT doc_id, " +
      (0 until 8).map(i => s"MIN((h1 + $i * h2) % 1000000007) AS s$i").mkString(", ") +
      " FROM base GROUP BY doc_id), " +
      "bands AS (SELECT doc_id, s0 || '|' || s1 AS b0, s2 || '|' || s3 AS b1, " +
      "s4 || '|' || s5 AS b2, s6 || '|' || s7 AS b3 FROM sigs), " +
      "pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM bands a JOIN bands b ON " +
      "(a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3) AND a.doc_id < b.doc_id)"

  /** q76: near-dup CLUSTERING — connected components over the MinHash
    * candidate graph by min-label propagation WITH pointer jumping (the
    * Shiloach–Vishkin shortcut): each round every vertex takes the min
    * label in its neighborhood, then additionally jumps through the
    * previous round's label map (comp ← min(comp, L(comp))), which
    * halves label-chain lengths and bounds the loop at O(log diameter)
    * rounds instead of O(diameter) — the worst case VERDICT r9 flagged
    * for chain-shaped dup clusters (PropertySuite measures the round
    * count on a 200-vertex path). The fixpoint is unique (every vertex
    * at its component min), so the result is deterministic regardless of
    * round count or partitioning. Lineage is truncated per round
    * (localCheckpoint) — on a cluster, checkpoint to durable storage
    * instead. */
  private def q76(spark: SparkSession, sfDir: String): DataFrame = {
    val labels = components(spark, sfDir)
    val sizes = labels.groupBy("comp").agg(count(lit(1)).as("comp_size"))
    labels.join(sizes, "comp")
      .select("doc_id", "comp", "comp_size")
      .orderBy("doc_id")
  }

  /** The (doc_id, comp) component labels shared by q76 (cluster listing)
    * and q93 (dedup resolution). */
  /** The converged (doc_id, comp) labels over the memo'd minhash candidate
    * graph — FrameMemo'd under their own tag (r17, guide §1.2 step 1):
    * FOUR queries (q76, q93, q327, q300) consume this identical frame, and
    * each was re-running the multi-round CC loop (one blocking count + one
    * localCheckpoint per round) on the already-memo'd pair frame. The
    * labels are deterministic for the key (unique fixpoint — see
    * [[ccLabels]]), which is exactly the memo contract; same pay-once
    * family-share rationale as `minhash_pairs` itself. */
  private[operators] def sharedCcLabels(spark: SparkSession, sfDir: String): DataFrame =
    graft.plans.FrameMemo.shared(spark, "minhash_cc_labels", sfDir)(
      ccLabels(minhashPairs(spark, sfDir))._1)

  private def components(spark: SparkSession, sfDir: String): DataFrame = {
    val labels = sharedCcLabels(spark, sfDir)
    // attach singleton components (docs in no candidate pair): comp =
    // their own id. The converged label set is one row per candidate
    // vertex — tiny next to the corpus — so it broadcasts.
    Tables(spark, sfDir, "documents").select(col("doc_id"))
      .join(broadcast(labels.withColumnRenamed("comp", "cand_comp")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cand_comp"), col("doc_id")).as("comp"))
  }

  /** Connected-component labels over an undirected candidate edge list
    * `pairs` (id_a, id_b) — the distributed CC loop shared by q76/q93
    * and unit-testable on synthetic graphs. Returns (labels, rounds):
    * one (doc_id, comp) row per vertex APPEARING IN AN EDGE (singletons
    * are the caller's concern), comp = min doc_id of the component.
    *
    * Algorithm: frontier-limited min-label propagation plus pointer
    * jumping. Per round:
    *   1. neighbor-min: comp ← min(comp, min over neighbors' comp),
    *      joined from the FRONTIER only (labels only decrease, so new
    *      information can only arrive through a vertex whose label
    *      changed last round — |Δ|-sized join, exact);
    *   2. shortcut: comp ← min(comp, L(comp)) through the PREVIOUS
    *      round's materialized label map — label chains halve every
    *      round, so a path graph converges in O(log diameter) rounds
    *      where neighbor-min alone needs O(diameter).
    * Both updates only move comp to a smaller id inside the same
    * component, so the unique fixpoint (component min everywhere) is
    * unchanged by the shortcut — it arrives in fewer rounds.
    *
    * The round cap is a runaway backstop, not a correctness device: 64
    * rounds of halving covers any graph that fits in storage; hitting
    * the cap without convergence THROWS (VERDICT r9 — the old silent
    * 25-round cap would have returned wrong labels on a >25-diameter
    * chain). A fused two-half-steps-per-checkpoint variant was tried
    * and measured ~20% SLOWER at bench scale; eager checkpoints beat
    * lazy ones by ~45%/round (the convergence count re-plans otherwise).
    */
  private[graft] def ccLabels(pairs: DataFrame): (DataFrame, Int) = {
    val sym = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    // iterate over CANDIDATE-GRAPH vertices only: at 100 TB the candidate
    // graph is orders of magnitude smaller than the corpus — this keeps
    // the loop sized by |E|, not |corpus|.
    var labels = sym.select(col("src").as("doc_id"))
      .distinct()
      .select(col("doc_id"), col("doc_id").as("comp")).localCheckpoint(true)
    var frontier = labels
    var changed = 1L
    var rounds = 0
    var prev: DataFrame = null
    while (changed > 0 && rounds < 64) {
      val nbrMin = sym.join(frontier, col("dst") === col("doc_id"))
        .groupBy("src").agg(min(col("comp")).as("nmin"))
      // shortcut joins through last round's MATERIALIZED labels (not this
      // round's half-step, which would recompute nbrMin via the self-join).
      // Round 1 skips it: the map is still the identity, so the jump is a
      // guaranteed no-op and its join would be pure overhead.
      val half = labels.join(nbrMin, col("doc_id") === col("src"), "left")
        .select(col("doc_id"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp_half"),
          col("comp").as("comp_old"))
      // jump entries with L(x) = x are no-ops, and a missing key is the
      // same no-op under the left join — so the jump map only carries the
      // MOVED labels (near-clique graphs: almost empty after round 1;
      // chains: exactly the frontier that still needs halving)
      val step = (if (rounds == 0) half.withColumn("comp_new", col("comp_half"))
        else half
          .join(labels.filter(col("comp") =!= col("doc_id"))
              .select(col("doc_id").as("j_id"), col("comp").as("j_comp")),
            col("comp_half") === col("j_id"), "left")
          .withColumn("comp_new",
            least(col("comp_half"), coalesce(col("j_comp"), col("comp_half")))))
        .select(col("doc_id"), col("comp_new"), col("comp_old"))
        .localCheckpoint(true) // carry comp_old through so the convergence
                               // check is a filter on materialized data
      frontier = step.filter(col("comp_new") =!= col("comp_old"))
        .select(col("doc_id"), col("comp_new").as("comp"))
      changed = frontier.count()
      // at most two materialized rounds live at a time
      if (prev != null) prev.unpersist(blocking = false)
      prev = step
      labels = step.select(col("doc_id"), col("comp_new").as("comp"))
      rounds += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"ccLabels: not converged after $rounds rounds ($changed labels still " +
          "moving) — with pointer jumping this means a runaway input, not a " +
          "long chain; refusing to return wrong component labels")
    (labels, rounds)
  }

  /** q93: near-dup RESOLUTION — the end product of the dedup family: per
    * document, its cluster representative (min doc_id of its connected
    * component) and the keep/drop verdict a cleaning pipeline applies.
    * Same dataflow as q76; the verdict is a per-row comparison on the
    * component label, so resolution adds nothing to the shuffle plan. */
  private def q93(spark: SparkSession, sfDir: String): DataFrame = {
    components(spark, sfDir)
      .select(col("doc_id"), col("comp").as("representative"),
        (col("doc_id") === col("comp")).as("keep"))
      .orderBy("doc_id")
  }

  /** q327: quality-based cluster representative selection — the
    * RESOLUTION POLICY production dedup actually ships: q93 keeps the
    * min-id member of each near-dup component (deterministic but
    * arbitrary); real cleaning pipelines keep the BEST member — here
    * quality = whitespace token count (deterministic on both engines;
    * swap in q65/q313's richer score in production, same plan), doc_id
    * ascending as the tie-break so equal-quality clusters still resolve
    * identically everywhere. Per document: its component's chosen
    * representative, its own quality, and the keep/drop verdict.
    *
    * Scale: components come from the SHARED pay-once CC frame (FrameMemo
    * — same labels q76/q93 read); quality is a narrow scalar projection
    * on the documents scan; representative selection is one row_number
    * window PARTITIONED BY component — dup clusters are small by
    * construction after banding (df-capped candidates), so no window
    * partition can grow with the corpus. Nothing new shuffles at
    * corpus width beyond the comp-keyed exchange the window needs. */
  private def q327(spark: SparkSession, sfDir: String): DataFrame = {
    val comps = components(spark, sfDir).select("doc_id", "comp")
    val quality = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("bigint").as("quality"))
    val w = Window.partitionBy("comp").orderBy(col("quality").desc, col("doc_id"))
    val ranked = comps.join(quality, "doc_id")
      .withColumn("rn", row_number().over(w))
    val reps = ranked.filter(col("rn") === 1)
      .select(col("comp"), col("doc_id").as("representative"))
    ranked.join(reps, "comp")
      .select(col("doc_id"), col("representative"), col("quality"),
        (col("doc_id") === col("representative")).as("keep"))
      .orderBy("doc_id")
  }

  private[graft] def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1,65), i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)))"

  /** Native codegen dot product (graft.functions.FloatDot) — see
    * NearDup.dotCol. */
  private def dotCol(a: String, b: String) = expr(s"graft_dot($a, $b)")

  /** q51: brute-force cosine top-5 per probe (vec_id < 10). Rank on the
    * 6-dp-rounded cosine with vec_id tiebreak so both engines pick
    * identical neighbors even when raw doubles differ in the last ulp. */
  private def q51(spark: SparkSession, sfDir: String): DataFrame =
    bruteTopK(spark, Tables(spark, sfDir, "embeddings"), col("vec_id") < 10, topK = 5)

  /** The q51 dataflow, parameterized — the exact brute-force baseline
    * ScalePathSuite times NearDup.ivfTopK against. Probe side (rows
    * matching `probePred`) is broadcast; the big side streams once with
    * no shuffle until the top-k window. The broadcast hint doubles as
    * the bounded-probe declaration [[graft.plans.SimilarityBandRewrite]]
    * honors — the unhinted raw version of this shape auto-rewrites to
    * the banded LSH join above the measured pair crossover (r12 item 1),
    * so a user who omits the hint at corpus scale gets the index path,
    * not the cartesian. */
  private[graft] def bruteTopK(spark: SparkSession, emb: DataFrame,
      probePred: Column, topK: Int): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val a = emb.filter(probePred)
      .select(col("vec_id").as("id_a"), col("embedding").as("ea"),
        sqrt(dotCol("embedding", "embedding")).as("na"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"),
      sqrt(dotCol("embedding", "embedding")).as("nb"))
    val w = Window.partitionBy("id_a").orderBy(col("cos").desc, col("id_b"))
    broadcast(a).join(b, col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        Tables.r6(dotCol("ea", "eb") / (col("na") * col("nb"))).as("cos"))
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= topK)
      .orderBy("id_a", "rn")
  }

  /** q52: vector column ops — per-vector dimensionality and L2 norm via an
    * in-order fold (deterministic double) over the float array. */
  private def q52(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"),
        size(col("embedding")).cast("bigint").as("dim"),
        Tables.r6(sqrt(dotCol("embedding", "embedding"))).as("l2"))
      .orderBy("vec_id")
  }

  /** q277: embedding-matrix profile — the vector-column health check an
    * embedding pipeline runs before indexing: per dimension 1..64, the
    * count, mean, variance, min and max of the component values. A
    * near-zero-variance dimension is dead weight (quantize it away —
    * q78); a mean far from 0 signals an uncentered model (cosine and
    * dot diverge); min/max bound the quantization range. Completes the
    * vector family: q52 profiles per VECTOR, this profiles per
    * DIMENSION.
    *
    * Determinism: component sums ride the q63 float path (double →
    * DECIMAL(18,9), exact addition); squares are r6-quantized then
    * DECIMAL(18,6)-summed (§2.9 R1); mean/var derive per row in
    * fixed-shape IEEE doubles; min/max of float widen exactly.
    *
    * Scale: ONE posexplode (rows × dims — the unavoidable rewrite) into
    * ONE map-side-combined groupBy(pos) with constant-width state; the
    * output is dimension-bounded (64 rows) no matter the corpus. */
  private def q277(spark: SparkSession, sfDir: String): DataFrame = {
    val pe = Tables(spark, sfDir, "embeddings")
      .select(posexplode(col("embedding")))
      .select((col("pos") + 1).as("pos"), col("col").cast("double").as("vd"))
    pe.groupBy("pos")
      .agg(count(lit(1)).as("n"),
        sum(col("vd").cast(DecimalType(18, 9))).as("sv"),
        sum(Tables.r6(col("vd") * col("vd")).cast(DecimalType(18, 6))).as("sq"),
        min("vd").as("vmin"), max("vd").as("vmax"))
      .select(col("pos").cast("bigint").as("pos"), col("n"),
        Tables.meanD(col("sv"), col("n")).as("mean"),
        Tables.r6(col("sq").cast("double") / col("n") -
          Tables.meanD(col("sv"), col("n")) * Tables.meanD(col("sv"), col("n")))
          .as("variance"),
        col("vmin"), col("vmax"))
      .orderBy("pos")
  }

  /** q53: tokenize + term frequency — global top-20 tokens (Generator
    * path: explode over split). */
  private def q53(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)
  }

  /** q54: stopword filter + bigram counts — posexplode then a self-join on
    * (doc, pos+1); top-10 bigrams. */
  private def q54(spark: SparkSession, sfDir: String): DataFrame = {
    val stop = Seq("the", "a")
    val toks = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "pos", "token")
      .filter(!col("token").isInCollection(stop))
    val l = toks.toDF("d1", "p1", "t1")
    val r = toks.toDF("d2", "p2", "t2")
    l.join(r, col("d1") === col("d2") && (col("p1") + 1) === col("p2"))
      .select(concat_ws(" ", col("t1"), col("t2")).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram"))
      .limit(10)
  }

  /** q55: corpus stats per language — doc count, mean char length,
    * distinct sources. */
  private def q55(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        Tables.meanD(sum(col("n_chars")), count(lit(1))).as("avg_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("lang")
  }

  /** q193: MinHash estimator-accuracy audit — for every q50 candidate
    * pair, the signature-based Jaccard ESTIMATE (matching components / 8)
    * against the EXACT df-capped shingle Jaccard, with the absolute
    * error. This is the calibration run a platform does before trusting
    * LSH at scale: E[est] = J by the MinHash theorem (Broder '97), and
    * with only 8 components the per-pair spread is large (σ = √(J(1−J)/8)
    * ≈ 0.17 at J = 0.5) — the audit SHOWS that spread instead of assuming
    * it, and catches implementation drift (wrong banding, broken hash
    * mixing) as a systematic bias no unit test sees.
    *
    * Plan: signatures built once ([[minhashSigsOf]], checkpointed) feed
    * BOTH the band join and the per-pair match count; the exact side is
    * q61's shared inverted-index machinery at minInter = 1 (same df cap,
    * so both sides score the SAME shingle sets). Candidates without a
    * shared shingle (possible only via hash-min coincidence) score
    * exact = 0 through the left join. At 100 TB, semi-join the kept
    * frame to the candidate doc set first — the exact side then costs
    * only the near-dup neighborhoods, not the full pair space. */
  private def q193(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir, "documents")
    val sigs = minhashSigs(spark, sfDir) // memo-pinned; band + match sides read it
    val bands = sigs.select(col("doc_id"), expr(
      "stack(4, 0, concat_ws('|', s0, s1), 1, concat_ws('|', s2, s3), " +
        "2, concat_ws('|', s4, s5), 3, concat_ws('|', s6, s7)) AS (b, band)"))
    val cand = bands.select(col("doc_id").as("id_a"), col("b"), col("band"))
      .join(bands.select(col("doc_id").as("id_b"), col("b"), col("band")), Seq("b", "band"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val (inter, sizes) = NearDup.sharedPairFrames(spark, sfDir, minInter = 1)
    val sa = sigs.toDF("id_a" +: (0 until 8).map(i => s"a$i"): _*)
    val sb = sigs.toDF("id_b" +: (0 until 8).map(i => s"b$i"): _*)
    val m = (0 until 8).map(i =>
      when(col(s"a$i") === col(s"b$i"), 1L).otherwise(0L)).reduce(_ + _)
    val iv = coalesce(col("inter"), lit(0L))
    cand
      .join(sa, "id_a").join(sb, "id_b")
      .select(col("id_a"), col("id_b"), m.as("n_match"))
      .join(inter.toDF("id_a", "id_b", "inter"), Seq("id_a", "id_b"), "left")
      .join(sizes.toDF("id_a", "na"), "id_a")
      .join(sizes.toDF("id_b", "nb"), "id_b")
      .select(col("id_a"), col("id_b"), col("n_match"),
        Tables.r6(col("n_match") / lit(8.0)).as("est"),
        Tables.r6(iv / (col("na") + col("nb") - iv)).as("exact"))
      .select(col("id_a"), col("id_b"), col("n_match"), col("est"), col("exact"),
        Tables.r6(abs(col("est") - col("exact"))).as("abs_err"))
      .orderBy("id_a", "id_b")
  }

  /** q296: LSH probability curve — theory vs measurement for the q50
    * banding config (8 perms, 4 bands × 2 rows): for every pair sharing
    * ≥1 kept shingle, bin the EXACT trigram Jaccard into deciles and
    * report the empirical band-collision (detection) rate next to the
    * closed-form S-curve P(s) = 1 − (1 − s²)⁴ at the bin midpoint.
    * This is the picture an engineer looks at before choosing (b, r):
    * q193 validates the minhash ESTIMATE per pair; this validates the
    * CANDIDATE-GENERATION probability the dedup pipeline actually rides.
    * The theory column is computed by repeated multiplication (no pow),
    * so both engines run identical IEEE ops.
    *
    * Scale: both sides reuse bounded machinery — the exact side is
    * q61's df-capped inverted index at minInter = 1, the detected side
    * is q50's band join; the rollup is a ≤10-row decile aggregate. */
  private def q296(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir, "documents")
    val cand = minhashPairs(spark, sfDir).withColumn("det", lit(1L))
    val (inter, sizes) = NearDup.sharedPairFrames(spark, sfDir, minInter = 1)
    val jac = inter.toDF("id_a", "id_b", "inter")
      .join(sizes.toDF("id_a", "na"), "id_a")
      .join(sizes.toDF("id_b", "nb"), "id_b")
      .select(col("id_a"), col("id_b"),
        Tables.r6(col("inter") / (col("na") + col("nb") - col("inter"))).as("jac"))
    val sMid = (col("bin").cast("double") + lit(0.5)) / lit(10.0)
    val miss = lit(1.0) - sMid * sMid
    jac.join(cand, Seq("id_a", "id_b"), "left")
      .select(least(floor(col("jac") * 10).cast("bigint"), lit(9L)).as("bin"),
        coalesce(col("det"), lit(0L)).as("det"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_pairs"), sum("det").as("n_detected"))
      .select(col("bin"), Tables.r6(sMid).as("s_mid"),
        col("n_pairs"), col("n_detected"),
        Tables.meanD(col("n_detected"), col("n_pairs")).as("empirical"),
        Tables.r6(lit(1.0) - miss * miss * miss * miss).as("theory"))
      .orderBy("bin")
  }

  /** q305: source-level MinHash similarity via the MERGEABLE rollup —
    * the property that makes minhash the 100 TB similarity tool:
    * sig(A ∪ B) = elementwise min(sig(A), sig(B)), so a SOURCE's
    * signature is one 8-column MIN-aggregate over its documents'
    * signatures (no shingle re-scan, no doc-pair joins), and the full
    * source×source similarity matrix costs a join of 20 signature ROWS.
    * Estimates = per-pair signature match rate (matches/8). q272 asks
    * "which sources contain duplicate DOCS"; this asks "which sources
    * draw from the same CONTENT distribution" — the shingle-space
    * overlap of whole sources. PropertySuite proves the shard-merge
    * identity (docs → shards → source == docs → source for any shard
    * assignment — the 100 TB rollup pattern).
    *
    * Scale: doc signatures are the existing one-pass aggregate; the
    * rollup is a sources-bounded MIN agg; the matrix is sources²/2 rows
    * of pure integer compares — nothing pairwise ever touches docs. */
  private def q305(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir, "documents")
    val sigs = minhashSigs(spark, sfDir)
      .join(docs.select("doc_id", "source"), "doc_id")
    val srcSigs = sigs.groupBy("source")
      .agg((0 until 8).map(i => min(col(s"s$i")).as(s"s$i")).head,
        (0 until 8).map(i => min(col(s"s$i")).as(s"s$i")).tail: _*)
      .localCheckpoint(true) // ≤#sources rows; both matrix sides read it
    val a = srcSigs.toDF("source_a" +: (0 until 8).map(i => s"a$i"): _*)
    val b = srcSigs.toDF("source_b" +: (0 until 8).map(i => s"b$i"): _*)
    val m = (0 until 8).map(i =>
      when(col(s"a$i") === col(s"b$i"), 1L).otherwise(0L)).reduce(_ + _)
    a.join(b, col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"), m.as("n_match"),
        Tables.r6(m / lit(8.0)).as("est_jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** q300: dup-cluster quality audit — the check that keeps transitive
    * dedup honest: q76's connected components merge A~B~C into one
    * cluster even when A and C are nothing alike (chain collapse), and
    * at corpus scale one mega-cluster silently deletes half a source.
    * Per component: member count, candidate-edge count, edge DENSITY
    * (2E/(V(V−1)) — low = chain-shaped, exactly the risky ones), and
    * the min/mean EXACT Jaccard over its edges (low min = a weak link
    * holding the cluster together). Top-20 components by size — the
    * review queue before a destructive keep-one-per-cluster pass.
    *
    * Scale: edges are the bounded q50 candidate set (checkpointed, read
    * by CC + scoring); labels ride the q76 CC loop (candidate-graph
    * vertices only); exact scores reuse q61's df-capped machinery; all
    * rollups are component-keyed aggs on edge-bounded frames. */
  private def q300(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val docs = Tables(spark, sfDir, "documents")
    val cand = minhashPairs(spark, sfDir) // memo-pinned; edge scoring reads it
    val labels = sharedCcLabels(spark, sfDir) // memo'd converged labels (see sharedCcLabels)
    val (inter, sizes) = NearDup.sharedPairFrames(spark, sfDir, minInter = 1)
    val iv = coalesce(col("inter"), lit(0L))
    val jac = cand
      .join(inter.toDF("id_a", "id_b", "inter"), Seq("id_a", "id_b"), "left")
      .join(sizes.toDF("id_a", "na"), "id_a")
      .join(sizes.toDF("id_b", "nb"), "id_b")
      .select(col("id_a"),
        Tables.r6(iv / (col("na") + col("nb") - iv)).as("jac"))
    val eStats = jac
      .join(labels.toDF("id_a", "comp"), "id_a") // id_b shares the comp by construction
      .groupBy("comp")
      .agg(count(lit(1)).as("n_edges"), min("jac").as("min_jac"),
        Tables.meanD(sum(col("jac").cast(DecimalType(18, 6))), count(lit(1)))
          .as("avg_jac"))
    labels.groupBy("comp").agg(count(lit(1)).as("n_members"))
      .join(eStats, "comp")
      .select(col("comp"), col("n_members"), col("n_edges"),
        Tables.r6(lit(2.0) * col("n_edges") /
          (col("n_members") * (col("n_members") - 1))).as("density"),
        col("min_jac"), col("avg_jac"))
      .orderBy(col("n_members").desc, col("comp"))
      .limit(20)
  }

  val entries: Seq[Q] = Seq(
    Q("q305_minhash_source_sim", q305 _, Some {
      val mSum = (0 until 8).map(i =>
        s"CASE WHEN a.s$i = b.s$i THEN 1 ELSE 0 END").mkString(" + ")
      val mins = (0 until 8).map(i => s"MIN(s$i) AS s$i").mkString(", ")
      minhashPairsSql + ", " + // bands/pairs CTEs go unused (lazy) — sigs is the prefix we ride
        "ssig AS (SELECT source, " + mins + " FROM sigs " +
        "JOIN documents USING (doc_id) GROUP BY source) " +
        "SELECT a.source AS source_a, b.source AS source_b, " +
        s"CAST($mSum AS BIGINT) AS n_match, " +
        Tables.r6sql(s"CAST($mSum AS DOUBLE) / 8") + " AS est_jaccard " +
        "FROM ssig a JOIN ssig b ON a.source < b.source " +
        "ORDER BY source_a, source_b"
    }),
    Q("q300_dupcluster_audit", q300 _, Some {
      val jacSql = Tables.r6sql(
        "COALESCE(i.inter, 0) / CAST(sa.n + sb.n - COALESCE(i.inter, 0) AS DOUBLE)")
      minhashPairsSql + ", " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs " +
        "UNION ALL SELECT id_b, id_a FROM pairs), " +
        "reach AS (WITH RECURSIVE r(a, b) AS (" +
        "SELECT doc_id, doc_id FROM documents " +
        "UNION SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src) " +
        "SELECT a, b FROM r), " +
        "comps AS (SELECT a AS doc_id, MIN(b) AS comp FROM reach GROUP BY a), " +
        "verts AS (SELECT doc_id, comp FROM comps " +
        "WHERE doc_id IN (SELECT src FROM edges)), " +
        "kept2 AS (SELECT DISTINCT doc_id, token FROM capped), " +
        "sizes2 AS (SELECT doc_id, COUNT(*) AS n FROM kept2 GROUP BY doc_id), " +
        "inter2 AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter " +
        "FROM kept2 a JOIN kept2 b ON a.token = b.token AND a.doc_id < b.doc_id " +
        "GROUP BY 1, 2), " +
        s"jac AS (SELECT p.id_a, $jacSql AS jac FROM pairs p " +
        "JOIN sizes2 sa ON p.id_a = sa.doc_id " +
        "JOIN sizes2 sb ON p.id_b = sb.doc_id " +
        "LEFT JOIN inter2 i ON p.id_a = i.ia AND p.id_b = i.ib), " +
        "es AS (SELECT v.comp, COUNT(*) AS n_edges, MIN(jac) AS min_jac, " +
        Tables.meanDSql("SUM(CAST(jac AS DECIMAL(18,6)))", "COUNT(*)") +
        " AS avg_jac FROM jac JOIN verts v ON jac.id_a = v.doc_id GROUP BY 1), " +
        "cs AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS n_members " +
        "FROM verts GROUP BY comp) " +
        "SELECT cs.comp, n_members, CAST(n_edges AS BIGINT) AS n_edges, " +
        Tables.r6sql("2.0 * n_edges / (n_members * (n_members - 1))") +
        " AS density, min_jac, avg_jac " +
        "FROM cs JOIN es ON cs.comp = es.comp " +
        "ORDER BY n_members DESC, cs.comp LIMIT 20"
    }),
    Q("q296_lsh_probability_curve", q296 _, Some {
      val s = "((CAST(bin AS DOUBLE) + 0.5) / 10.0)"
      val miss = s"(1.0 - $s * $s)"
      minhashPairsSql + ", " +
        "kept2 AS (SELECT DISTINCT doc_id, token FROM capped), " +
        "sizes2 AS (SELECT doc_id, COUNT(*) AS n FROM kept2 GROUP BY doc_id), " +
        "inter2 AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter " +
        "FROM kept2 a JOIN kept2 b ON a.token = b.token AND a.doc_id < b.doc_id " +
        "GROUP BY 1, 2), " +
        "jac AS (SELECT ia AS id_a, ib AS id_b, " +
        Tables.r6sql("inter / CAST(sa.n + sb.n - inter AS DOUBLE)") + " AS jac " +
        "FROM inter2 JOIN sizes2 sa ON ia = sa.doc_id " +
        "JOIN sizes2 sb ON ib = sb.doc_id), " +
        "flags AS (SELECT LEAST(CAST(FLOOR(jac * 10) AS BIGINT), 9) AS bin, " +
        "CASE WHEN p.id_a IS NOT NULL THEN 1 ELSE 0 END AS det " +
        "FROM jac LEFT JOIN pairs p ON jac.id_a = p.id_a AND jac.id_b = p.id_b), " +
        "g AS (SELECT bin, COUNT(*) AS n_pairs, SUM(det) AS n_detected " +
        "FROM flags GROUP BY bin) " +
        "SELECT bin, " + Tables.r6sql(s) + " AS s_mid, " +
        "CAST(n_pairs AS BIGINT) AS n_pairs, " +
        "CAST(n_detected AS BIGINT) AS n_detected, " +
        Tables.meanDSql("n_detected", "n_pairs") + " AS empirical, " +
        Tables.r6sql(s"1.0 - $miss * $miss * $miss * $miss") + " AS theory " +
        "FROM g ORDER BY bin"
    }),
    Q("q193_dedup_minhash_accuracy", q193 _, Some {
      val mSum = (0 until 8).map(i =>
        s"CASE WHEN s.s$i = t.s$i THEN 1 ELSE 0 END").mkString(" + ")
      minhashPairsSql + ", " +
        "kept2 AS (SELECT DISTINCT doc_id, token FROM capped), " +
        "sizes2 AS (SELECT doc_id, COUNT(*) AS n FROM kept2 GROUP BY doc_id), " +
        "inter2 AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter " +
        "FROM kept2 a JOIN kept2 b ON a.token = b.token AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
        "SELECT id_a, id_b, n_match, est, exact, " +
        Tables.r6sql("ABS(est - exact)") + " AS abs_err FROM (" +
        s"SELECT p.id_a, p.id_b, CAST($mSum AS BIGINT) AS n_match, " +
        Tables.r6sql(s"CAST($mSum AS DOUBLE) / 8") + " AS est, " +
        Tables.r6sql("COALESCE(i.inter, 0) / (sa.n + sb.n - COALESCE(i.inter, 0))") +
        " AS exact " +
        "FROM pairs p JOIN sigs s ON p.id_a = s.doc_id JOIN sigs t ON p.id_b = t.doc_id " +
        "LEFT JOIN inter2 i ON p.id_a = i.ia AND p.id_b = i.ib " +
        "JOIN sizes2 sa ON p.id_a = sa.doc_id JOIN sizes2 sb ON p.id_b = sb.doc_id) " +
        "ORDER BY id_a, id_b"
    }),
    Q("q49_dedup_exact", q49 _, Some(
      "SELECT sha256(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS dup_cnt " +
        "FROM documents GROUP BY 1 ORDER BY keep_id")),
    Q("q50_dedup_minhash", q50 _, Some(
      minhashPairsSql + " SELECT id_a, id_b FROM pairs ORDER BY id_a, id_b")),
    Q("q76_dedup_components", q76 _, Some(
      minhashPairsSql + ", " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs " +
        "UNION ALL SELECT id_b, id_a FROM pairs), " +
        "reach AS (WITH RECURSIVE r(a, b) AS (" +
        "SELECT doc_id, doc_id FROM documents " +
        "UNION SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src) " +
        "SELECT a, b FROM r), " +
        "comps AS (SELECT a AS doc_id, MIN(b) AS comp FROM reach GROUP BY a), " +
        "sizes AS (SELECT comp, COUNT(*) AS comp_size FROM comps GROUP BY comp) " +
        "SELECT doc_id, comp, comp_size FROM comps JOIN sizes USING (comp) ORDER BY doc_id")),
    Q("q93_dedup_resolution", q93 _, Some(
      minhashPairsSql + ", " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs " +
        "UNION ALL SELECT id_b, id_a FROM pairs), " +
        "reach AS (WITH RECURSIVE r(a, b) AS (" +
        "SELECT doc_id, doc_id FROM documents " +
        "UNION SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src) " +
        "SELECT a, b FROM r), " +
        "comps AS (SELECT a AS doc_id, MIN(b) AS comp FROM reach GROUP BY a) " +
        "SELECT doc_id, comp AS representative, doc_id = comp AS keep " +
        "FROM comps ORDER BY doc_id")),
    Q("q327_dedup_keep_best", q327 _, Some(
      minhashPairsSql + ", " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs " +
        "UNION ALL SELECT id_b, id_a FROM pairs), " +
        "reach AS (WITH RECURSIVE r(a, b) AS (" +
        "SELECT doc_id, doc_id FROM documents " +
        "UNION SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src) " +
        "SELECT a, b FROM r), " +
        "comps AS (SELECT a AS doc_id, MIN(b) AS comp FROM reach GROUP BY a), " +
        "ql AS (SELECT doc_id, CAST(len(str_split(text, ' ')) AS BIGINT) AS quality FROM documents), " +
        "ranked AS (SELECT c.doc_id, c.comp, ql.quality, " +
        "ROW_NUMBER() OVER (PARTITION BY c.comp ORDER BY ql.quality DESC, c.doc_id) AS rn " +
        "FROM comps c JOIN ql USING (doc_id)), " +
        "reps AS (SELECT comp, doc_id AS representative FROM ranked WHERE rn = 1) " +
        "SELECT r2.doc_id, reps.representative, r2.quality, " +
        "r2.doc_id = reps.representative AS keep " +
        "FROM ranked r2 JOIN reps USING (comp) ORDER BY doc_id")),
    Q("q51_sim_cosine_topk", q51 _, Some(
      "SELECT id_a, id_b, cos, rn FROM (SELECT id_a, id_b, cos, " +
        "ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rn FROM (" +
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        Tables.r6sql(s"${dotSql("a", "b")} / (sqrt(${dotSql("a", "a")}) * sqrt(${dotSql("b", "b")}))") +
        " AS cos FROM embeddings a, embeddings b " +
        "WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id)) WHERE rn <= 5 ORDER BY id_a, rn")),
    Q("q52_vec_ops", q52 _, Some(
      "SELECT vec_id, label, LEN(embedding) AS dim, " +
        Tables.r6sql("sqrt(list_sum(list_transform(range(1,65), i -> " +
          "CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))") +
        " AS l2 FROM embeddings ORDER BY vec_id")),
    Q("q277_embedding_profile", q277 _, Some {
      val meanSql = Tables.r6sql(
        "CAST(SUM(CAST(vd AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)")
      "WITH pe0 AS (SELECT unnest(range(1, 65)) AS pos, unnest(embedding) AS v0 " +
        "FROM embeddings), " +
        "pe AS (SELECT pos, CAST(v0 AS DOUBLE) AS vd FROM pe0) " +
        "SELECT CAST(pos AS BIGINT) AS pos, COUNT(*) AS n, " +
        meanSql + " AS mean, " +
        Tables.r6sql("CAST(SUM(CAST(" + Tables.r6sql("vd * vd") +
          " AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) - " +
          s"($meanSql) * ($meanSql)") + " AS variance, " +
        "MIN(vd) AS vmin, MAX(vd) AS vmax " +
        "FROM pe GROUP BY pos ORDER BY pos"
    }),
    Q("q53_text_tokens", q53 _, Some(
      "SELECT token, COUNT(*) AS cnt FROM (" +
        "SELECT unnest(str_split(text, ' ')) AS token FROM documents) " +
        "GROUP BY token ORDER BY cnt DESC, token LIMIT 20")),
    Q("q54_text_stopwords_ngram", q54 _, Some(
      "WITH split AS (SELECT doc_id, str_split(text, ' ') AS ts FROM documents), " +
        "toks AS (SELECT * FROM (SELECT doc_id, unnest(ts) AS token, " +
        "unnest(range(1, len(ts) + 1)) AS pos FROM split) " +
        "WHERE token NOT IN ('the', 'a')) " +
        "SELECT a.token || ' ' || b.token AS bigram, COUNT(*) AS cnt " +
        "FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.pos + 1 = b.pos " +
        "GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 10")),
    Q("q55_text_stats", q55 _, Some(
      "SELECT lang, COUNT(*) AS n_docs, " +
        Tables.meanDSql("SUM(n_chars)", "COUNT(*)") + " AS avg_chars, " +
        "COUNT(DISTINCT source) AS n_sources FROM documents GROUP BY lang ORDER BY lang")),
  )
}
