package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Extended deduplication + similarity search (q60–q63) — the
  * training-data-pipeline operators beyond the base inventory: SimHash,
  * n-gram Jaccard, embedding-cosine near-dup, and an IVF-style
  * partition-pruned ANN. (Broder 1997; Charikar 2002 SimHash; MMDS ch.3;
  * IVF coarse quantization à la Jégou et al.)
  *
  * Scale design:
  *  - SimHash is one token explode + one groupBy(doc) — shuffle bounded
  *    by doc count; the 32 bit-counters ride in a single aggregation row.
  *  - n-gram Jaccard is the inverted-index join (shingle equi-join),
  *    never the doc×doc cross join; candidate volume is bounded by
  *    shingle-frequency, the standard scalable formulation.
  *  - q62 brute-force cosine is the correctness baseline, threshold-gated;
  *    at fleet scale its plan is replaced by q63's pruned search.
  *  - q63 IVF: coarse centroids (tiny, broadcast) assign each probe to
  *    nprobe=2 cells; the exact search runs only inside those cells —
  *    the candidate join is an equi-join on the cell id (label), so the
  *    big side never cross-joins.
  */
object NearDup {

  /** Document-frequency cap for shingle-based near-dup (q50/q61): shingles
    * present in more than this fraction of ALL documents are dropped
    * before the inverted-index / band joins. A shingle in f·N docs alone
    * contributes (f·N)²/2 candidate pairs — on natural-language corpora a
    * boilerplate phrase ("all rights reserved") turns the equi-join into
    * the n² blow-up it exists to avoid. 10% never binds on the benchmark
    * corpus (max observed df: 1.4% at sf0.01, 0.5% at sf0.1 — results are
    * unchanged) but bounds the candidate volume under real-world skew;
    * ShingleCapSuite proves the bound on a synthetic hot-shingle corpus.
    * The oracle SQL applies the identical cap, so the capped shingle
    * universe IS the operator's semantics, verified end-to-end. */
  private[graft] val MaxShingleDf = 0.10

  /** Absolute floor under the fractional cap: a shingle shared by this
    * few documents is never "hot" regardless of corpus size — without
    * it, a corpus under 1/MaxShingleDf docs makes EVERY shingle exceed
    * the fractional threshold and the near-dup join degenerates to
    * empty (caught by ApiSuite's 3-doc corpus). */
  private[graft] val MinHotDf = 5

  /** The SQL form of the hot threshold, shared by the q50/q61 oracles. */
  private[graft] val hotThresholdSql =
    s"GREATEST($MaxShingleDf * (SELECT COUNT(*) FROM documents), $MinHotDf)"

  /** In-order double fold of Σ f(a_i, b_i) — deterministic per row. */
  private def zipFold(a: Column, b: Column, f: (Column, Column) => Column): Column =
    aggregate(zip_with(a, b, f), lit(0.0), (acc, x) => acc + x)

  /** Native codegen dot product (graft.functions.FloatDot) — identical
    * left-to-right summation to `list_sum(list_transform(...))`, primitive
    * float[] loop inside WholeStageCodegen. */
  private[operators] def dotCol(a: String, b: String): Column = expr(s"graft_dot($a, $b)")

  private[operators] def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1,65), i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)))"

  /** The (doc_id, simhash) frame shared by q60 (fingerprint listing) and
    * q83 (banded near-dup pairing). Features are (word-trigram, per-doc
    * term frequency) pairs hashed to 32 bits (md5-prefix); per-bit
    * signed counts over a doc's distinct features; the sign vector
    * re-packs into one int64 fingerprint. */
  private[operators] def simhashDF(spark: SparkSession, sfDir: String): DataFrame =
    // memoized per (session, sfDir): q60/q83/q157/q298 consume the
    // identical fingerprint frame (FrameMemo contract; VERDICT r10 item 6)
    graft.plans.FrameMemo.shared(spark, "simhash", sfDir)(
      simhashOf(Tables(spark, sfDir, "documents")))

  /** The generic core — `docs` is ANY frame with (doc_id, text), docs
    * under 3 tokens get a DEGENERATE whole-text fingerprint (below);
    * exposed via [[graft.Graft.simhash]].
    *
    * Feature choice (VERDICT r10 item 3): the original per-token-
    * occurrence hashing left 27/32 bits degenerate (set rates
    * 0.01–0.96) on a shared-vocabulary corpus — every doc votes with
    * nearly the same common-token mass, so whole bits pin corpus-wide
    * and every q83 band bucket silently widens. Hashing the
    * (trigram, tf) pair instead draws each doc's votes from a feature
    * universe large enough that cross-doc sharing can't pin a bit
    * (q298 measures 31/32 bits inside [0.4, 0.6] at sf0.01, 32/32 at
    * sf0.1), while small edits still change only a few features — the
    * Manku et al. WWW'07 weighted-feature recipe with integer-exact
    * votes (±1 per distinct feature; no float IDF weights, so both
    * engines re-derive bit-identical fingerprints with no fold-order
    * hazard).
    *
    * Short docs (< 3 tokens, so no trigram exists) previously emitted NO
    * fingerprint, leaving them invisible to every fingerprint consumer —
    * the q181 ingest path could never near-dup-flag a 2-token doc even
    * against its byte-identical twin (VERDICT r12 item 3). They now get a
    * degenerate whole-text fingerprint (md5 prefix, 32 bits): identical
    * short texts collide at Hamming 0 and are flagged; unrelated short
    * texts land on independent uniform bits, so a false Hamming-≤3 pair
    * costs P ≈ 5.5k/2³² ≈ 1.3e-6 — the standard degenerate-shingle
    * fallback. Exact-hash dedup (q49) remains the primary catch; this
    * closes the fingerprint leg. */
  private[graft] def simhashOf(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ts) - 3), i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2]))")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), expr(
        "cast(conv(substring(md5(concat(g, ':', cast(tf as string))), 1, 8), 16, 10) as bigint)").as("h"))
    val bitSums = (0 until 32).map(i =>
      sum(when(expr(s"(shiftright(h, $i) & 1) = 1"), 1L).otherwise(-1L)).as(s"w$i"))
    val packed = (0 until 32)
      .map(i => when(col(s"w$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    val long = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), packed.as("simhash"))
    val short = docs
      .filter(col("text").isNotNull && size(split(col("text"), " ")) < 3)
      .select(col("doc_id"), expr(
        "cast(conv(substring(md5(text), 1, 8), 16, 10) as bigint)").as("simhash"))
    long.unionByName(short)
  }

  /** The oracle-SQL CTE list (no leading WITH) producing the same
    * (doc_id, simhash) frame from any `src` relation carrying
    * (doc_id, text), terminated by a `sh` CTE — embeddable inside a
    * larger WITH chain (q150 runs it over its dedup survivors). */
  private[operators] def simhashCtes(src: String): String = {
    val bitSums = (0 until 32).map(i =>
      s"SUM(CASE WHEN ((h >> $i) & 1) = 1 THEN 1 ELSE -1 END) AS w$i").mkString(", ")
    val packed = (0 until 32).map(i =>
      s"CASE WHEN w$i > 0 THEN ${1L << i} ELSE 0 END").mkString(" + ")
    s"raw AS (SELECT doc_id, str_split(text, ' ') AS ts FROM $src WHERE len(str_split(text, ' ')) >= 3), " +
      "occ AS (SELECT doc_id, unnest(list_transform(range(1, len(ts) - 1), i -> " +
      "ts[CAST(i AS INT)] || ' ' || ts[CAST(i + 1 AS INT)] || ' ' || ts[CAST(i + 2 AS INT)])) AS g FROM raw), " +
      "tfq AS (SELECT doc_id, g, COUNT(*) AS tf FROM occ GROUP BY doc_id, g), " +
      "toks AS (SELECT doc_id, CAST(('0x' || substr(md5(g || ':' || CAST(tf AS VARCHAR)), 1, 8)) AS BIGINT) AS h FROM tfq), " +
      s"bits AS (SELECT doc_id, $bitSums FROM toks GROUP BY doc_id), " +
      s"sh AS (SELECT doc_id, CAST($packed AS BIGINT) AS simhash FROM bits " +
      // degenerate whole-text fingerprint for < 3-token docs (mirrors
      // simhashOf's short branch bit-identically)
      "UNION ALL SELECT doc_id, CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS simhash " +
      s"FROM $src WHERE text IS NOT NULL AND len(str_split(text, ' ')) < 3)"
  }

  /** The q60/q83 form: the CTE chain over the full `documents` table. */
  private[operators] val simhashSql: String = "WITH " + simhashCtes("documents")

  /** q60: SimHash fingerprint per document. */
  private def q60(spark: SparkSession, sfDir: String): DataFrame =
    simhashDF(spark, sfDir).orderBy("doc_id")

  /** q83: SimHash near-dup PAIRS at Hamming distance ≤ 3 via 4-band LSH
    * over the 32-bit fingerprint: by pigeonhole, any two fingerprints
    * within Hamming 3 agree exactly on ≥1 of the 4 bytes, so candidates
    * come from an equi-join on (band, byte) — never the doc×doc cross
    * join — and the exact bit_count(xor) filter runs on candidates only.
    * The standard scalable fingerprint-dedup plan (Manku et al., WWW'07). */
  private def q83(spark: SparkSession, sfDir: String): DataFrame = {
    // one row per (doc, band): band key = byte b of the fingerprint.
    // Materialized once — the self-join's two sides would otherwise both
    // recompute the full simhash pipeline (band keys share no Exchange).
    val banded = simhashDF(spark, sfDir)
      .select(col("doc_id"), col("simhash"), explode(expr("sequence(0, 3)")).as("b"))
      .withColumn("k", expr("shiftright(simhash, cast(b * 8 as int)) & 255"))
      .transform(graft.plans.CorpusPin.pin)
    val l = banded.select(col("doc_id").as("ia"), col("simhash").as("sa"), col("b"), col("k"))
    val r = banded.select(col("doc_id").as("ib"), col("simhash").as("sb"), col("b"), col("k"))
    l.join(r, Seq("b", "k"))
      .filter(col("ia") < col("ib"))
      .select("ia", "ib", "sa", "sb").distinct()
      .select(col("ia"), col("ib"),
        expr("cast(bit_count(sa ^ sb) as bigint)").as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("ia", "ib")
  }

  /** q181: incremental ingest dedup — the DAILY shape every standing
    * corpus runs, distinct from the corpus-internal q49/q50/q150: a new
    * batch (odd doc_ids) deduplicated AGAINST the standing index (even
    * doc_ids), never against itself. Exact = content-hash semi-join into
    * the index; near = the q83 banded SimHash join restricted to
    * batch×index pairs (by pigeonhole any Hamming-≤3 pair agrees on ≥1
    * of the 4 bands). Per batch doc: both drop flags + the kept verdict.
    *
    * Scale: at 100 TB the index side's (band, key) frame is precomputed
    * and persisted by the standing pipeline — the daily cost is the
    * batch-sized fingerprint pass plus two bounded equi-joins (band
    * buckets cap candidates exactly as in q83); the content-hash
    * semi-join is index-partitioned and touches no text bytes beyond
    * hashing. The fingerprint frame is computed ONCE over all docs and
    * split by parity — mirroring the oracle CTE — so the pipeline stays
    * one pass. */
  /** The generic ingest-dedup primitive behind q181, exposed as
    * [[graft.Graft.ingestDedup]]: `batch` and `index` each need
    * (doc_id, text); returns per batch doc the exact/near drop flags and
    * the kept verdict. */
  private[graft] def ingestDedupOf(batch: DataFrame, index: DataFrame): DataFrame = {
    val exactHit = batch.select(col("doc_id"), md5(col("text")).as("h"))
      .join(index.select(md5(col("text")).as("h")).distinct(), Seq("h"), "left_semi")
      .select(col("doc_id"))
    def banded(docs: DataFrame): DataFrame = simhashOf(docs)
      .select(col("doc_id"), col("simhash"), explode(expr("sequence(0, 3)")).as("b"))
      .withColumn("k", expr("shiftright(simhash, cast(b * 8 as int)) & 255"))
    val idx = banded(index)
      .select(col("doc_id").as("idx_id"), col("simhash").as("sb"), col("b"), col("k"))
    val nearHit = banded(batch).join(idx, Seq("b", "k"))
      .filter(expr("bit_count(simhash ^ sb) <= 3"))
      .select(col("doc_id")).distinct()
    batch.select(col("doc_id"))
      .join(exactHit.withColumn("de", lit(true)), Seq("doc_id"), "left")
      .join(nearHit.withColumn("dn", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("de"), lit(false)).as("dropped_exact"),
        coalesce(col("dn"), lit(false)).as("dropped_near"),
        (!coalesce(col("de"), lit(false)) && !coalesce(col("dn"), lit(false))).as("kept"))
      .orderBy("doc_id")
  }

  private def q181(spark: SparkSession, sfDir: String): DataFrame = {
    // delegates to the facade primitive (q120→pageRank convention): ONE
    // copy of the batch-vs-index semantics, oracle-verified through here
    val docs = Tables(spark, sfDir, "documents")
    ingestDedupOf(
      docs.filter(col("doc_id") % 2 === 1).select("doc_id", "text"),
      docs.filter(col("doc_id") % 2 === 0).select("doc_id", "text"))
  }

  /** Shared candidate machinery for q61/q185: the df-capped distinct
    * (doc, shingle-hash) frame folded to per-doc sizes and pair
    * intersections (pairs sharing ≥3 shingles). Both scorers — Jaccard
    * (q61) and Broder containment (q185) — are ratios over exactly
    * (inter, |A|, |B|), so the expensive inverted-index join lives here
    * once. Returns (inter: (ia, ib, inter), sizes: (doc_id, n)). */
  /** The distinct word-trigram SET of each document as (doc_id, gh)
    * rows, gh = xxhash64 of the shingle string. Shared by the capped
    * heuristic path (q50/q61/q185) and the exact prefix-filter join
    * (q269). Hash BEFORE the dedup: the distinct then shuffles 16-byte
    * (doc_id, int64) rows instead of ~30-char strings, and downstream
    * joins compare ints (engine-internal key only — the oracles join on
    * the exact strings, so a collision would surface as a verify
    * mismatch; P(collision) ≈ n²/2⁶⁵ ≈ 1e-9 here). */
  private[graft] def distinctShingleHashes(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ts) - 3), i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2]))")).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("gh"))
      .distinct()

  private[graft] def cappedPairFrames(docs: DataFrame,
      minInter: Int = 3): (DataFrame, DataFrame) =
    pairFramesFromKept(keptShingles(docs), minInter)

  /** Memoized [[cappedPairFrames]] over the canonical `documents` table
    * (VERDICT r10 item 6): the kept-shingle frame, the per-doc sizes and
    * the minInter=1 pair-intersection frame each build ONCE per
    * (session, sfDir) through [[graft.plans.FrameMemo]] and every family
    * member (q61/q185/q272/q285 at minInter 3; q193/q296/q300 at 1)
    * derives its view by a filter over the pinned frames. All frames are
    * bounded: kept is (doc, distinct-capped-trigram) grain, inter is
    * candidate-bounded by the df-cap. minInter ≥ 1 only (the memoized
    * base is the ≥1 frame). */
  private[graft] def sharedPairFrames(spark: SparkSession, sfDir: String,
      minInter: Int = 3): (DataFrame, DataFrame) = {
    require(minInter >= 1, s"sharedPairFrames: minInter $minInter must be ≥ 1")
    val kept = graft.plans.FrameMemo.shared(spark, "dedup_kept", sfDir)(
      keptShingles(Tables(spark, sfDir, "documents")))
    val inter1 = graft.plans.FrameMemo.shared(spark, "dedup_inter1", sfDir)(
      pairFramesFromKept(kept, minInter = 1)._1)
    val sizes = graft.plans.FrameMemo.shared(spark, "dedup_sizes", sfDir)(
      pairFramesFromKept(kept, minInter = 1)._2)
    (if (minInter <= 1) inter1 else inter1.filter(col("inter") >= minInter),
      sizes)
  }

  /** The df-capped distinct (doc_id, gh) kept-shingle frame — the shared
    * input every pair derivation starts from. */
  private[graft] def keptShingles(docs: DataFrame): DataFrame = {
    // The distinct's Exchange is identical across its three consumers
    // (sizes + both self-join sides), so ReuseExchange materializes it
    // once — no explicit checkpoint needed (one was measured at +0.5 s of
    // pure overhead on a single-shot run).
    val hashed = distinctShingleHashes(docs)
    // df-cap (MaxShingleDf): drop shingles present in > 10% of documents
    // before the inverted-index join — the skew guard; see the constant's
    // doc. Exact document frequency comes FROM the distinct frame the
    // main path already materializes (`hashed` is one row per (doc,
    // shingle), so a map-side-combined groupBy(gh) counts docs; the
    // distinct's Exchange is shared with the other consumers via
    // ReuseExchange — no second corpus scan, no pair-space re-shuffle).
    // The hot set is tiny by a counting bound, so the main path takes it
    // as a broadcast ANTI-join. Dropping hot shingles after the distinct
    // is equivalent to dropping them before it, which is what the oracle
    // does on the exact strings. ndocs is a broadcast 1-row aggregate,
    // not a driver count.
    val ndocs = docs.agg(count(lit(1)).cast("double").as("nd"))
    val hot = hashed.groupBy("gh").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(ndocs))
      .filter(col("df") > greatest(col("nd") * lit(MaxShingleDf), lit(MinHotDf)))
      .select("gh")
    // (re-select: a using-join moves the join column first, which would
    // scramble the positional toDF renames below)
    hashed.join(broadcast(hot), Seq("gh"), "left_anti")
      .select("doc_id", "gh")
  }

  /** Per-doc sizes + pair intersections from a kept-shingle frame. */
  private[graft] def pairFramesFromKept(kept: DataFrame,
      minInter: Int): (DataFrame, DataFrame) = {
    val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = kept.toDF("ia", "gh").join(kept.toDF("ib", "gh"), "gh")
      .filter(col("ia") < col("ib"))
      .groupBy("ia", "ib").agg(count(lit(1)).as("inter"))
      .filter(col("inter") >= minInter)
    (inter, sizes)
  }

  /** q61: word-trigram Jaccard near-dup via the inverted-index join —
    * pairs sharing ≥3 shingles, scored inter/(|A|+|B|−inter). */
  private def q61(spark: SparkSession, sfDir: String): DataFrame = {
    val (inter, sizes) = sharedPairFrames(spark, sfDir)
    inter
      .join(sizes.toDF("ia", "na"), "ia")
      .join(sizes.toDF("ib", "nb"), "ib")
      .select(col("ia"), col("ib"), col("inter"),
        Tables.r6(col("inter") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .orderBy("ia", "ib")
  }

  /** q185: Broder CONTAINMENT near-dup (Broder, SEQUENCES '97 §2) — the
    * asymmetric companion to q61's resemblance/Jaccard. Containment
    * C(A,B) = |A∩B|/|A| detects SUB-document duplication (a short doc
    * quoted wholesale inside a long one): such a pair has high C in one
    * direction but a low Jaccard, because the long doc's size dominates
    * the union. Emits both directions for every candidate pair sharing
    * ≥3 shingles and keeps pairs where either direction ≥ 0.5 — the
    * "one side is mostly inside the other" report the symmetric q61
    * threshold misses.
    *
    * Determinism: ratios are int/int double divisions r6'd on emission;
    * the ≥0.5 filter compares the ALREADY-r6'd value on both engines.
    * Scale: identical to q61 — the df-capped inverted-index equi-join,
    * never doc×doc; the scoring join adds two broadcast-size frames
    * ((doc_id, n) per side). */
  /** The generic containment primitive behind q185, exposed as
    * [[graft.Graft.containmentPairs]]: `docs` needs (doc_id, text). */
  private[graft] def containmentPairsOf(docs: DataFrame, tau: Double): DataFrame =
    containmentScore(cappedPairFrames(docs), tau)

  private def containmentScore(frames: (DataFrame, DataFrame),
      tau: Double): DataFrame = {
    val (inter, sizes) = frames
    inter
      .join(sizes.toDF("ia", "na"), "ia")
      .join(sizes.toDF("ib", "nb"), "ib")
      .select(col("ia"), col("ib"), col("inter"),
        Tables.r6(col("inter") / col("na")).as("cont_a"),
        Tables.r6(col("inter") / col("nb")).as("cont_b"))
      .filter(greatest(col("cont_a"), col("cont_b")) >= tau)
      .orderBy("ia", "ib")
  }

  private def q185(spark: SparkSession, sfDir: String): DataFrame =
    containmentScore(sharedPairFrames(spark, sfDir), tau = 0.5)

  /** q269: EXACT set-similarity join via prefix filtering (Chaudhuri et
    * al. ICDE'06 SSJoin; Bayardo et al. WWW'07 AllPairs) — every document
    * pair whose word-trigram-set Jaccard is ≥ τ = 0.6, with NO false
    * negatives. The q50/q61 family buys its candidate bound with
    * heuristics (df-cap, ≥3 shared shingles, MinHash banding) that change
    * or approximate the reported set; this operator is the exact
    * τ-threshold join, and its candidate bound is a THEOREM: order the
    * shingle universe globally by (document frequency, hash); if
    * J(A,B) ≥ τ then |A∩B| ≥ ⌈τ·|A|⌉ (the overlap is ≥ τ·|A∪B| ≥ τ·|A|),
    * and any two sets with overlap ≥ α must collide within their first
    * |·|−α+1 elements of ANY shared total order — so indexing only each
    * doc's (1−τ)-fraction prefix of RAREST shingles finds every
    * qualifying pair. Boilerplate-hot shingles sort LAST and never enter
    * a prefix unless a doc has almost nothing else, which is exactly the
    * skew-robustness the df-cap approximates — here with zero semantic
    * cost.
    *
    * Candidate generation uses τ_c = τ − 0.01: the emitted filter
    * compares the r6-ROUNDED Jaccard against τ (cross-engine boundary
    * discipline, q185 precedent), and rounding can lift a true score of
    * τ − 5e-7 over the line — the relaxed prefix keeps those pairs
    * candidate-complete. Prefix length is integer-exact both engines:
    * p = n − ⌈τ_c·n⌉ + 1 with ⌈c·n/100⌉ = (c·n + 99) DIV 100.
    *
    * Determinism: the per-engine prefix ORDER differs (Spark breaks df
    * ties by shingle hash, the oracle needn't prefix at all) but the
    * OUTPUT is order-independent — any total order yields a complete
    * candidate set, and every candidate is verified against the full
    * sets. The oracle therefore runs the plain uncapped inverted-index
    * join: same semantics, plan-free.
    *
    * Scale: two corpus-shingle-bounded shuffles (the df join and the
    * doc-partitioned rank window — AllPairs' global-ordering step), then
    * the candidate join touches only prefix rows (rare shingles, tiny
    * df ⇒ df² per shingle stays small) and verification is two
    * candidate-bounded equi-joins back to the pinned shingle frame.
    * Never doc×doc, no df-cap, no minInter floor. */
  private def q269(spark: SparkSession, sfDir: String): DataFrame =
    similarityJoinOf(Tables(spark, sfDir, "documents"), tau = 0.6)

  /** q270: duplicated-SPAN audit — which exact word spans of each
    * document also appear in other documents, and how much of the doc
    * they cover. Whole-doc scores (q61/q269) say "these two docs are
    * near-dups"; q164's disjoint 8-token segments catch boilerplate only
    * when it lands on a segment boundary. This is the alignment-
    * INDEPENDENT sweep (the exact-substring-dedup shape of suffix-array
    * pipelines, here at word granularity): every SLIDING 8-gram present
    * in ≥2 distinct docs marks its 8 token positions as duplicated, and
    * overlapping marks merge into maximal spans. Per doc: token count,
    * span count, duplicated-token count, duplicated fraction.
    *
    * Determinism: islands derive from integer positions only; the
    * fraction is an int/int division r6'd on emission.
    *
    * Scale: the gram explode is token-bounded (one row per token, the
    * q61 explode's cost shape); the ≥2-distinct-docs filter is one
    * map-side-combinable count over gram hashes; the island merge is a
    * lag/sum window partitioned by doc_id — doc-bounded partitions, no
    * global window. Shared-gram spans rejoin by gram hash equi-join
    * (engine-internal key, oracle uses exact strings — q61 note). */
  private def q270(spark: SparkSession, sfDir: String): DataFrame =
    spanAuditOf(Tables(spark, sfDir, "documents"), k = 8, minDocs = 2)

  /** The generic span-audit behind q270, exposed as
    * [[graft.Graft.spanAudit]]: `docs` needs (doc_id, text); a word
    * `k`-gram is duplicated when ≥ `minDocs` DISTINCT docs contain it.
    * Output (doc_id, n_tokens, n_spans, dup_tokens, dup_fraction),
    * one row per input doc (0-span rows included). */
  private[graft] def spanAuditOf(docs: DataFrame, k: Int, minDocs: Int): DataFrame = {
    require(k >= 2 && minDocs >= 2, s"spanAudit: need k >= 2, minDocs >= 2")
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
      .select(col("doc_id"), size(col("ts")).cast("bigint").as("nt"), col("ts"))
    val grams = toks.filter(col("nt") >= k)
      .select(col("doc_id"), col("nt"),
        explode(expr(s"transform(sequence(0, size(ts) - $k), " +
          s"i -> struct(CAST(i AS BIGINT) AS pos, concat_ws(' ', slice(ts, i + 1, $k)) AS g))")).as("s"))
      .select(col("doc_id"), col("nt"),
        col("s.pos").as("pos"), xxhash64(col("s.g")).as("gh"))
    val shared = grams.groupBy("gh")
      .agg(countDistinct("doc_id").as("dfc"))
      .filter(col("dfc") >= minDocs).select("gh")
    val marks = grams.join(shared, "gh").select("doc_id", "nt", "pos")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    // merge overlapping OR adjacent k-token regions (prev covers up to
    // prev+k−1, so pos ≤ prev+k continues the contiguous duplicated run);
    // −2k sentinel makes the first mark open an island (pos ≥ 0 always)
    val isl = marks
      .withColumn("brk",
        when(col("pos") > coalesce(lag("pos", 1).over(w), lit(-2L * k)) + k,
          1L).otherwise(0L))
      .withColumn("isl", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "nt", "isl")
      .agg((max("pos") - min("pos") + k).as("len"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum("len").as("dup_tokens"))
    toks.select("doc_id", "nt").join(isl, Seq("doc_id"), "left")
      .select(col("doc_id"), col("nt").as("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        Tables.r6(coalesce(col("dup_tokens"), lit(0L)) / col("nt")).as("dup_fraction"))
      .orderBy("doc_id")
  }

  /** q272: cross-source duplication matrix — near-dup PROVENANCE: the
    * q61 candidate pairs (≥3 shared trigrams, df-capped universe) rolled
    * up by unordered source pair into (source_a, source_b, n_pairs,
    * avg_jaccard). The report that says WHERE a corpus duplicates
    * itself: a hot off-diagonal cell means source A republishes source
    * B's text (crawl overlap, mirrors), a hot diagonal cell means the
    * source self-duplicates — which pair-level output (q61/q269) and
    * per-doc output (q270) don't aggregate to.
    *
    * Determinism: each pair's jaccard is r6'd (q61's value), then
    * DECIMAL(18,6)-cast and summed (§2.9 R1 — exact, associative) with
    * meanD for the mean; unordered source keys via least/greatest.
    *
    * Scale: the pair frame is the already-bounded q61 candidate set;
    * source attachment is two equi-joins against the (doc_id, source)
    * projection — the corpus text never moves; the matrix is
    * sources²-bounded. */
  private def q272(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir, "documents")
    val (inter, sizes) = sharedPairFrames(spark, sfDir)
    val scored = inter
      .join(sizes.toDF("ia", "na"), "ia")
      .join(sizes.toDF("ib", "nb"), "ib")
      .select(col("ia"), col("ib"),
        Tables.r6(col("inter") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
    val src = docs.select("doc_id", "source")
    scored
      .join(src.toDF("ia", "sa"), "ia")
      .join(src.toDF("ib", "sb"), "ib")
      .groupBy(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        Tables.meanD(sum(col("jaccard").cast(DecimalType(18, 6))),
          count(lit(1))).as("avg_jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** The generic exact prefix-filter join behind q269, exposed as
    * [[graft.Graft.similarityJoin]]: `docs` needs (doc_id, text); emits
    * (ia, ib, inter, jaccard) for every pair with r6(Jaccard) ≥ `tau`
    * over the word-trigram sets. Exact — see q269's doc for the
    * completeness argument. */
  private[graft] def similarityJoinOf(docs: DataFrame, tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"similarityJoin: tau $tau outside (0, 1]")
    // candidate threshold, percent-integer floor (≤ τ − 0.01 keeps the
    // r6 boundary pairs; c = 0 degenerates to the full inverted join,
    // still exact)
    val c = math.max(math.floor((tau - 0.01) * 100).toInt, 0)
    // NO checkpoint: every consumer embeds the same distinct subplan, so
    // its Exchange is written once and re-read (ReuseExchange — the q61
    // note; an eager localCheckpoint measured ~1.5 s of pure overhead).
    val sh = distinctShingleHashes(docs)
    val dfs = sh.groupBy("gh").agg(count(lit(1)).as("gdf"))
    val wPos = Window.partitionBy("doc_id").orderBy("gdf", "gh")
    val wN = Window.partitionBy("doc_id")
    val prefix = sh.join(dfs, "gh")
      .withColumn("pos", row_number().over(wPos))
      .withColumn("n", count(lit(1)).over(wN))
      .filter(expr(s"pos <= n - (n * $c + 99) DIV 100 + 1"))
      .select("doc_id", "gh", "pos", "n")
    // Candidate generation with the two classic sound prunes, both in
    // exact integer arithmetic on τ_c = c/100:
    //  - length filter: J ≥ τ_c ⟹ |A∩B| ≤ min ∧ |A∪B| ≥ max ⟹
    //    100·min(na,nb) ≥ c·max(na,nb);
    //  - positional filter (PPJoin, Xiao et al. WWW'08): let w be the
    //    globally SMALLEST shared prefix token, at positions (pam, pbm).
    //    Any shared token before w in A would sort before w in B too —
    //    putting it in both prefixes and contradicting w's minimality —
    //    so the whole intersection sits at positions ≥ pam resp. ≥ pbm:
    //    |A∩B| ≤ 1 + min(na − pam, nb − pbm), which must reach the
    //    required overlap α = ⌈τ_c/(1+τ_c)·(na+nb)⌉ (J ≥ τ_c ⟹
    //    inter ≥ τ_c·(na+nb−inter)).
    val cand = prefix.toDF("ia", "gh", "pa", "na")
      .join(prefix.toDF("ib", "gh", "pb", "nb"), "gh")
      .filter(col("ia") < col("ib") &&
        col("na") * 100 >= col("nb") * c && col("nb") * 100 >= col("na") * c)
      .groupBy("ia", "ib", "na", "nb")
      .agg(min("pa").as("pam"), min("pb").as("pbm"))
      .filter(lit(1) + least(col("na") - col("pam"), col("nb") - col("pbm")) >=
        expr(s"(($c * (na + nb)) + ${c + 99}) DIV ${100 + c}"))
      .select("ia", "ib", "na", "nb")
    // Verification: per-doc shingle arrays (doc-length-bounded) joined to
    // the pruned pairs, intersection counted in-row by array_intersect —
    // candidate×1 rows move, never candidate×|A| (the naive re-join
    // measured 3.5 s on 300k pre-prune candidates at sf0.1).
    val sets = sh.groupBy("doc_id").agg(collect_list("gh").as("gs"))
    cand
      .join(sets.toDF("ia", "ga"), "ia")
      .join(sets.toDF("ib", "gb"), "ib")
      .select(col("ia"), col("ib"),
        size(array_intersect(col("ga"), col("gb"))).cast("bigint").as("inter"),
        col("na"), col("nb"))
      .withColumn("jaccard",
        Tables.r6(col("inter") / (col("na") + col("nb") - col("inter"))))
      .filter(col("jaccard") >= tau)
      .select("ia", "ib", "inter", "jaccard")
      .orderBy("ia", "ib")
  }

  /** q62: embedding-cosine near-dup — EVERY pair with cos ≥ 0.3, exactly,
    * but with no cartesian anywhere in the plan: [[exactCosPairs]] prunes
    * cell pairs by a spherical triangle-inequality bound and evaluates
    * the exact cosine only inside the surviving equi-joined cell pairs.
    * Results are identical to brute force by construction (the bound is
    * a no-false-negative guarantee, not a probabilistic filter), so the
    * all-pairs oracle SQL is unchanged. A user who bypasses this
    * operator and writes the raw all-pairs join instead is caught by
    * [[graft.plans.SimilarityBandRewrite]] above the pair crossover. */
  private def q62(spark: SparkSession, sfDir: String): DataFrame =
    exactCosPairs(spark, Tables(spark, sfDir, "embeddings"), tau = 0.3)

  /** Exact threshold cosine self-join without a cartesian: vectors hash
    * to direction cells (the low `cellBits` of the q124 hyperplane
    * signature); each cell gets a centroid and an angular radius
    * r = max∠(member, centroid); a cell pair (A,B) can contain a pair
    * within θτ = arccos(τ) only if ∠(cA,cB) − rA − rB ≤ θτ (spherical
    * triangle inequality, plus 1e-6 rad of slack dwarfing acos FP
    * error) — every other cell pair is pruned WITHOUT looking at its
    * members. Candidates then come from plain equi-joins on the cell
    * ids, exact cosine + id ordering applied inside the join condition.
    *
    * Exactness does not depend on the cells or centroids being "good"
    * (a degenerate centroid ⇒ radius π ⇒ the cell prunes nothing), only
    * the bound — so the pair set always equals brute force. Pruning
    * POWER grows with τ and cluster tightness: at the loose bench
    * τ = 0.3 (θτ ≈ 72°) few 64-d cell pairs separate enough to prune,
    * while at dedup-grade τ ≥ 0.9 most do (ScalePathSuite measures
    * both). The plan shape is the point at 100×: bounded metadata
    * (≤ 2^cellBits centroids) broadcasts, the corpus moves only through
    * hash-partitioned equi-joins — never a CartesianProduct /
    * BroadcastNestedLoop (PlanShapeSuite asserts), so AQE can split
    * skewed cells instead of single-streaming an n² loop. */
  private[graft] def exactCosPairs(spark: SparkSession, emb0: DataFrame,
      tau: Double, cellBits: Int = 8): DataFrame = {
    val sigs = cellSigs(spark, emb0, cellBits)
    val pairs = admissibleCellPairs(sigs, tau)
    // candidates: fan each vector out to its admissible partner cells
    // (broadcast), equi-join on the partner cell; exact cosine and the
    // id-ordering dedup ride IN the join condition so only survivors
    // materialize (same short-circuit as the old formulation). A pair in
    // cells (A,B) survives from exactly one orientation via id_a < id_b.
    val a = sigs.select(col("vec_id").as("id_a"), col("embedding").as("ea"),
      col("nrm").as("na"), col("cell").as("ca_id"))
    val b = sigs.select(col("vec_id").as("id_b"), col("embedding").as("eb"),
      col("nrm").as("nb"), col("cell").as("cb_id"))
    val cos = Tables.r6(dotCol("ea", "eb") / (col("na") * col("nb")))
    a.join(broadcast(pairs), "ca_id")
      .join(b, Seq("cb_id"), "inner")
      .filter(col("id_a") < col("id_b") && cos >= tau)
      .select(col("id_a"), col("id_b"), cos.as("cos"))
      .orderBy("id_a", "id_b")
  }

  /** (vec_id, embedding, cell, norm): direction cell = low `cellBits` of
    * the q124 hyperplane signature. Computed once, read by the two
    * centroid/radius aggregates and both candidate join sides (q124
    * checkpoint precedent; a cluster run would persist(DISK) instead). */
  private[graft] def cellSigs(spark: SparkSession, emb0: DataFrame, cellBits: Int): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val mask = (1 << cellBits) - 1
    hyperplaneSigFrame(emb0)
      .select(col("vec_id"), col("embedding"),
        expr(s"cast(sig & $mask as int)").as("cell"),
        sqrt(dotCol("embedding", "embedding")).as("nrm"))
      .transform(graft.plans.CorpusPin.pin)
  }

  /** The admissible (ca_id, cb_id) cell-pair frame for threshold `tau` —
    * the triangle-inequality prune over bounded cell metadata. Exposed
    * to ScalePathSuite, which measures the pruned fraction. */
  private[graft] def admissibleCellPairs(sigs: DataFrame, tau: Double): DataFrame = {
    // per-cell centroid (plain double mean — engine-internal pruning
    // metadata only: the bound keeps every true pair for ANY centroid,
    // so cross-partition sum order can't affect the result set)
    val cent = sigs.select(col("cell"), posexplode(col("embedding")))
      .groupBy("cell", "pos").agg(avg(col("col").cast("double")).as("c"))
      .groupBy("cell")
      .agg(expr("transform(sort_array(collect_list(struct(pos, c))), s -> s.c)").as("cv"))
      .withColumn("cn", sqrt(expr("aggregate(cv, 0d, (acc, x) -> acc + x * x)")))
    // angular radius; a near-zero centroid norm degrades to r = π
    // (prunes nothing — safe), never a wrongly-small radius
    val rad = sigs.join(broadcast(cent), "cell")
      .select(col("cell"),
        when(col("cn") < 1e-9, lit(math.Pi)).otherwise(
          acos(least(greatest(
            zipFold(col("embedding"), col("cv"), (x, y) => x.cast("double") * y) /
              (col("nrm") * col("cn")), lit(-1.0)), lit(1.0)))).as("ang"))
      .groupBy("cell").agg(max("ang").as("r"))
    val meta = cent.join(rad, "cell")
    // admissible cell pairs: the ≤ 2^cellBits × 2^cellBits METADATA
    // product — bounded by construction, not by data — expressed as a
    // unit-key hash join (pmod(cell,1) = 0 on both sides) so the plan
    // stays cartesian-free end to end.
    // The prune radius derives from τ−1e-6, NOT τ: the final filter
    // thresholds the r6-ROUNDED cosine, which admits raw cosines down
    // to τ−5e-7 — at high τ (small sin θτ) that widens the admissible
    // angle by 5e-7/sin θτ, more than a flat angular slack covers. A
    // cosine-side margin of 1e-6 dominates the r6 gap at every τ; the
    // extra additive 1e-6 rad below still absorbs acos FP error.
    val thetaTau = math.acos(math.max(-1.0, tau - 1e-6))
    val la = meta.select(col("cell").as("ca_id"), col("cv").as("cva"),
      col("cn").as("cna"), col("r").as("ra"), pmod(col("cell"), lit(1)).as("jk"))
    val rb = meta.select(col("cell").as("cb_id"), col("cv").as("cvb"),
      col("cn").as("cnb"), col("r").as("rb"), pmod(col("cell"), lit(1)).as("jk"))
    la.join(rb, "jk")
      .withColumn("cang",
        when(col("cna") < 1e-9 || col("cnb") < 1e-9, lit(0.0)).otherwise(
          acos(least(greatest(
            zipFold(col("cva"), col("cvb"), (x, y) => x * y) /
              (col("cna") * col("cnb")), lit(-1.0)), lit(1.0)))))
      .filter(col("cang") - col("ra") - col("rb") <= lit(thetaTau + 1e-6))
      .select("ca_id", "cb_id")
  }

  /** q63: IVF-style ANN — label-cell centroids as the coarse quantizer
    * (exact DECIMAL mean per position → r6 double), probes scan only
    * their nprobe=2 nearest cells, exact cosine top-3 inside. */
  private def q63(spark: SparkSession, sfDir: String): DataFrame =
    ivfTopK(spark, Tables(spark, sfDir, "embeddings"), col("vec_id") < 10,
      nProbe = 2, topK = 3)

  /** The q63 dataflow, parameterized — `emb` must carry (vec_id, label,
    * embedding); probes are the rows matching `probePred`. This exact
    * function is both the verified q63 query AND the plan ScalePathSuite
    * times against brute force at 24k vectors — the crossover evidence
    * measures the production code path, not a re-implementation. */
  private[graft] def ivfTopK(spark: SparkSession, emb: DataFrame,
      probePred: Column, nProbe: Int, topK: Int): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    // per-(label, position) centroid from exact decimal sums. This is the
    // plain posexplode→groupBy→collect formulation on purpose: a
    // flat-64-sums/arrays-of-expressions variant was measured 2× slower on
    // a single-shot run — its wide expression tree costs more in
    // analysis+codegen than it saves in execution at bench scale, and
    // ReuseExchange already materializes the shared subtree once.
    val pe = emb.select(col("label"), posexplode(col("embedding")))
      .select(col("label"), col("pos"),
        col("col").cast("double").cast(DecimalType(18, 9)).as("v"))
    val cent = pe.groupBy("label", "pos")
      .agg(Tables.r6(sum(col("v")).cast("double") / count(lit(1))).as("c"))
    val centArr = cent.groupBy("label")
      .agg(expr("transform(sort_array(collect_list(struct(pos, c))), s -> s.c)").as("ca"))
    val probes = emb.filter(probePred)
      .select(col("vec_id").as("id_p"), col("embedding").as("ep"),
        sqrt(dotCol("embedding", "embedding")).as("np"))
    // nProbe nearest cells by squared L2 (in-order fold, r6)
    val wCell = Window.partitionBy("id_p").orderBy(col("d2"), col("label"))
    val cells = probes.crossJoin(broadcast(centArr))
      .select(col("id_p"), col("ep"), col("np"), col("label"),
        Tables.r6(zipFold(col("ep"), col("ca"),
          (x, y) => (x.cast("double") - y) * (x.cast("double") - y))).as("d2"))
      .withColumn("cr", row_number().over(wCell))
      .filter(col("cr") <= nProbe)
      .select("id_p", "ep", "np", "label")
    // exact cosine only inside the selected cells (equi-join on label)
    val cand = emb.select(col("vec_id").as("id_c"), col("label"), col("embedding").as("ec"),
      sqrt(dotCol("embedding", "embedding")).as("nc"))
    val wTop = Window.partitionBy("id_p").orderBy(col("cos").desc, col("id_c"))
    cells.join(cand, "label")
      .filter(col("id_p") =!= col("id_c"))
      .select(col("id_p"), col("id_c"),
        Tables.r6(dotCol("ep", "ec") / (col("np") * col("nc"))).as("cos"))
      .withColumn("rn", row_number().over(wTop).cast("bigint"))
      .filter(col("rn") <= topK)
      .orderBy("id_p", "rn")
  }

  /** q333: product quantization (Jégou, Douze, Schmid, TPAMI 2011) — the
    * memory-compression leg of the ANN family (q63 prunes WHICH vectors
    * are scanned; PQ shrinks WHAT each vector costs to hold): the 64-dim
    * embedding splits into 8 contiguous 8-dim subvectors, each assigned
    * to its nearest of 16 per-subspace centroids by squared L2, so a
    * 256-byte float vector becomes 8 one-byte codes — the 32× that makes
    * a 100 TB ANN corpus RAM-resident (codes + codebook replace raw
    * vectors; distances are then table lookups). Codebook = the
    * subvectors of the 16 lowest-id embeddings — deterministic k-means
    * seeding (the init both engines can re-derive bit-identically; a
    * Lloyd sweep refines centroids but never changes the ASSIGNMENT
    * dataflow this operator verifies). Output: one row per (vector,
    * subspace) with the chosen code and the r6-quantized residual —
    * Σ err over a vector's 8 rows IS its reconstruction error.
    *
    * Exactness: float→double casts are exact, the 8-term fold is
    * in-order in both engines, so squared distances are bit-identical
    * and argmin needs only the code-id tie-break.
    *
    * Scale: the codebook is 128 tiny rows — broadcast; assignment is a
    * narrow per-row projection after the broadcast join + one bounded
    * window keyed (vec_id, sub) with 16 rows per key. No corpus-sized
    * shuffle anywhere: the 100 TB encode job is scan → broadcast join →
    * per-key argmin → sink. */
  /** The (vec_id, s, sv) subvector frame behind q333/q339: 8 contiguous
    * 8-dim subvectors, elements cast to double (exact). */
  private def pqSubVecs(df: DataFrame): DataFrame = df
    .select(col("vec_id"), explode(expr("sequence(0, 7)")).as("s"), col("embedding"))
    .select(col("vec_id"), col("s").cast("long").as("s"),
      expr("transform(slice(embedding, s * 8 + 1, 8), x -> cast(x as double))").as("sv"))

  /** The q333 codebook: subvectors of the 16 lowest-id embeddings —
    * (code, s, cv), 128 tiny rows, always broadcast. */
  private def pqCodebook(emb: DataFrame): DataFrame =
    pqSubVecs(emb.filter(col("vec_id") < 16))
      .select(col("vec_id").as("code"), col("s"), col("sv").as("cv"))

  /** Per-(vector, subspace) nearest-centroid assignment — (vec_id, s,
    * code, d2). Shared by q333 (the encode) and q339 (the search). */
  private def pqAssign(emb: DataFrame): DataFrame = {
    val wMin = Window.partitionBy("vec_id", "s").orderBy(col("d2"), col("code"))
    pqSubVecs(emb).join(broadcast(pqCodebook(emb)), "s")
      .select(col("vec_id"), col("s"), col("code"),
        zipFold(col("sv"), col("cv"), (x, y) => (x - y) * (x - y)).as("d2"))
      .withColumn("rn", row_number().over(wMin))
      .filter(col("rn") === 1)
      .select("vec_id", "s", "code", "d2")
  }

  /** The same assignment with the subvector carried through the argmin
    * window — (vec_id, s, code, d2, sv). `sv` is identical across a
    * key's 16 candidate rows, so carrying it changes nothing about the
    * argmin; it lets q340/pqTrain skip their old corpus re-join with
    * pqSubVecs on (vec_id, s) (r18, guide §2.4 — one exchange + join
    * removed per consumer). A groupBy min(struct(d2, code, sv)) form
    * was A/B'd and REVERTED: min over a struct buffer plans
    * SortAggregate (no mutable hash buffer), and its map-side sort of
    * the 16× candidate frame measured worse than the window exchange
    * (q340 1.37→1.66, q339 1.31→1.71 paired). */
  private def pqAssignSv(emb: DataFrame): DataFrame = {
    val wMin = Window.partitionBy("vec_id", "s").orderBy(col("d2"), col("code"))
    pqSubVecs(emb).join(broadcast(pqCodebook(emb)), "s")
      .select(col("vec_id"), col("s"), col("code"), col("sv"),
        zipFold(col("sv"), col("cv"), (x, y) => (x - y) * (x - y)).as("d2"))
      .withColumn("rn", row_number().over(wMin))
      .filter(col("rn") === 1)
      .select("vec_id", "s", "code", "d2", "sv")
  }

  /** Lloyd-to-convergence PQ codebook training (VERDICT r14 item 3) —
    * the driver-loop facade q340's scaladoc promised: q340 is ONE sweep
    * by design (the oracle-checkable unit); this iterates that exact
    * per-sweep dataflow until the relative SSE improvement falls under
    * `tol` or `maxSweeps` is hit. Each sweep: (E) assign every
    * subvector to its nearest centroid (broadcast codebook, the q333
    * argmin with the code-id tie-break), fold the global SSE
    * (r6→DECIMAL(38,6), §2.9 R1); (M) re-estimate each centroid as the
    * exact DECIMAL(18,9)-mean of its members (q340's cent2 discipline);
    * empty cells keep their previous centroid (the standard Lloyd
    * convention — a vanished code must not shrink the codebook).
    *
    * Seeding is id-robust (the q106 lesson): the 16 LOWEST ids by
    * orderBy+limit — never filter(vec_id < 16), which silently returns
    * an empty frame when ids don't start near 0.
    *
    * Scale (the q106/q120 per-iteration-barrier lesson): the corpus
    * subvector frame persists ONCE with recomputable lineage
    * (MEMORY_AND_DISK — corpus-scale frames never localCheckpoint, the
    * q361 rule); each sweep's 128-row codebook localCheckpoints so the
    * final plan never nests sweeps into one analysis/codegen-dominated
    * tree; the per-sweep SSE is a 1-row driver fold — the only collect.
    * Per sweep the dataflow is identical to q340: one broadcast join +
    * one bounded argmin window + one (s, code, dim)-bounded mean.
    *
    * Returns (final codebook (s, code, cv), per-sweep global SSE) —
    * SSE measured against the codebook the sweep ASSIGNED to, so the
    * sequence is non-increasing by Lloyd's guarantee. */
  private[graft] def pqTrain(emb0: DataFrame, maxSweeps: Int = 25,
      tol: Double = 1e-6): (DataFrame, Seq[Double]) = {
    require(maxSweeps >= 1, "pqTrain: maxSweeps must be >= 1")
    val emb = emb0.select(col("vec_id"), col("embedding"))
    val sub = pqSubVecs(emb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seeds = emb.orderBy("vec_id").limit(16)
      .withColumn("code",
        (row_number().over(Window.orderBy("vec_id")) - 1).cast("long"))
    var cb = pqSubVecs(seeds.select(col("code").as("vec_id"), col("embedding")))
      .select(col("vec_id").as("code"), col("s"), col("sv").as("cv"))
      .localCheckpoint(true) // 128 rows; per-sweep barrier (q106 lesson)
    val hist = scala.collection.mutable.ArrayBuffer.empty[Double]
    var sweep = 0
    var converged = false
    while (sweep < maxSweeps && !converged) {
      // assignment argmin carrying sv through the window (the
      // pqAssignSv shape, r18) so the M-step below needs no re-join
      // with `sub` — one corpus join removed per sweep
      val wMin = Window.partitionBy("vec_id", "s").orderBy(col("d2"), col("code"))
      val asg = sub.join(broadcast(cb), "s")
        .select(col("vec_id"), col("s"), col("code"), col("sv"),
          zipFold(col("sv"), col("cv"), (x, y) => (x - y) * (x - y)).as("d2"))
        .withColumn("rn", row_number().over(wMin)).filter(col("rn") === 1)
        .select("vec_id", "s", "code", "d2", "sv")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sse = asg
        .agg(sum(Tables.r6(col("d2")).cast(DecimalType(38, 6)))
          .cast("double").as("sse"))
        .head.getDouble(0)
      converged = hist.nonEmpty &&
        hist.last - sse <= tol * math.max(hist.last, 1.0)
      hist += sse
      if (!converged && sweep < maxSweeps - 1) {
        val upd = asg
          .select(col("s"), col("code"), posexplode(col("sv")).as(Seq("dim", "v")))
          .select(col("s"), col("code"), col("dim"),
            col("v").cast(DecimalType(18, 9)).as("v"))
          .groupBy("s", "code", "dim")
          .agg(Tables.r6(sum(col("v")).cast("double") / count(lit(1))).as("c"))
          .groupBy("s", "code")
          .agg(expr("transform(sort_array(collect_list(struct(dim, c))), x -> x.c)")
            .as("cv_new"))
        cb = cb.join(upd, Seq("s", "code"), "left")
          .select(col("s"), col("code"),
            coalesce(col("cv_new"), col("cv")).as("cv"))
          .localCheckpoint(true) // 128 rows; eager — reads asg before the unpersist
      }
      asg.unpersist(blocking = false)
      sweep += 1
    }
    sub.unpersist(blocking = false)
    (cb.select("s", "code", "cv"), hist.toSeq)
  }

  private def q333(spark: SparkSession, sfDir: String): DataFrame =
    pqAssign(Tables(spark, sfDir, "embeddings"))
      .select(col("vec_id"), col("s").as("sub"), col("code"),
        Tables.r6(col("d2")).as("err"))
      .orderBy("vec_id", "sub")

  /** q124: random-hyperplane LSH ANN (Charikar, STOC 2002) — the
    * signature-based scale path for cosine search that needs NO trained
    * quantizer (complement of q63's IVF, which needs centroids): 16
    * deterministic ±1 hyperplanes give every vector a 16-bit sign
    * signature; P[bit match] = 1 − θ/π, so near vectors collide.
    * Banded 4×4 (q83's simhash recipe, but over embedding geometry
    * rather than token content): candidates = pairs sharing ANY 4-bit
    * band → exact cosine rerank top-3, never all-pairs.
    *
    * Scale: signatures are one narrow codegen'd projection (16
    * `graft_dot`s against literal plane arrays — no shuffle, no plane
    * join); the band join is an equi-join on (band, 4 bits) whose
    * candidate volume is bucket-bounded; rerank touches candidates
    * only. Planes are Knuth-hash ±1 so the oracle regenerates them
    * bit-identically in SQL. */
  /** 32 planes banded 8×4 bits (VERDICT r10 item 2): the original 16/4×4
    * config measured recall@10 = 0.1–0.4 on this corpus — true top-10
    * neighbors sit near cosine 0.3 (per-bit agreement p ≈ 0.6), so a
    * 4-band exact-bucket probe hits a neighbor with only 1−(1−p⁴)⁴ ≈ 0.6.
    * Eight bands with the [[multiProbe]] flip-1 ring lift that to
    * 1−(1−(p⁴+4p³(1−p)))⁸ ≈ 0.994 (measured ≥ 0.9 at sf0.01/sf0.1 by
    * q291). Candidates stay band-bounded: the join is still an equi-join
    * on (b, k) — 5 probe keys per band, corpus side single-key. */
  // canonical plane family lives in functions.Hyperplanes so the
  // SimilarityBandRewrite optimizer rule hashes bit-identically
  private[operators] val NPlanes = graft.functions.Hyperplanes.NPlanes
  private[operators] val NBands = graft.functions.Hyperplanes.NBands
  /** q302's JL target dimensionality — fixed at 16 independently of the
    * LSH signature width (the JL audit asks "is 16 dims enough?", a
    * different question from the index's banding). */
  private val JlDims = 16
  private def planeSign(p: Int, j1: Int): Double =
    graft.functions.Hyperplanes.planeSign(p, j1)

  /** Multi-probe expansion of a (…, b, k) band-key frame (Lv et al.,
    * VLDB'07, applied to sign-LSH): each PROBE band key also probes its
    * four Hamming-1 neighbor buckets (k XOR 1/2/4/8). One flipped sign
    * bit is the most likely miss mode for a true near neighbor —
    * P[bit match] = 1 − θ/π per Charikar — so probing the flip-1 ring
    * lifts per-band hit probability from p⁴ to p⁴ + 4p³(1−p): recall@10
    * measured 0.1–0.4 with exact-bucket probing (VERDICT r10 item 2)
    * and ≥0.8 with the ring. Probe-side only (5 keys per probe band);
    * the CORPUS side stays single-key, so the index layout and its
    * bucket bounds are unchanged — this is more probes, not a bigger
    * index, exactly the multi-probe trade. */
  private[graft] def multiProbe(banded: DataFrame): DataFrame =
    banded.withColumn("k",
      explode(array(Seq(0, 1, 2, 4, 8).map(f => col("k").bitwiseXOR(lit(f))): _*)))

  /** DuckDB CTE fragment mirroring [[multiProbe]]: expand `src` (vec_id,
    * b, k [, extra cols]) to the 5-key probe ring. */
  private[operators] def multiProbeSql(src: String, extraCols: String = ""): String =
    s"(SELECT vec_id$extraCols, b, xor(k, f.f) AS k FROM $src " +
      "CROSS JOIN (SELECT unnest([0, 1, 2, 4, 8]) AS f) f)"

  /** The q124 signature projection — narrow (no Exchange), 16 codegen'd
    * `graft_dot`s against literal plane arrays. Shared with
    * PlanShapeSuite's shuffle-free assertion so the test always probes
    * the production hashing, not a copy. */
  private[graft] def hyperplaneSigFrame(emb: DataFrame): DataFrame = {
    val planes: Seq[Column] = (0 until NPlanes).map { p =>
      typedLit(graft.functions.Hyperplanes.planeArray(p))
    }
    val sigCol = (0 until NPlanes).map { p =>
      when(expr("graft_dot(embedding, p" + p + ")") >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    planes.zipWithIndex.foldLeft(emb.select(col("vec_id"), col("embedding"))) {
      case (df, (pl, p)) => df.withColumn(s"p$p", pl)
    }.select(col("vec_id"), col("embedding"), sigCol.as("sig"))
  }

  private def q124(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val sigs = hyperplaneSigFrame(Tables(spark, sfDir, "embeddings"))
      .transform(graft.plans.CorpusPin.pin) // signatures computed once, read by both join sides
    val banded = sigs.select(col("vec_id"), col("sig"),
        explode(sequence(lit(0), lit(NBands - 1))).as("b"))
      .select(col("vec_id"), col("b"),
        expr("shiftright(sig, cast(b * 4 as int)) & 15").as("k"))
    val cand = multiProbe(banded.filter(col("vec_id") < 10))
      .select(col("vec_id").as("id_p"), col("b"), col("k"))
      .join(banded.select(col("vec_id").as("id_c"), col("b"), col("k")), Seq("b", "k"))
      .filter(col("id_p") =!= col("id_c"))
      .select("id_p", "id_c").distinct()
    val withVec = cand
      .join(sigs.select(col("vec_id").as("id_p"), col("embedding").as("ep"),
        sqrt(dotCol("embedding", "embedding")).as("np")), "id_p")
      .join(sigs.select(col("vec_id").as("id_c"), col("embedding").as("ec"),
        sqrt(dotCol("embedding", "embedding")).as("nc")), "id_c")
    val wTop = Window.partitionBy("id_p").orderBy(col("cos").desc, col("id_c"))
    withVec
      .select(col("id_p"), col("id_c"),
        Tables.r6(dotCol("ep", "ec") / (col("np") * col("nc"))).as("cos"))
      .withColumn("rn", row_number().over(wTop).cast("bigint"))
      .filter(col("rn") <= 3)
      .orderBy("id_p", "rn")
  }

  /** q291 audit depth: recall@10 — deep enough that band-collision
    * misses show up, small enough that the exact ground truth stays a
    * probe-bounded stream. */
  private val RecallK = 10

  /** q291: ANN recall audit — the measurement that justifies ever using
    * q124/q63 instead of exact search: for the q124 probe set (vec_id <
    * 10), compute the TRUE cosine top-10 by brute force and the
    * LSH-candidate top-10, and report per-probe overlap (recall@10).
    * This is how an index's band/nprobe configuration gets tuned before
    * a corpus-scale run — on a probe SAMPLE, never the full matrix
    * (q193 plays the same role for MinHash vs exact Jaccard).
    *
    * Scale: the ground-truth side is the ONLY brute-force piece and it
    * is probe-bounded by construction — the ≤10-row probe frame
    * broadcasts and the corpus streams past it ONCE (a BNLJ whose build
    * side is constant; the PlanShape cartesian probe verifies the bound
    * at runtime). The LSH side reuses q124's candidate discipline: band
    * equi-join, rerank candidates only. */
  private def q291(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val sigs = hyperplaneSigFrame(Tables(spark, sfDir, "embeddings"))
      .transform(graft.plans.CorpusPin.pin) // read by probes, corpus, and both band sides
    val banded = sigs.select(col("vec_id"), col("sig"),
        explode(sequence(lit(0), lit(NBands - 1))).as("b"))
      .select(col("vec_id"), col("b"),
        expr("shiftright(sig, cast(b * 4 as int)) & 15").as("k"))
    val probes = sigs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("id_p"), col("embedding").as("ep"),
        sqrt(dotCol("embedding", "embedding")).as("np"))
      .localCheckpoint(true) // ≤10 rows; broadcast to both scorers
    val corpus = sigs.select(col("vec_id").as("id_c"), col("embedding").as("ec"),
      sqrt(dotCol("embedding", "embedding")).as("nc"))
    val wTop = Window.partitionBy("id_p").orderBy(col("cos").desc, col("id_c"))
    def topK(scored: DataFrame): DataFrame = scored
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= RecallK).select("id_p", "id_c")
    val exact = topK(broadcast(probes)
      .join(corpus, col("id_p") =!= col("id_c"))
      .select(col("id_p"), col("id_c"),
        Tables.r6(dotCol("ep", "ec") / (col("np") * col("nc"))).as("cos")))
    val cand = multiProbe(banded.filter(col("vec_id") < 10))
      .select(col("vec_id").as("id_p"), col("b"), col("k"))
      .join(banded.select(col("vec_id").as("id_c"), col("b"), col("k")), Seq("b", "k"))
      .filter(col("id_p") =!= col("id_c"))
      .select("id_p", "id_c").distinct()
    val lsh = topK(cand
      .join(broadcast(probes), "id_p")
      .join(corpus, "id_c")
      .select(col("id_p"), col("id_c"),
        Tables.r6(dotCol("ep", "ec") / (col("np") * col("nc"))).as("cos")))
    val nl = lsh.groupBy("id_p").agg(count(lit(1)).as("n_lsh"))
    val nh = exact.join(lsh, Seq("id_p", "id_c"))
      .groupBy("id_p").agg(count(lit(1)).as("n_hit"))
    probes.select(col("id_p").as("vec_id"))
      .join(nl.withColumnRenamed("id_p", "vec_id"), Seq("vec_id"), "left")
      .join(nh.withColumnRenamed("id_p", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("n_lsh"), lit(0L)).as("n_lsh"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        Tables.r6(coalesce(col("n_hit"), lit(0L)).cast("double") /
          lit(RecallK.toDouble)).as("recall_at_k"))
      .orderBy("vec_id")
  }

  /** Per-application scratch layouts (the ANN index dirs below) are
    * deleted on JVM exit: the applicationId tag means no other process
    * can ever reuse them, and java.io.tmpdir is tmpfs on the bench box,
    * so orphaned dirs would otherwise accumulate RAM until reboot
    * (ADVICE r12 item 1). Registered once per path; a best-effort hook —
    * a kill -9 still leaks, which is tmpfs's own failure mode, not ours. */
  private val cleanupRegistered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private[operators] def deleteOnExit(path: String): Unit =
    if (cleanupRegistered.add(path))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(new java.io.File(path))
      }))

  /** q314: ANN from a PERSISTED index layout (VERDICT r10 item 7) —
    * q124's exact query shape answered from a bucketed (b, k) band-key
    * table written once per sfDir (the q88 pay-the-shuffle-once pattern
    * applied to similarity): signatures are computed at INDEX-BUILD time
    * and never again — the query plan contains only scans of the index
    * plus the candidate rerank; PlanShapeSuite asserts no signature
    * recompute (no shiftright-of-sig, no plane dots) appears past the
    * first build. This is what an embedding-dedup deployment actually
    * runs at 100 TB: probes arrive continuously, the corpus index is a
    * table, and re-hashing the corpus per query would dwarf the query.
    * Bucketing by (b, k) co-locates each band bucket, so a probe batch
    * prunes to its buckets instead of shuffling the index. Output =
    * q124's (identical semantics, layout-independent), so the oracle is
    * the same recompute-from-scratch SQL — the strongest possible check
    * that the layout changes WHERE the work happens, never the answer.
    * Catalog name + path carry the sfDir tag (q88's convention: scale
    * factors must not clobber each other; re-invocations reuse the
    * layout — the first invocation per sfDir pays the build). */
  /** (vec_id, b, k): the banded band-key frame for `emb` — the one place
    * plane hashing happens on an index build/maintenance path. */
  private def bandedSigOf(emb: DataFrame): DataFrame =
    hyperplaneSigFrame(emb)
      .select(col("vec_id"), col("sig"),
        explode(sequence(lit(0), lit(NBands - 1))).as("b"))
      .select(col("vec_id"), col("b"),
        expr("shiftright(sig, cast(b * 4 as int)) & 15").as("k"))

  /** Build-or-reuse the persisted bucketed (b, k) band-key index over
    * `emb` (shared by q314/q325). applicationId in the tag (ADVICE r11,
    * matching the Aggregates.scala graft_rollup fix): a fixed shared path
    * raced when two applications benched the same sfDir concurrently (one
    * scans while the other drops/rewrites), and cross-session reuse never
    * happened anyway — the in-memory catalog resets with the session.
    * `suffix` separates independently maintained layouts. */
  private def annIndexTableFor(spark: SparkSession, sfDir: String,
      suffix: String, emb: => DataFrame): DataFrame = {
    val tag = sfDir.replaceAll("[^a-zA-Z0-9]", "_") + "_" +
      spark.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "_") + suffix
    val idxT = s"graft_ann_idx$tag"
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_ann_idx$tag"
    deleteOnExit(path)
    if (!(spark.catalog.tableExists(idxT) && new java.io.File(path).exists())) {
      bandedSigOf(emb)
        .write.mode("overwrite").format("parquet")
        .bucketBy(16, "b", "k").sortBy("b", "k")
        .option("path", path).saveAsTable(idxT)
    }
    spark.table(idxT)
  }

  private def q314(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val idx = annIndexTableFor(spark, sfDir, "",
      Tables(spark, sfDir, "embeddings"))
    val emb = Tables(spark, sfDir, "embeddings")
    val cand = multiProbe(idx.filter(col("vec_id") < 10))
      .select(col("vec_id").as("id_p"), col("b"), col("k"))
      .join(idx.select(col("vec_id").as("id_c"), col("b"), col("k")), Seq("b", "k"))
      .filter(col("id_p") =!= col("id_c"))
      .select("id_p", "id_c").distinct()
    val withVec = cand
      .join(emb.select(col("vec_id").as("id_p"), col("embedding").as("ep"),
        sqrt(dotCol("embedding", "embedding")).as("np")), "id_p")
      .join(emb.select(col("vec_id").as("id_c"), col("embedding").as("ec"),
        sqrt(dotCol("embedding", "embedding")).as("nc")), "id_c")
    val wTop = Window.partitionBy("id_p").orderBy(col("cos").desc, col("id_c"))
    withVec
      .select(col("id_p"), col("id_c"),
        Tables.r6(dotCol("ep", "ec") / (col("np") * col("nc"))).as("cos"))
      .withColumn("rn", row_number().over(wTop).cast("bigint"))
      .filter(col("rn") <= 3)
      .orderBy("id_p", "rn")
  }

  /** q302: Johnson–Lindenstrauss random projection + distortion audit —
    * the dimensionality-reduction step in front of ANN/clustering when
    * 64 dims is still too wide to index: project every vector onto the
    * 16 deterministic ±1 hyperplanes q124 already carries (scaled by
    * 1/√16 so distances are preserved in expectation) and, on the q124
    * probe set, report per-pair original vs projected Euclidean distance
    * and their ratio — the empirical distortion JL bounds in theory.
    * Ratios spread around 1 tell an engineer whether 16 dims is enough
    * BEFORE re-indexing the corpus.
    *
    * Scale: the projection is a narrow codegen'd map stage (16
    * `graft_dot`s per row — no shuffle); the audit side is
    * probe²-bounded (≤45 pairs), and distance arithmetic is a fixed
    * 16-term expression chain, not an aggregation — no fold-order
    * hazard. */
  private def q302(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    // limit(10) DECLARES the probe bound in-plan (GlobalLimit carries a
    // rowCount stat; the Filter alone carries none in size-only stats
    // mode, so the probe frame estimated as the whole corpus and
    // SimilarityBandRewrite rewrote this INTENTIONAL 10x10 audit cross
    // join into banded candidates at sf0.1 — caught r16 by the cross-SF
    // oracle gate, fixed with the rule's small-side floor; this is the
    // belt to that suspender). Data-wise a no-op: ids are dense from 0.
    val emb = Tables(spark, sfDir, "embeddings").filter(col("vec_id") < 10)
      .limit(10)
    val planes: Seq[Column] = (0 until JlDims).map { p =>
      typedLit(graft.functions.Hyperplanes.planeArray(p))
    }
    val proj = planes.zipWithIndex.foldLeft(emb.select(col("vec_id"), col("embedding"))) {
      case (df, (pl, p)) => df.withColumn(s"p$p", pl)
    }.select(col("vec_id") +: col("embedding").as("e") +:
      (0 until JlDims).map(p =>
        Tables.r6(expr(s"graft_dot(embedding, p$p)") / lit(4.0)).as(s"z$p")): _*)
      .localCheckpoint(true) // ≤10 rows; both pair-join sides read it
    val a = proj.toDF(proj.columns.map(c => s"a_$c"): _*)
    val b = proj.toDF(proj.columns.map(c => s"b_$c"): _*)
    val d16sq = (0 until JlDims).map(p =>
      (col(s"a_z$p") - col(s"b_z$p")) * (col(s"a_z$p") - col(s"b_z$p")))
      .reduce(_ + _)
    val d64sq = Tables.r6(dotCol("a_e", "a_e")) + Tables.r6(dotCol("b_e", "b_e")) -
      lit(2.0) * Tables.r6(dotCol("a_e", "b_e"))
    a.join(b, col("a_vec_id") < col("b_vec_id"))
      .select(col("a_vec_id").as("id_a"), col("b_vec_id").as("id_b"),
        Tables.r6(sqrt(d64sq)).as("d_orig"),
        Tables.r6(sqrt(d16sq)).as("d_proj"))
      .select(col("id_a"), col("id_b"), col("d_orig"), col("d_proj"),
        Tables.r6(col("d_proj") / col("d_orig")).as("ratio"))
      .orderBy("id_a", "id_b")
  }

  /** q309: blocking-quality audit for record linkage — the measurement
    * behind q240's first-token blocking choice: ground truth = ALL
    * name pairs with Jaro–Winkler ≥ 0.89 over the DISTINCT name domain
    * (value-domain², bounded — q222's collapse rule makes the exhaustive
    * cross affordable), then how many of those pairs share a block, how
    * many candidate pairs blocking generates at all, and the reduction
    * vs the full cross. Recall says whether blocking LOSES matches;
    * reduction says what it SAVES — the two numbers every blocking
    * scheme is chosen by (q291's role for ANN, played for linkage).
    *
    * Scale: everything runs on the ≤|name-domain| frame (≈64 rows at
    * every SF); the exhaustive cross is domain²-bounded by construction
    * and never touches the parts table beyond the initial collapse. */
  /** The q240/q309 blocking keys for one name column: a tagged
    * first-token key and a tagged last-token key per name (multi-pass
    * blocking as ONE key explode — candidates are the equi-join on
    * `blk`, unioned across passes by construction). Every input column
    * rides along (r18): q240 used to re-join the exploded keys back to
    * the id frame just to re-attach `nid` — a name-domain-sized join
    * the pass-through makes unnecessary. */
  private def erBlockKeys(d: DataFrame, n: String): DataFrame =
    d.withColumn("blk", explode(array(
      concat(lit("f:"), split(col(n), " ").getItem(0)),
      concat(lit("l:"), element_at(split(col(n), " "), -1)))))

  /** Same keys as a DuckDB CTE body over relation `src(col)`. */
  private def erBlockKeysSql(src: String, c: String): String =
    s"SELECT $c, 'f:' || str_split($c, ' ')[1] AS blk FROM $src " +
      s"UNION ALL SELECT $c, 'l:' || str_split($c, ' ')[-1] FROM $src"

  private def q309(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.JaroWinkler.register(spark)
    val names = Tables(spark, sfDir, "part").select("p_name").distinct()
      .localCheckpoint(true) // name domain; read by truth + block sides
    val a = names.toDF("na"); val b = names.toDF("nb")
    val truth = a.join(b, col("na") < col("nb"))
      .filter(Tables.r6(expr("graft_jaro_winkler(na, nb)")) >= ErJwThresh)
      .select("na", "nb")
      .localCheckpoint(true) // ≤domain² matches; read twice below
    // two-pass blocking (VERDICT r10 item 4): first-token alone measured
    // recall 0.67 — a third of true JW matches never reached the matcher.
    // Unioning a LAST-token pass catches the tail (JW's Winkler prefix
    // boost means prefix-divergent matches still share their suffix
    // token here: measured recall 1.0 / reduction 0.78 on this domain).
    // Key-explode form, not per-pass cross joins: candidates come from
    // ONE equi-join on the tagged key, the scalable multi-pass shape.
    val blocked = erBlockKeys(a, "na").join(erBlockKeys(b, "nb"), "blk")
      .filter(col("na") < col("nb"))
      .select("na", "nb").distinct()
      .localCheckpoint(true)
    val nNames = names.agg(count(lit(1)).as("n_names"))
    val nTruth = truth.agg(count(lit(1)).as("n_true"))
    val nBlocked = blocked.agg(count(lit(1)).as("n_candidates"))
    val nFound = truth.join(blocked, Seq("na", "nb")).agg(count(lit(1)).as("n_found"))
    nNames.crossJoin(nTruth).crossJoin(nBlocked).crossJoin(nFound)
      .select(col("n_true"), col("n_candidates"), col("n_found"),
        Tables.meanD(col("n_found"), col("n_true")).as("recall"),
        Tables.r6(lit(1.0) - col("n_candidates").cast("double") /
          (col("n_names") * (col("n_names") - 1) / lit(2L))).as("reduction"))
  }

  /** q319 sorted-neighborhood window size: rank distance < 8 pairs
    * (each item meets its 7 sorted neighbors per pass). */
  private val SnWindow = 8

  /** q319: multi-pass sorted-neighborhood linkage (Hernández–Stolfo,
    * SIGMOD'95) — the OTHER classic candidate-generation method next to
    * q240/q309's key blocking: sort the domain, compare each record to
    * its w−1 sorted neighbors. One pass over one sort key misses matches
    * whose difference is at the key's FRONT (lexicographic adjacency
    * needs a shared prefix), so this runs the method's standard fix —
    * two passes, forward name order + REVERSED name order (suffix
    * adjacency) — and unions the candidate sets. Same report shape as
    * q309 (truth = exhaustive JW ≥ 0.89 over the bounded name domain):
    * n_true / n_candidates / n_found / recall / reduction, so the two
    * generation methods are directly comparable from their audit rows.
    *
    * Scale: the sort is [[graft.plans.DistributedRank.denseTokens]] —
    * range-partitioned two-phase rank, NO single-partition sort — and
    * the neighbor join is an equi-join on the rank bucket ⌊rank/w⌋
    * (each side explodes to its own + next bucket: any pair within
    * rank distance < w shares a probed bucket; candidates stay
    * window-bounded at w·n, never n²). The exhaustive truth side is
    * domain²-bounded (the q309/q222 collapse rule). */
  private def q319(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.JaroWinkler.register(spark)
    val names = Tables(spark, sfDir, "part").select("p_name").distinct()
      .localCheckpoint(true) // name domain; truth + both rank passes read it
    val a = names.toDF("na"); val b = names.toDF("nb")
    val truth = a.join(b, col("na") < col("nb"))
      .filter(Tables.r6(expr("graft_jaro_winkler(na, nb)")) >= ErJwThresh)
      .select("na", "nb")
      .localCheckpoint(true) // ≤domain² matches; read twice below
    def passPairs(keyed: DataFrame): DataFrame = {
      // keyed: (p_name, token) — rank-bucket band join, bucket g and g+1
      // probed so any rank distance < SnWindow collides at least once
      val bucketed = keyed.select(col("p_name"), col("token"),
        explode(array((col("token") / SnWindow).cast("bigint"),
          (col("token") / SnWindow).cast("bigint") + 1)).as("g"))
      bucketed.select(col("p_name").as("na"), col("token").as("ta"), col("g"))
        .join(bucketed.select(col("p_name").as("nb"), col("token").as("tb"), col("g")), "g")
        .filter(col("na") < col("nb") &&
          abs(col("ta") - col("tb")) < SnWindow)
        .select("na", "nb")
    }
    val fwd = passPairs(graft.plans.DistributedRank.denseTokens(names, "p_name"))
    val rev = passPairs(
      graft.plans.DistributedRank.denseTokens(
        names.select(col("p_name"), reverse(col("p_name")).as("rname")), "rname")
        .join(names.withColumn("rname", reverse(col("p_name"))), "rname")
        .select("p_name", "token"))
    val cand = fwd.unionByName(rev).distinct()
      .localCheckpoint(true) // window-bounded; counted + joined below
    val nNames = names.agg(count(lit(1)).as("n_names"))
    val nTruth = truth.agg(count(lit(1)).as("n_true"))
    val nCand = cand.agg(count(lit(1)).as("n_candidates"))
    val nFound = truth.join(cand, Seq("na", "nb")).agg(count(lit(1)).as("n_found"))
    nNames.crossJoin(nTruth).crossJoin(nCand).crossJoin(nFound)
      .select(col("n_true"), col("n_candidates"), col("n_found"),
        Tables.meanD(col("n_found"), col("n_true")).as("recall"),
        Tables.r6(lit(1.0) - col("n_candidates").cast("double") /
          (col("n_names") * (col("n_names") - 1) / lit(2L))).as("reduction"))
  }

  // lazy: references ErJwThresh, which is defined further down the file —
  // a plain val would read 0.0 during the object initializer
  private lazy val q319Sql: String = {
    def pass(order: String, tag: String): String =
      s"r$tag AS (SELECT p_name, CAST(ROW_NUMBER() OVER (ORDER BY $order) AS BIGINT) AS t FROM names), " +
        s"b$tag AS (SELECT p_name, t, unnest([t // $SnWindow, t // $SnWindow + 1]) AS g FROM r$tag), " +
        s"p$tag AS (SELECT DISTINCT a.p_name AS na, b.p_name AS nb FROM b$tag a JOIN b$tag b " +
        s"ON a.g = b.g AND a.p_name < b.p_name AND abs(a.t - b.t) < $SnWindow) "
    "WITH names AS (SELECT DISTINCT p_name FROM part), " +
      "truth AS (SELECT a.p_name AS na, b.p_name AS nb FROM names a " +
      "JOIN names b ON a.p_name < b.p_name " +
      s"WHERE ${Tables.r6sql("jaro_winkler_similarity(a.p_name, b.p_name)")} >= $ErJwThresh), " +
      pass("p_name", "f") + ", " + pass("reverse(p_name)", "r") + ", " +
      "cand AS (SELECT na, nb FROM pf UNION SELECT na, nb FROM pr), " +
      "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_names FROM names), " +
      "nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true FROM truth), " +
      "nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand), " +
      "nf AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_found FROM truth " +
      "JOIN cand USING (na, nb)) " +
      "SELECT n_true, n_candidates, n_found, " +
      Tables.meanDSql("n_found", "n_true") + " AS recall, " +
      Tables.r6sql("1.0 - CAST(n_candidates AS DOUBLE) / " +
        "(n_names * (n_names - 1) / 2)") + " AS reduction " +
      "FROM nn CROSS JOIN nt CROSS JOIN nb CROSS JOIN nf"
  }

  /** q298: SimHash bit-balance audit — index-health check for the q60
    * fingerprints: each of the 32 bits should be set in ~50% of
    * documents; a bit stuck near 0 or 1 (degenerate) carries no
    * discriminating power, silently widening every q83 band bucket and
    * inflating candidate volume. Per bit: set count, set rate,
    * |rate − 0.5| imbalance, and a degenerate flag outside [0.4, 0.6] —
    * the table to read before trusting a simhash-banded dedup at scale.
    *
    * Scale: fingerprints are the existing one-pass simhash aggregate;
    * the bit explode is ×32 on the (doc, fingerprint) frame (constant
    * fan-out, narrow), rolled into a 32-group map-side-combined agg. */
  private def q298(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = simhashDF(spark, sfDir)
    val ndocs = sh.agg(count(lit(1)).cast("double").as("nd"))
    sh.select(col("simhash"), explode(sequence(lit(0), lit(31))).as("bit"))
      .select(col("bit").cast("bigint").as("bit"),
        expr("shiftright(simhash, cast(bit as int)) & 1").as("isset"))
      .groupBy("bit").agg(sum("isset").as("n_set"))
      .crossJoin(broadcast(ndocs))
      .select(col("bit"), col("n_set"),
        Tables.meanD(col("n_set"), col("nd")).as("p_set"),
        Tables.r6(abs(col("n_set").cast("double") / col("nd") - lit(0.5)))
          .as("imbalance"))
      .withColumn("degenerate", col("p_set") < 0.4 || col("p_set") > 0.6)
      .orderBy("bit")
  }

  /** Oracle CTE prefix shared by q61/q185 — the exact-string mirror of
    * [[cappedPairFrames]] (split → distinct trigrams → df-cap → kept →
    * sizes → pair intersections). */
  private val pairCtesSql: String =
    "WITH split AS (SELECT doc_id, str_split(text, ' ') AS ts FROM documents WHERE len(str_split(text, ' ')) >= 3), " +
      "tg AS (SELECT DISTINCT doc_id, g FROM (SELECT doc_id, " +
      "unnest(list_transform(range(1, len(ts) - 1), i -> " +
      "ts[CAST(i AS INT)] || ' ' || ts[CAST(i + 1 AS INT)] || ' ' || ts[CAST(i + 2 AS INT)])) AS g FROM split)), " +
      "hot AS (SELECT g FROM (SELECT g, COUNT(*) AS df FROM tg GROUP BY g) " +
      s"WHERE df > $hotThresholdSql), " +
      "kept AS (SELECT doc_id, g FROM tg WHERE g NOT IN (SELECT g FROM hot)), " +
      "sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id), " +
      "pairs AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter " +
      "FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2) "

  /** Jaro–Winkler acceptance threshold for q240 — the closest observed
    * name-pair score on the fixed vocabulary sits 3e-3 away (0.893), so
    * the r6-rounded comparison has no boundary hazard. */
  private val ErJwThresh = 0.89

  /** q240: entity resolution end-to-end — the record-linkage capstone
    * composing three verified pieces: BLOCK (first name token) →
    * MATCH (native `graft_jaro_winkler` ≥ 0.89 within block, q235's
    * Expression) → CLUSTER (the q76 connected-components loop over the
    * match graph) → label every part with its entity (= min partkey of
    * the cluster) and the entity's member count. The catalog-dedup /
    * customer-360 pipeline shape (Fellegi–Sunter blocking tradition).
    *
    * THE scale decision: fuzzy matching runs on the DISTINCT NAME
    * domain (q222's collapse-before-join rule — the vocabulary is ~64
    * names at every SF while parts grow without bound), so pair
    * generation is value-domain² within blocks, not corpus²; the
    * corpus only re-attaches by a name equi-join against the bounded,
    * broadcastable label frame. Determinism: entity ids are min
    * partkey (no RNG), the match score is r6-rounded before the
    * threshold compare (both engines rank the same 6dp value), and the
    * CC fixpoint is unique. Oracle: DuckDB mirrors the blocks + its own
    * jaro_winkler + a WITH RECURSIVE min-label closure — cross-engine
    * agreement of two native linkage stacks end-to-end. */
  private def q240(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.JaroWinkler.register(spark)
    val parts = Tables(spark, sfDir, "part").select("p_partkey", "p_name")
    val nameIds = parts.groupBy("p_name").agg(min("p_partkey").as("nid"))
      .localCheckpoint(true) // value-domain-sized; edges + re-attach read it
    // first+last-token two-pass blocking, same keys as the q309 audit
    // that justifies them (recall 0.67 → 1.0 on this name domain); nid
    // rides the explode (erBlockKeys pass-through, r18) — no re-join
    val b = erBlockKeys(nameIds, "p_name")
    val edges = b.select(col("nid").as("id_a"), col("p_name").as("na"), col("blk"))
      .join(b.select(col("nid").as("id_b"), col("p_name").as("nb"), col("blk")), "blk")
      .filter(col("id_a") < col("id_b"))
      .filter(Tables.r6(expr("graft_jaro_winkler(na, nb)")) >= ErJwThresh)
      .select("id_a", "id_b").distinct()
    val labels = LLMPipeline.ccLabels(edges)._1 // (doc_id, comp), edge vertices only
    val entity = nameIds
      .join(broadcast(labels.withColumnRenamed("doc_id", "nid")), Seq("nid"), "left")
      .select(col("p_name"), coalesce(col("comp"), col("nid")).as("entity"))
    val labeled = parts.join(broadcast(entity), "p_name")
    val sizes = labeled.groupBy("entity").agg(count(lit(1)).as("n_members"))
    labeled.join(broadcast(sizes), "entity")
      .select("p_partkey", "p_name", "entity", "n_members")
      .orderBy("p_partkey")
  }

  /** q325: INCREMENTAL maintenance of the persisted ANN index (VERDICT
    * r12 item 2) — the delta path whose absence forced a full index
    * rebuild on every corpus change. Scenario, derived deterministically
    * so the oracle re-derives it: the STANDING index was built (and
    * persisted, q314's layout) over even vec_ids; the day's batch UPSERTS
    * the odd vec_ids and DELETES every id divisible by 6. Maintenance is
    * algebraic on the banded layout (q132's incremental-agg pattern
    * applied to an index):
    *
    *   maintained = (persisted_base ANTI-JOIN tombstones) ∪ banded(delta)
    *
    * Plane hashing touches ONLY the delta — the returned plan reads the
    * index table for the base side and never re-hashes the base corpus
    * (PlanShapeSuite asserts: exactly one embedding-hashing projection,
    * index scan present). Deletes are a key anti-join against the
    * tombstone feed. The output is EXACTLY what a from-scratch rebuild
    * would produce: the oracle recomputes full banding in SQL and the
    * per-band entry counts, vector counts and md5 content checksums must
    * hash-match — proving the incremental path loses and duplicates
    * nothing.
    *
    * Scale: the standing index (100 TB corpus → ~10¹¹ banded rows) is
    * precisely what cannot be rebuilt per delta; the daily batch is
    * bounded. The anti-join streams the index once against the (small,
    * in production) tombstone feed; the append side is batch-sized. On a
    * lake table this lands as partition append + merge-on-read delete
    * files — the same algebra. The audit aggregation here (per-band
    * counts/checksum) is the maintenance job's verification step, itself
    * one map-side-combined pass. */
  private def q325(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val emb = Tables(spark, sfDir, "embeddings")
    val idx = annIndexTableFor(spark, sfDir, "_base",
      emb.filter(col("vec_id") % 2 === 0))
    val deltaBanded = bandedSigOf(emb.filter(col("vec_id") % 2 === 1))
    val tombstones = emb.select(col("vec_id")).filter(col("vec_id") % 6 === 0)
    val maintained = idx.join(tombstones, Seq("vec_id"), "left_anti")
      .unionByName(deltaBanded)
    maintained
      .select(col("vec_id"), col("b").cast("long").as("b"), col("k"))
      .groupBy("b")
      .agg(count(lit(1)).as("n_entries"),
        countDistinct(col("vec_id")).as("n_vectors"),
        sum(expr("cast(conv(substring(md5(concat(cast(vec_id as string), ':', " +
          "cast(b as string), ':', cast(k as string))), 1, 8), 16, 10) as bigint)"))
          .as("checksum"))
      .orderBy("b")
  }

  /** q326: perceptual-hash image near-dup (VERDICT r12 item 5) — aHash
    * (average hash) computed from RAW UNCOMPRESSED BMP PIXELS, completing
    * multimodal dedup beyond exact bytes + header metadata: re-encoded or
    * lightly edited images share no content hash but land within a few
    * aHash bits. Recipe (the standard one, integer-exact so both engines
    * agree bit-for-bit):
    *
    *  1. 16×16 BGR pixels → 64 2×2-block sums of (B+G+R) — hex-slice
    *     arithmetic on the blob (`conv(substr(hex(content)…))`, the q95
    *     cross-engine decode pattern), bottom-up row order handled in the
    *     offset math; no media libs anywhere.
    *  2. bit b set iff 64·blockSum(b) > Σ blockSums — "block mean above
    *     global mean" with the division cleared, so there is no rounding
    *     to diverge on.
    *  3. the 64 bits pack into TWO 32-bit words (lo/hi): DuckDB's `<<`
    *     range-checks BIGINT shifts (1<<63 throws), so a single 64-bit
    *     word cannot be built portably; two words also keep every shift
    *     ≤ 31 for any future 32-bit engine.
    *  4. pairs at Hamming ≤ 6 via the q83 pigeonhole discipline: 8 bands
    *     of 8 bits (4 per word) — ≤ 6 differing bits leaves ≥ 2 clean
    *     bands, so candidates come from a (band, byte) EQUI-join, never
    *     image×image; the exact Hamming filter runs on candidates only.
    *
    * Scale: per image the hash is one narrow codegen'd projection over
    * the blob (no shuffle); the pair join is band-bounded exactly like
    * q83/q124 — at 10⁹ images the index is 8 rows/image of (band, byte,
    * id), and the hex math runs where the bytes already sit (binaryFile
    * splits files across tasks; payload bytes never shuffle). */
  private def q326(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = Scans.imageFixture
    val blockSum =
      "aggregate(sequence(0, 11), 0L, (acc, i) -> acc + " +
        "cast(conv(substr(hx, (54 + (15 - ((bi div 8) * 2 + (i div 3) div 2)) * 48 + " +
        "((bi % 8) * 2 + (i div 3) % 2) * 3 + i % 3) * 2 + 1, 2), 16, 10) as bigint))"
    def word(startBlock1: Int): String =
      s"aggregate(zip_with(slice(sums, $startBlock1, 32), sequence(0, 31), " +
        "(s, i) -> IF(s * 64 > total, shiftleft(1L, i), 0L)), 0L, (acc, x) -> acc + x)"
    val hashed = spark.read.format("binaryFile").option("pathGlobFilter", "*.bmp").load(dir)
      .select(regexp_extract(col("path"), "[^/]+$", 0).as("img"),
        hex(col("content")).as("hx"))
      .withColumn("sums", expr(s"transform(sequence(0, 63), bi -> $blockSum)"))
      .withColumn("total", expr("aggregate(sums, 0L, (acc, x) -> acc + x)"))
      .select(col("img"), expr(word(1)).as("lo"), expr(word(33)).as("hi"))
      .transform(graft.plans.CorpusPin.pin) // hashed once; both band-join sides read it
    val banded = hashed.select(col("img"), col("lo"), col("hi"),
        explode(sequence(lit(0), lit(7))).as("b"))
      .withColumn("k", expr(
        "IF(b < 4, shiftright(lo, cast(b * 8 as int)), shiftright(hi, cast((b - 4) * 8 as int))) & 255"))
    val l = banded.select(col("img").as("img_a"), col("lo").as("la"), col("hi").as("ha"), col("b"), col("k"))
    val r = banded.select(col("img").as("img_b"), col("lo").as("lb"), col("hi").as("hb"), col("b"), col("k"))
    l.join(r, Seq("b", "k"))
      .filter(col("img_a") < col("img_b"))
      .select("img_a", "img_b", "la", "lb", "ha", "hb").distinct()
      .select(col("img_a"), col("img_b"),
        expr("cast(bit_count(la ^ lb) + bit_count(ha ^ hb) as bigint)").as("hamming"))
      .filter(col("hamming") <= 6)
      .orderBy("img_a", "img_b")
  }

  /** q334: audio-fingerprint dedup over raw PCM — completes the
    * multimodal dedup triple (q326 images, q332 video, this the audio
    * leg): per file, 64 blocks of 12 samples each get their total
    * ABSOLUTE amplitude (energy, the part of the signal a re-level/
    * re-encode shifts least); bit b = 1 iff block energy exceeds the
    * file mean (the aHash trick on the energy envelope, robust to the
    * fixture clones' ±5 dither because bits flip only when a block sits
    * within dither range of the mean); the 64-bit fingerprint bands
    * into 8×8-bit keys, candidates come from the (band, byte) equi-join
    * — never file×file — and the exact Hamming ≤ 6 filter runs on
    * candidates only. Two's-complement sample decode is q328's
    * hex-slice arithmetic, mirrored byte-for-byte in the oracle.
    *
    * Scale: per file the fingerprint is one narrow codegen'd projection
    * over the blob (binaryFile splits files across tasks; payloads
    * never shuffle); the pair join is band-bounded (q83/q124/q326
    * discipline) — at 10⁹ recordings the index is 8 (band, byte, id)
    * rows per file, the q314 persisted-index shape. */
  private def q334(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = Scans.audioDupFixture
    val raw = "(cast(conv(substr(hx, (44 + (bi * 12 + i) * 2) * 2 + 1, 2), 16, 10) as bigint) + " +
      "256 * cast(conv(substr(hx, (44 + (bi * 12 + i) * 2) * 2 + 3, 2), 16, 10) as bigint))"
    val blockSum =
      s"aggregate(sequence(0, 11), 0L, (acc, i) -> acc + abs(IF($raw >= 32768, $raw - 65536, $raw)))"
    def word(startBlock1: Int): String =
      s"aggregate(zip_with(slice(sums, $startBlock1, 32), sequence(0, 31), " +
        "(s, i) -> IF(s * 64 > total, shiftleft(1L, i), 0L)), 0L, (acc, x) -> acc + x)"
    val hashed = spark.read.format("binaryFile").option("pathGlobFilter", "*.wav").load(dir)
      .select(regexp_extract(col("path"), "[^/]+$", 0).as("fname"),
        hex(col("content")).as("hx"))
      .withColumn("sums", expr(s"transform(sequence(0, 63), bi -> $blockSum)"))
      .withColumn("total", expr("aggregate(sums, 0L, (acc, x) -> acc + x)"))
      .select(col("fname"), expr(word(1)).as("lo"), expr(word(33)).as("hi"))
      .transform(graft.plans.CorpusPin.pin) // hashed once; both band-join sides read it
    val banded = hashed.select(col("fname"), col("lo"), col("hi"),
        explode(sequence(lit(0), lit(7))).as("b"))
      .withColumn("k", expr(
        "IF(b < 4, shiftright(lo, cast(b * 8 as int)), shiftright(hi, cast((b - 4) * 8 as int))) & 255"))
    val l = banded.select(col("fname").as("fname_a"), col("lo").as("la"), col("hi").as("ha"), col("b"), col("k"))
    val r = banded.select(col("fname").as("fname_b"), col("lo").as("lb"), col("hi").as("hb"), col("b"), col("k"))
    l.join(r, Seq("b", "k"))
      .filter(col("fname_a") < col("fname_b"))
      .select("fname_a", "fname_b", "la", "lb", "ha", "hb").distinct()
      .select(col("fname_a"), col("fname_b"),
        expr("cast(bit_count(la ^ lb) + bit_count(ha ^ hb) as bigint)").as("hamming"))
      .filter(col("hamming") <= 6)
      .orderBy("fname_a", "fname_b")
  }

  /** q336: semantic deduplication, the SemDeDup recipe (Abbas et al.,
    * arXiv 2303.09540) — q62 finds near-duplicate PAIRS; this turns the
    * idea into the corpus-curation OPERATOR: cluster the embedding
    * space with a coarse quantizer (here the q333 seeding: nearest of
    * the 16 lowest-id embeddings by full-vector L2, i.e. the IVF cell),
    * then inside each cluster drop every vector that has a LOWER-id
    * clustermate at cosine ≥ 0.3 (q62's threshold) — per vector:
    * bucket, representative (lowest such clustermate, itself if kept)
    * and the keep verdict. Lower-id-wins is deterministic and
    * chain-free: the verdict needs no connected components, just one
    * grouped MIN over the filtered pair join — both engines agree
    * row-for-row.
    *
    * Scale: the whole point of SemDeDup is that the pair space is
    * CLUSTER-bounded, never corpus²: centroids are a broadcast
    * (k×dim, tiny even at k=100k), assignment is one narrow
    * projection + a 16-row-per-key argmin, and the self-join is an
    * equi-join on the bucket id. Giant cells degrade gracefully to the
    * q124 band discipline inside the cell. */
  /** Full-vector nearest-seed cells (the q336/q339 coarse quantizer):
    * rank the 16 lowest-id embeddings of `corpus` by L2 distance from
    * each row of `subjects`, keep the `nCells` nearest — (vec_id,
    * bucket, cell_rank). nCells = 1 is the index assignment; nCells > 1
    * is the multi-cell PROBE side (q63's nprobe idea). */
  private def coarseCells(corpus: DataFrame, subjects: DataFrame, nCells: Int): DataFrame = {
    val cents = corpus.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code"), col("embedding").as("cv"))
    val scored = subjects.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("code"),
        zipFold(col("embedding"), col("cv"), (x, y) =>
          (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))).as("d2"))
    // (an nCells==1 groupBy min(struct(d2, code)) variant was A/B'd and
    // REVERTED r18: struct-buffer min plans SortAggregate, whose
    // map-side sort measured worse than this window — q336 1.07→1.44)
    val wMin = Window.partitionBy("vec_id").orderBy(col("d2"), col("code"))
    scored.withColumn("rn", row_number().over(wMin)).filter(col("rn") <= nCells)
      .select(col("vec_id"), col("code").as("bucket"), col("rn").as("cell_rank"))
  }

  private def q336(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val emb = Tables(spark, sfDir, "embeddings")
    val assigned = emb
      .join(coarseCells(emb, emb, 1).select("vec_id", "bucket"), "vec_id")
      .select(col("vec_id"), col("bucket"), col("embedding"),
        sqrt(dotCol("embedding", "embedding")).as("nrm"))
      .transform(graft.plans.CorpusPin.pin) // assigned once; both self-join sides read it
    val l = assigned.select(col("vec_id").as("id_a"), col("bucket"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val r = assigned.select(col("vec_id").as("id_b"), col("bucket"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val dups = l.join(r, "bucket").filter(col("id_a") < col("id_b"))
      .filter(Tables.r6(dotCol("ea", "eb") / (col("na") * col("nb"))) >= 0.3)
      .groupBy(col("id_b").as("vec_id")).agg(min(col("id_a")).as("rep0"))
    assigned.select("vec_id", "bucket").join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("bucket"),
        coalesce(col("rep0"), col("vec_id")).as("rep"),
        col("rep0").isNull.as("keep"))
      .orderBy("vec_id")
  }

  /** q340: one Lloyd refinement sweep of the PQ codebook — the training
    * step q333's scaladoc promised: re-estimate every per-subspace
    * centroid as the exact mean of its assigned subvectors and report
    * per (subspace, code) cell the member count and the sum of squared
    * distances BEFORE (to the seed centroid) and AFTER (to the refined
    * one). Lloyd's guarantee — the mean minimizes within-cell SSE — is
    * the operator's testable invariant: sse_after ≤ sse_before in every
    * cell (OperatorSuite asserts it, plus the global strict decrease).
    *
    * Determinism: means are exact DECIMAL(18,9) sums ÷ counts → r6
    * (q63's centroid discipline); every per-member distance is a
    * bit-identical in-order fold, r6-quantized then DECIMAL-summed
    * (§2.9 R1) so cell SSEs are partition-order-free.
    *
    * Scale: one grouped mean over (subspace, code, dim) — 8·16·8 = 1024
    * output cells regardless of corpus size — and two candidate-bounded
    * folds; the corpus contributes one narrow pass each. Iterating to
    * convergence is this operator in a driver loop — [[pqTrain]] /
    * [[graft.Graft.pqTrain]] IS that loop (r15); the dataflow per
    * sweep is unchanged. */
  private def q340(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables(spark, sfDir, "embeddings")
    // sv rides the assignment argmin (pqAssignSv, r18) — the old
    // pqAssign ⋈ pqSubVecs corpus re-join on (vec_id, s) is gone
    val members = pqAssignSv(emb)
      .transform(graft.plans.CorpusPin.pin) // feeds the mean + both SSE folds
    val cent2 = members
      .select(col("s"), col("code"), posexplode(col("sv")).as(Seq("dim", "v")))
      .select(col("s"), col("code"), col("dim"), col("v").cast(DecimalType(18, 9)).as("v"))
      .groupBy("s", "code", "dim")
      .agg(Tables.r6(sum(col("v")).cast("double") / count(lit(1))).as("c"))
      .groupBy("s", "code")
      .agg(expr("transform(sort_array(collect_list(struct(dim, c))), x -> x.c)").as("cv2"))
    // cent2/after are 8×16=128-row aggregates: broadcast-declared (r18)
    // — the planner was sort-merge-joining them against the corpus-sized
    // members frame (two SMJ + exchanges in the before-plan)
    val after = members.join(broadcast(cent2), Seq("s", "code"))
      .select(col("s"), col("code"),
        Tables.r6(zipFold(col("sv"), col("cv2"), (x, y) => (x - y) * (x - y)))
          .cast(DecimalType(18, 6)).as("a"))
      .groupBy("s", "code").agg(sum("a").as("sse_after"))
    members
      .select(col("s"), col("code"), Tables.r6(col("d2")).cast(DecimalType(18, 6)).as("b"))
      .groupBy("s", "code")
      .agg(count(lit(1)).as("n"), sum("b").as("sse_before"))
      .join(broadcast(after), Seq("s", "code"))
      .select(col("s"), col("code"), col("n"),
        col("sse_before").cast("double").as("sse_before"),
        col("sse_after").cast("double").as("sse_after"))
      .orderBy("s", "code")
  }

  /** q339: IVF-PQ search with asymmetric distance computation (ADC) —
    * the composition that is the actual point of q63 + q333 (Jégou et
    * al., TPAMI 2011 §IV): candidates come from the coarse cells
    * (IVF: probes scan their nprobe=2 nearest of the 16 cells), and the
    * distance to each candidate is computed WITHOUT touching its raw
    * vector — the probe precomputes a (subspace × centroid) distance
    * table (8×16 entries per probe) and a candidate's score is the sum
    * of the 8 table entries its PQ codes select. That is why PQ
    * compresses: search memory = codes + per-probe table, never the
    * corpus floats. Output: top-3 candidates per probe by ADC.
    *
    * Determinism: each table entry is a bit-identical double (in-order
    * 8-term fold), r6-quantized then DECIMAL-summed (§2.9 R1 — a
    * groupBy sum of raw doubles would be partition-order-sensitive);
    * ranking ties break on candidate id.
    *
    * Scale: the corpus appears ONLY as (vec_id, bucket) + 8 code rows —
    * the persisted index shape; probe tables are 128 tiny rows,
    * broadcast; the candidate join is an equi-join on the cell id and
    * the ADC fold is 8 rows per (probe, candidate). Nothing corpus-sized
    * shuffles, and raw candidate vectors are never read at query time. */
  private def q339(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val emb = Tables(spark, sfDir, "embeddings")
    val corpusCells = coarseCells(emb, emb, 1).select("vec_id", "bucket")
    val probeCells = coarseCells(emb, emb.filter(col("vec_id") < 10), 2)
      .select(col("vec_id").as("id_p"), col("bucket"))
    val codes = pqAssign(emb).select(col("vec_id").as("id_c"), col("s"), col("code"))
    val table = pqSubVecs(emb.filter(col("vec_id") < 10))
      .join(broadcast(pqCodebook(emb)), "s")
      .select(col("vec_id").as("id_p"), col("s"), col("code"),
        Tables.r6(zipFold(col("sv"), col("cv"), (x, y) => (x - y) * (x - y)))
          .cast(DecimalType(18, 6)).as("pd"))
    val wTop = Window.partitionBy("id_p").orderBy(col("adc"), col("id_c"))
    probeCells
      .join(corpusCells.select(col("vec_id").as("id_c"), col("bucket")), "bucket")
      .filter(col("id_p") =!= col("id_c"))
      .select("id_p", "id_c")
      .join(codes, "id_c")
      .join(broadcast(table), Seq("id_p", "s", "code"))
      .groupBy("id_p", "id_c")
      .agg(sum(col("pd")).cast("double").as("adc"))
      .withColumn("rn", row_number().over(wTop).cast("bigint"))
      .filter(col("rn") <= 3)
      .select(col("id_p"), col("id_c"), Tables.r6(col("adc")).as("adc"), col("rn"))
      .orderBy("id_p", "rn")
  }

  /** Shared DuckDB CTE prefix `bits → sig → banded`: regenerates the
    * q124 hyperplane signatures (Knuth-hash ±1 planes) and the 4×4-bit
    * band keys in SQL, bit-identically to [[hyperplaneSigFrame]]. Used
    * by the q283 oracle (q124/q279 predate the extraction and carry
    * inline copies of the same text). */
  private[operators] val hyperplaneCtesSql: String = {
    val sgn = "(CASE WHEN (((p * 64 + j) * 2654435761) % 1000003) % 2 = 0 THEN 1.0 ELSE -1.0 END)"
    val dotPlane =
      s"list_sum(list_transform(range(1, 65), j -> CAST(e.embedding[CAST(j AS INT)] AS DOUBLE) * $sgn))"
    "WITH bits AS (SELECT e.vec_id, p, " +
      s"CASE WHEN $dotPlane >= 0 THEN CAST(1 AS BIGINT) << CAST(p AS INT) ELSE CAST(0 AS BIGINT) END AS bit " +
      "FROM embeddings e CROSS JOIN range(0, 32) r(p)), " +
      "sig AS (SELECT vec_id, CAST(SUM(bit) AS BIGINT) AS sig FROM bits GROUP BY vec_id), " +
      "banded AS (SELECT vec_id, b, (sig >> CAST(b * 4 AS INT)) & 15 AS k " +
      "FROM sig CROSS JOIN range(0, 8) r(b))"
  }

  /** q283 contamination threshold: candidate cosines on this corpus top
    * out near 0.39 (q279's hard negatives), so 0.35 flags the closest
    * few pairs without drowning the report. */
  private val SemThresh = 0.35

  /** q283: semantic decontamination — the EMBEDDING-space complement of
    * q104's n-gram decontamination: paraphrased or re-worded benchmark
    * leakage shares no 5-gram but lands close in embedding space. Eval
    * probes (the q79 md5-bucket ≥ 90 tail over vec_id) are joined to
    * train vectors through the q124 hyperplane-LSH bands; candidates are
    * cosine-reranked, and each probe reports (n_cand, max_cos,
    * contaminated = max_cos ≥ 0.35). Probes with no band collision emit
    * n_cand = 0 / NULL max_cos — the audit covers every eval row.
    *
    * Scale: q124's candidate discipline (band equi-join, never
    * probe×corpus); the eval side is a 10% slice, and the per-probe
    * rollup is candidate-bounded. */
  private def q283(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val emb = Tables(spark, sfDir, "embeddings")
    val sigs = hyperplaneSigFrame(emb)
      .withColumn("h", md5(concat(lit("sdc:"), col("vec_id").cast("string"))))
      .withColumn("b100", CorpusOps.hexBucket(100))
      .transform(graft.plans.CorpusPin.pin) // read by both band-join sides + the probe list
    val banded = sigs.select(col("vec_id"), col("b100"), col("sig"),
        explode(sequence(lit(0), lit(NBands - 1))).as("b"))
      .select(col("vec_id"), col("b100"), col("b"),
        expr("shiftright(sig, cast(b * 4 as int)) & 15").as("k"))
    val cand = multiProbe(banded.filter(col("b100") >= 90))
      .select(col("vec_id").as("id_p"), col("b"), col("k"))
      .join(banded.filter(col("b100") < 90)
        .select(col("vec_id").as("id_c"), col("b"), col("k")), Seq("b", "k"))
      .select("id_p", "id_c").distinct()
    val scored = cand
      .join(emb.select(col("vec_id").as("id_p"), col("embedding").as("ep"),
        sqrt(dotCol("embedding", "embedding")).as("np")), "id_p")
      .join(emb.select(col("vec_id").as("id_c"), col("embedding").as("ec"),
        sqrt(dotCol("embedding", "embedding")).as("nc")), "id_c")
      .select(col("id_p"),
        Tables.r6(dotCol("ep", "ec") / (col("np") * col("nc"))).as("cos"))
    val per = scored.groupBy("id_p")
      .agg(count(lit(1)).as("n_cand"), max("cos").as("max_cos"))
    sigs.filter(col("b100") >= 90).select("vec_id")
      .join(per.withColumnRenamed("id_p", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        col("max_cos"),
        coalesce(col("max_cos") >= SemThresh, lit(false)).as("contaminated"))
      .orderBy("vec_id")
  }

  /** q285: dedup-threshold sensitivity sweep — the tuning curve behind
    * every near-dup threshold decision: for Jaccard cut-offs 0.5–0.9,
    * how many candidate pairs survive and how many documents would be
    * dropped (the higher doc_id of each surviving pair — q49's keep-min
    * convention). Reading the knee of this curve is how a pipeline picks
    * its threshold; computing it costs ONE candidate-generation pass.
    *
    * Scale: the expensive part (q61's df-capped inverted-index
    * candidates + exact scores) runs ONCE and is checkpointed
    * (candidate-bounded, not corpus-bounded); the 5-threshold grid then
    * sweeps the bounded pair frame. */
  private def q285(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir, "documents")
    val (inter, sizes) = sharedPairFrames(spark, sfDir)
    val jac = inter
      .join(sizes.toDF("ia", "na"), "ia")
      .join(sizes.toDF("ib", "nb"), "ib")
      .select(col("ib"),
        Tables.r6(col("inter") / (col("na") + col("nb") - col("inter"))).as("j"))
      .transform(graft.plans.CorpusPin.pin) // candidate-bounded; swept 5× by the grid
    val nd = docs.agg(count(lit(1)).as("n_docs"))
    val grid = spark.range(5, 10).select((col("id") * 10).as("thr"))
    val perThr = grid.join(jac, col("j") >= col("thr") / lit(100.0))
      .groupBy("thr")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("ib")).as("n_docs_dropped"))
    grid.join(perThr, Seq("thr"), "left").crossJoin(broadcast(nd))
      .select(col("thr"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs_dropped"), lit(0L)).as("n_docs_dropped"),
        Tables.r6(coalesce(col("n_docs_dropped"), lit(0L)) /
          col("n_docs").cast("double")).as("drop_rate"))
      .orderBy("thr")
  }

  val entries: Seq[Q] = Seq(
    Q("q240_entity_resolution", q240 _, Some(
      "WITH RECURSIVE nid AS (SELECT p_name, MIN(p_partkey) AS nid " +
        "FROM part GROUP BY p_name), " +
        "bk AS (SELECT p_name, 'f:' || str_split(p_name, ' ')[1] AS blk FROM nid " +
        "UNION ALL SELECT p_name, 'l:' || str_split(p_name, ' ')[-1] FROM nid), " +
        "b AS (SELECT bk.p_name, nid.nid, bk.blk FROM bk JOIN nid USING (p_name)), " +
        "e AS (SELECT DISTINCT a.nid AS ida, c.nid AS idb FROM b a JOIN b c " +
        "ON a.blk = c.blk AND a.nid < c.nid " +
        s"WHERE ${Tables.r6sql("jaro_winkler_similarity(a.p_name, c.p_name)")} >= $ErJwThresh), " +
        "sym AS (SELECT ida AS a, idb AS bb FROM e UNION ALL SELECT idb, ida FROM e), " +
        "comp(id, lbl) AS (SELECT nid, nid FROM nid " +
        "UNION SELECT s.bb, c.lbl FROM comp c JOIN sym s ON s.a = c.id), " +
        "ent AS (SELECT id, MIN(lbl) AS entity FROM comp GROUP BY id), " +
        "labeled AS (SELECT p.p_partkey, p.p_name, ent.entity " +
        "FROM part p JOIN nid USING (p_name) JOIN ent ON nid.nid = ent.id), " +
        "sizes AS (SELECT entity, COUNT(*) AS n_members FROM labeled GROUP BY entity) " +
        "SELECT p_partkey, p_name, entity, n_members FROM labeled " +
        "JOIN sizes USING (entity) ORDER BY p_partkey")),
    Q("q60_dedup_simhash", q60 _, Some(
      simhashSql + " SELECT doc_id, simhash FROM sh ORDER BY doc_id")),
    Q("q83_dedup_simhash_pairs", q83 _, Some(
      simhashSql + ", " +
        "banded AS (SELECT doc_id, simhash, b, (simhash >> CAST(b * 8 AS INT)) & 255 AS k " +
        "FROM sh CROSS JOIN range(0, 4) r(b)), " +
        "cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib, a.simhash AS sa, b.simhash AS sb " +
        "FROM banded a JOIN banded b ON a.b = b.b AND a.k = b.k AND a.doc_id < b.doc_id) " +
        "SELECT ia, ib, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming FROM cand " +
        "WHERE bit_count(xor(sa, sb)) <= 3 ORDER BY ia, ib")),
    Q("q61_dedup_ngram_jaccard", q61 _, Some(
      pairCtesSql +
        "SELECT ia, ib, inter, " +
        Tables.r6sql("inter / (sa.n + sb.n - inter)") + " AS jaccard " +
        "FROM pairs JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id " +
        "WHERE inter >= 3 ORDER BY ia, ib")),
    Q("q185_dedup_containment", q185 _, Some(
      pairCtesSql +
        "SELECT ia, ib, inter, cont_a, cont_b FROM (" +
        "SELECT ia, ib, inter, " +
        Tables.r6sql("inter / sa.n") + " AS cont_a, " +
        Tables.r6sql("inter / sb.n") + " AS cont_b " +
        "FROM pairs JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id " +
        "WHERE inter >= 3) WHERE greatest(cont_a, cont_b) >= 0.5 ORDER BY ia, ib")),
    // exact-join oracle: the prefix filter is a plan device, not a
    // semantic one — the uncapped inverted-index join states the same
    // set (see q269's doc)
    Q("q269_dedup_similarity_join", q269 _, Some(
      "WITH split AS (SELECT doc_id, str_split(text, ' ') AS ts FROM documents WHERE len(str_split(text, ' ')) >= 3), " +
        "tg AS (SELECT DISTINCT doc_id, g FROM (SELECT doc_id, " +
        "unnest(list_transform(range(1, len(ts) - 1), i -> " +
        "ts[CAST(i AS INT)] || ' ' || ts[CAST(i + 1 AS INT)] || ' ' || ts[CAST(i + 2 AS INT)])) AS g FROM split)), " +
        "sizes AS (SELECT doc_id, COUNT(*) AS n FROM tg GROUP BY doc_id), " +
        "pairs AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter " +
        "FROM tg a JOIN tg b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
        "SELECT ia, ib, inter, jaccard FROM (SELECT ia, ib, inter, " +
        Tables.r6sql("inter / (sa.n + sb.n - inter)") + " AS jaccard " +
        "FROM pairs JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id) " +
        "WHERE jaccard >= 0.6 ORDER BY ia, ib")),
    Q("q270_dedup_span_audit", q270 _, Some(
      "WITH base AS (SELECT doc_id, CAST(len(str_split(text, ' ')) AS BIGINT) AS nt, " +
        "str_split(text, ' ') AS ts FROM documents), " +
        "gr AS (SELECT doc_id, nt, u.pos AS pos, u.g AS g FROM (" +
        "SELECT doc_id, nt, unnest(list_transform(range(0, nt - 7), i -> " +
        "struct_pack(pos := i, g := array_to_string(" +
        "list_slice(ts, CAST(i + 1 AS INT), CAST(i + 8 AS INT)), ' ')))) AS u " +
        "FROM base WHERE nt >= 8)), " +
        "sh AS (SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS dfc " +
        "FROM gr GROUP BY g) WHERE dfc >= 2), " +
        "m AS (SELECT doc_id, pos FROM gr WHERE g IN (SELECT g FROM sh)), " +
        "i1 AS (SELECT doc_id, pos, CASE WHEN pos > COALESCE(LAG(pos) OVER " +
        "(PARTITION BY doc_id ORDER BY pos), -16) + 8 THEN 1 ELSE 0 END AS brk FROM m), " +
        "i2 AS (SELECT doc_id, pos, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos " +
        "ROWS UNBOUNDED PRECEDING) AS isl FROM i1), " +
        "i3 AS (SELECT doc_id, isl, MAX(pos) - MIN(pos) + 8 AS len FROM i2 GROUP BY 1, 2), " +
        "ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans, " +
        "CAST(SUM(len) AS BIGINT) AS dup_tokens FROM i3 GROUP BY 1) " +
        "SELECT b.doc_id, b.nt AS n_tokens, " +
        "COALESCE(a.n_spans, 0) AS n_spans, " +
        "CAST(COALESCE(a.dup_tokens, 0) AS BIGINT) AS dup_tokens, " +
        Tables.r6sql("COALESCE(a.dup_tokens, 0) / b.nt") + " AS dup_fraction " +
        "FROM base b LEFT JOIN ag a USING (doc_id) ORDER BY doc_id")),
    Q("q272_dedup_source_matrix", q272 _, Some(
      pairCtesSql +
        ", j AS (SELECT ia, ib, " +
        Tables.r6sql("inter / (sa.n + sb.n - inter)") + " AS jaccard " +
        "FROM pairs JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id " +
        "WHERE inter >= 3), " +
        "lab AS (SELECT least(da.source, db.source) AS source_a, " +
        "greatest(da.source, db.source) AS source_b, jaccard " +
        "FROM j JOIN documents da ON j.ia = da.doc_id " +
        "JOIN documents db ON j.ib = db.doc_id) " +
        "SELECT source_a, source_b, COUNT(*) AS n_pairs, " +
        Tables.meanDSql("SUM(CAST(jaccard AS DECIMAL(18,6)))", "COUNT(*)") +
        " AS avg_jaccard " +
        "FROM lab GROUP BY 1, 2 ORDER BY 1, 2")),
    Q("q62_dedup_embedding", q62 _, Some(
      "SELECT * FROM (SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        Tables.r6sql(s"${dotSql("a", "b")} / (sqrt(${dotSql("a", "a")}) * sqrt(${dotSql("b", "b")}))") +
        " AS cos FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id) " +
        "WHERE cos >= 0.3 ORDER BY id_a, id_b")),
    Q("q63_ann_ivf", q63 _, Some {
      val dotPC = "list_sum(list_transform(range(1,65), i -> CAST(p.ep[i] AS DOUBLE) * c.ca[CAST(i AS INT)]))"
      val d2 = "list_sum(list_transform(range(1,65), i -> (CAST(p.ep[i] AS DOUBLE) - c.ca[CAST(i AS INT)]) * (CAST(p.ep[i] AS DOUBLE) - c.ca[CAST(i AS INT)])))"
      val dotPE = "list_sum(list_transform(range(1,65), i -> CAST(s.ep[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))"
      val nP = "sqrt(list_sum(list_transform(range(1,65), i -> CAST(s.ep[i] AS DOUBLE) * CAST(s.ep[i] AS DOUBLE))))"
      val nE = "sqrt(list_sum(list_transform(range(1,65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))"
      "WITH pe0 AS (SELECT label, unnest(range(1, 65)) AS pos, unnest(embedding) AS v0 FROM embeddings), " +
        "pe AS (SELECT label, pos, CAST(CAST(v0 AS DOUBLE) AS DECIMAL(18,9)) AS v FROM pe0), " +
        "cent AS (SELECT label, pos, " + Tables.r6sql("CAST(SUM(v) AS DOUBLE) / COUNT(*)") + " AS c " +
        "FROM pe GROUP BY label, pos), " +
        "centarr AS (SELECT label, list(c ORDER BY pos) AS ca FROM cent GROUP BY label), " +
        "probes AS (SELECT vec_id AS id_p, embedding AS ep FROM embeddings WHERE vec_id < 10), " +
        "cells AS (SELECT id_p, ep, label FROM (SELECT p.id_p, p.ep, c.label, " +
        "ROW_NUMBER() OVER (PARTITION BY p.id_p ORDER BY " + Tables.r6sql(d2) + ", c.label) AS cr " +
        "FROM probes p CROSS JOIN centarr c) WHERE cr <= 2) " +
        "SELECT id_p, id_c, cos, rn FROM (SELECT s.id_p, e.vec_id AS id_c, " +
        Tables.r6sql(s"$dotPE / ($nP * $nE)") + " AS cos, " +
        "ROW_NUMBER() OVER (PARTITION BY s.id_p ORDER BY " +
        Tables.r6sql(s"$dotPE / ($nP * $nE)") + " DESC, e.vec_id) AS rn " +
        "FROM cells s JOIN embeddings e ON s.label = e.label AND s.id_p <> e.vec_id) " +
        "WHERE rn <= 3 ORDER BY id_p, rn"
    }),
    // q314 answers q124's exact query from the persisted index, so both
    // compare against the SAME recompute-from-scratch oracle — the
    // layout must change where the work happens, never the answer
    Q("q319_sorted_neighborhood", q319 _, Some(q319Sql)),
    Q("q314_ann_index_layout", q314 _, Some(annTop3OracleSql)),
    // the oracle rebuilds the FINAL index from scratch (full banding in
    // SQL, filtered to the post-delete id set) — hash-equality against
    // same in-order double fold per (vector, subspace, centroid); the
    // codebook is re-derived from the same 16 seed rows
    Q("q333_ann_pq", q333 _, Some(
      "WITH sv AS (SELECT vec_id, s, list_transform(range(1, 9), d -> " +
        "CAST(embedding[CAST(s * 8 + d AS INT)] AS DOUBLE)) AS v " +
        "FROM embeddings CROSS JOIN range(0, 8) rs(s)), " +
        "cent AS (SELECT vec_id AS code, s, v AS cv FROM sv WHERE vec_id < 16), " +
        "d AS (SELECT sv.vec_id, sv.s, c.code, " +
        "list_sum(list_transform(range(1, 9), i -> " +
        "(sv.v[CAST(i AS INT)] - c.cv[CAST(i AS INT)]) * " +
        "(sv.v[CAST(i AS INT)] - c.cv[CAST(i AS INT)]))) AS d2 " +
        "FROM sv JOIN cent c ON sv.s = c.s) " +
        "SELECT vec_id, s AS sub, code, " + Tables.r6sql("d2") + " AS err " +
        "FROM (SELECT vec_id, s, code, d2, ROW_NUMBER() OVER " +
        "(PARTITION BY vec_id, s ORDER BY d2, code) AS rn FROM d) " +
        "WHERE rn = 1 ORDER BY vec_id, sub")),
    // Spark's incrementally maintained layout is the strongest possible
    // check that the delta path loses/duplicates nothing
    Q("q325_ann_index_upsert", q325 _, Some(
      hyperplaneCtesSql + ", " +
        "final AS (SELECT vec_id, b, k FROM banded WHERE vec_id % 6 <> 0) " +
        "SELECT b, COUNT(*) AS n_entries, COUNT(DISTINCT vec_id) AS n_vectors, " +
        "CAST(SUM(CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR) || ':' || " +
        "CAST(b AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 8)) AS BIGINT)) AS BIGINT) AS checksum " +
        "FROM final GROUP BY b ORDER BY b")),
    // same hex-slice pixel math as the Spark side, re-derived from the
    // same blob bytes (q95's cross-engine decode pattern)
    Q("q326_image_phash_dedup", q326 _, Some(
      "WITH bl AS (SELECT regexp_extract(filename, '[^/]+$') AS img, hex(content) AS hx " +
        s"FROM read_blob('${graft.operators.Scans.imageFixture}/*.bmp')), " +
        "sums AS (SELECT img, bi, list_sum(list_transform(range(0, 12), i -> " +
        "CAST(('0x' || substr(hx, CAST((54 + (15 - ((bi // 8) * 2 + (i // 3) // 2)) * 48 + " +
        "((bi % 8) * 2 + (i // 3) % 2) * 3 + i % 3) * 2 + 1 AS INT), 2)) AS BIGINT))) AS s " +
        "FROM bl CROSS JOIN range(0, 64) rb(bi)), " +
        "tot AS (SELECT img, SUM(s) AS total FROM sums GROUP BY img), " +
        "hsh AS (SELECT s.img, " +
        "CAST(SUM(CASE WHEN s.bi < 32 AND s.s * 64 > t.total THEN CAST(1 AS BIGINT) << CAST(s.bi AS INT) ELSE 0 END) AS BIGINT) AS lo, " +
        "CAST(SUM(CASE WHEN s.bi >= 32 AND s.s * 64 > t.total THEN CAST(1 AS BIGINT) << CAST(s.bi - 32 AS INT) ELSE 0 END) AS BIGINT) AS hi " +
        "FROM sums s JOIN tot t USING (img) GROUP BY s.img), " +
        "banded AS (SELECT img, lo, hi, b, CASE WHEN b < 4 THEN (lo >> CAST(b * 8 AS INT)) & 255 " +
        "ELSE (hi >> CAST((b - 4) * 8 AS INT)) & 255 END AS k FROM hsh CROSS JOIN range(0, 8) rb(b)) " +
        "SELECT img_a, img_b, CAST(bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) AS BIGINT) AS hamming " +
        "FROM (SELECT DISTINCT l.img AS img_a, r.img AS img_b, l.lo AS la, r.lo AS lb, l.hi AS ha, r.hi AS hb " +
        "FROM banded l JOIN banded r ON l.b = r.b AND l.k = r.k AND l.img < r.img) p " +
        "WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) <= 6 " +
        "ORDER BY img_a, img_b")),
    // q326's energy-envelope hash on WAV bytes: same two's-complement
    // decode as the q328 oracle, same band join as the q326 oracle
    Q("q334_audio_dup", q334 _, Some {
      val raw = "(CAST(('0x' || substr(hx, CAST((44 + (bi * 12 + i) * 2) * 2 + 1 AS INT), 2)) AS BIGINT) + " +
        "256 * CAST(('0x' || substr(hx, CAST((44 + (bi * 12 + i) * 2) * 2 + 3 AS INT), 2)) AS BIGINT))"
      "WITH bw AS (SELECT regexp_extract(filename, '[^/]+$') AS fname, hex(content) AS hx " +
        s"FROM read_blob('${graft.operators.Scans.audioDupFixture}/*.wav')), " +
        "sums AS (SELECT fname, bi, list_sum(list_transform(range(0, 12), i -> " +
        s"abs(CASE WHEN $raw >= 32768 THEN $raw - 65536 ELSE $raw END))) AS s " +
        "FROM bw CROSS JOIN range(0, 64) rb(bi)), " +
        "tot AS (SELECT fname, SUM(s) AS total FROM sums GROUP BY fname), " +
        "hsh AS (SELECT s.fname, " +
        "CAST(SUM(CASE WHEN s.bi < 32 AND s.s * 64 > t.total THEN CAST(1 AS BIGINT) << CAST(s.bi AS INT) ELSE 0 END) AS BIGINT) AS lo, " +
        "CAST(SUM(CASE WHEN s.bi >= 32 AND s.s * 64 > t.total THEN CAST(1 AS BIGINT) << CAST(s.bi - 32 AS INT) ELSE 0 END) AS BIGINT) AS hi " +
        "FROM sums s JOIN tot t USING (fname) GROUP BY s.fname), " +
        "banded AS (SELECT fname, lo, hi, b, CASE WHEN b < 4 THEN (lo >> CAST(b * 8 AS INT)) & 255 " +
        "ELSE (hi >> CAST((b - 4) * 8 AS INT)) & 255 END AS k FROM hsh CROSS JOIN range(0, 8) rb(b)) " +
        "SELECT fname_a, fname_b, CAST(bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) AS BIGINT) AS hamming " +
        "FROM (SELECT DISTINCT l.fname AS fname_a, r.fname AS fname_b, l.lo AS la, r.lo AS lb, l.hi AS ha, r.hi AS hb " +
        "FROM banded l JOIN banded r ON l.b = r.b AND l.k = r.k AND l.fname < r.fname) p " +
        "WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) <= 6 " +
        "ORDER BY fname_a, fname_b"
    }),
    // q333's coarse assignment + q62's thresholded cosine, composed:
    // lower-id-wins representative via one grouped MIN over the
    // bucket-bounded pair join
    Q("q336_semdedup", q336 _, Some {
      val l2 = "list_sum(list_transform(range(1, 65), i -> " +
        "(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) - CAST(c.cv[CAST(i AS INT)] AS DOUBLE)) * " +
        "(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) - CAST(c.cv[CAST(i AS INT)] AS DOUBLE))))"
      "WITH cent AS (SELECT vec_id AS code, embedding AS cv FROM embeddings WHERE vec_id < 16), " +
        s"d AS (SELECT e.vec_id, c.code, $l2 AS d2 FROM embeddings e CROSS JOIN cent c), " +
        "a AS (SELECT vec_id, code AS bucket FROM (SELECT vec_id, code, " +
        "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, code) AS rn FROM d) WHERE rn = 1), " +
        "p AS (SELECT y.vec_id AS idb, MIN(x.vec_id) AS rep0 " +
        "FROM a ax JOIN embeddings x ON ax.vec_id = x.vec_id " +
        "JOIN a ay ON ax.bucket = ay.bucket JOIN embeddings y ON ay.vec_id = y.vec_id " +
        "WHERE x.vec_id < y.vec_id AND " +
        Tables.r6sql(s"${dotSql("x", "y")} / (sqrt(${dotSql("x", "x")}) * sqrt(${dotSql("y", "y")}))") +
        " >= 0.3 GROUP BY y.vec_id) " +
        "SELECT a.vec_id, a.bucket, COALESCE(p.rep0, a.vec_id) AS rep, " +
        "p.rep0 IS NULL AS keep FROM a LEFT JOIN p ON a.vec_id = p.idb ORDER BY a.vec_id"
    }),
    // the q333 codes + q336 cells CTEs composed; per-entry r6 → DECIMAL
    // sum (§2.9 R1), rank ties on candidate id
    Q("q339_ann_ivf_pq", q339 _, Some {
      val subL2 = "list_sum(list_transform(range(1, 9), i -> " +
        "(sv.v[CAST(i AS INT)] - c.cv[CAST(i AS INT)]) * " +
        "(sv.v[CAST(i AS INT)] - c.cv[CAST(i AS INT)])))"
      val fullL2 = "list_sum(list_transform(range(1, 65), i -> " +
        "(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) - CAST(c.cv[CAST(i AS INT)] AS DOUBLE)) * " +
        "(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) - CAST(c.cv[CAST(i AS INT)] AS DOUBLE))))"
      "WITH sv AS (SELECT vec_id, s, list_transform(range(1, 9), d -> " +
        "CAST(embedding[CAST(s * 8 + d AS INT)] AS DOUBLE)) AS v " +
        "FROM embeddings CROSS JOIN range(0, 8) rs(s)), " +
        "cent AS (SELECT vec_id AS code, s, v AS cv FROM sv WHERE vec_id < 16), " +
        s"d AS (SELECT sv.vec_id, sv.s, c.code, $subL2 AS d2 FROM sv JOIN cent c ON sv.s = c.s), " +
        "codes AS (SELECT vec_id AS id_c, s, code FROM (SELECT vec_id, s, code, " +
        "ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, code) AS rn FROM d) WHERE rn = 1), " +
        "fcent AS (SELECT vec_id AS code, embedding AS cv FROM embeddings WHERE vec_id < 16), " +
        s"fd AS (SELECT e.vec_id, c.code, $fullL2 AS d2 FROM embeddings e CROSS JOIN fcent c), " +
        "fr AS (SELECT vec_id, code AS bucket, ROW_NUMBER() OVER " +
        "(PARTITION BY vec_id ORDER BY d2, code) AS rn FROM fd), " +
        "cells AS (SELECT vec_id, bucket FROM fr WHERE rn = 1), " +
        "pcells AS (SELECT vec_id AS id_p, bucket FROM fr WHERE vec_id < 10 AND rn <= 2), " +
        "tbl AS (SELECT sv.vec_id AS id_p, sv.s, c.code, " +
        s"CAST(${Tables.r6sql(subL2)} AS DECIMAL(18,6)) AS pd " +
        "FROM sv JOIN cent c ON sv.s = c.s WHERE sv.vec_id < 10), " +
        "cand AS (SELECT p.id_p, c.vec_id AS id_c FROM pcells p " +
        "JOIN cells c ON p.bucket = c.bucket WHERE c.vec_id <> p.id_p), " +
        "adc AS (SELECT cand.id_p, cand.id_c, CAST(SUM(t.pd) AS DOUBLE) AS adc " +
        "FROM cand JOIN codes ON cand.id_c = codes.id_c " +
        "JOIN tbl t ON t.id_p = cand.id_p AND t.s = codes.s AND t.code = codes.code " +
        "GROUP BY 1, 2) " +
        "SELECT id_p, id_c, " + Tables.r6sql("adc") + " AS adc, rn FROM (" +
        "SELECT id_p, id_c, adc, ROW_NUMBER() OVER (PARTITION BY id_p ORDER BY adc, id_c) AS rn " +
        "FROM adc) WHERE rn <= 3 ORDER BY id_p, rn"
    }),
    // q333's assignment re-fed through exact DECIMAL means; both SSE
    // folds r6-per-term then DECIMAL-summed
    Q("q340_pq_lloyd_step", q340 _, Some {
      val subL2 = "list_sum(list_transform(range(1, 9), i -> " +
        "(sv.v[CAST(i AS INT)] - c.cv[CAST(i AS INT)]) * " +
        "(sv.v[CAST(i AS INT)] - c.cv[CAST(i AS INT)])))"
      val memL2new = "list_sum(list_transform(range(1, 9), i -> " +
        "(m.v[CAST(i AS INT)] - c2.cv2[CAST(i AS INT)]) * " +
        "(m.v[CAST(i AS INT)] - c2.cv2[CAST(i AS INT)])))"
      "WITH sv AS (SELECT vec_id, s, list_transform(range(1, 9), d -> " +
        "CAST(embedding[CAST(s * 8 + d AS INT)] AS DOUBLE)) AS v " +
        "FROM embeddings CROSS JOIN range(0, 8) rs(s)), " +
        "cent AS (SELECT vec_id AS code, s, v AS cv FROM sv WHERE vec_id < 16), " +
        s"d AS (SELECT sv.vec_id, sv.s, c.code, $subL2 AS d2 FROM sv JOIN cent c ON sv.s = c.s), " +
        "asg AS (SELECT vec_id, s, code, d2 FROM (SELECT vec_id, s, code, d2, " +
        "ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, code) AS rn FROM d) WHERE rn = 1), " +
        "mem AS (SELECT a.vec_id, a.s, a.code, a.d2, sv.v FROM asg a " +
        "JOIN sv ON a.vec_id = sv.vec_id AND a.s = sv.s), " +
        "dims AS (SELECT s, code, dim, CAST(v[CAST(dim AS INT)] AS DECIMAL(18,9)) AS val " +
        "FROM mem CROSS JOIN range(1, 9) rd(dim)), " +
        "cent2 AS (SELECT s, code, list(c ORDER BY dim) AS cv2 FROM (" +
        "SELECT s, code, dim, " + Tables.r6sql("CAST(SUM(val) AS DOUBLE) / COUNT(*)") + " AS c " +
        "FROM dims GROUP BY 1, 2, 3) GROUP BY 1, 2), " +
        "aft AS (SELECT m.s, m.code, SUM(CAST(" + Tables.r6sql(memL2new) +
        " AS DECIMAL(18,6))) AS sse_after FROM mem m " +
        "JOIN cent2 c2 ON m.s = c2.s AND m.code = c2.code GROUP BY 1, 2), " +
        "bef AS (SELECT s, code, COUNT(*) AS n, SUM(CAST(" + Tables.r6sql("d2") +
        " AS DECIMAL(18,6))) AS sse_before FROM mem GROUP BY 1, 2) " +
        "SELECT bef.s, bef.code, bef.n, CAST(bef.sse_before AS DOUBLE) AS sse_before, " +
        "CAST(aft.sse_after AS DOUBLE) AS sse_after " +
        "FROM bef JOIN aft ON bef.s = aft.s AND bef.code = aft.code " +
        "ORDER BY bef.s, bef.code"
    }),
    Q("q124_ann_hyperplane", q124 _, Some(annTop3OracleSql)),
  ) ++ legacyEntries

  /** The q124/q314 oracle: hyperplane signatures + multi-probe banding +
    * exact cosine rerank, all regenerated from scratch in DuckDB. */
  private lazy val annTop3OracleSql: String = {
      // the same Knuth-hash ±1 planes, regenerated inline: sign(p, j) for
      // the j-th (1-based) component of plane p
      val sgn = "(CASE WHEN (((p * 64 + j) * 2654435761) % 1000003) % 2 = 0 THEN 1.0 ELSE -1.0 END)"
      val dotPlane =
        s"list_sum(list_transform(range(1, 65), j -> CAST(e.embedding[CAST(j AS INT)] AS DOUBLE) * $sgn))"
      val dotPQ = "list_sum(list_transform(range(1,65), i -> CAST(pv.embedding[i] AS DOUBLE) * CAST(cv.embedding[i] AS DOUBLE)))"
      val nP = "sqrt(list_sum(list_transform(range(1,65), i -> CAST(pv.embedding[i] AS DOUBLE) * CAST(pv.embedding[i] AS DOUBLE))))"
      val nC = "sqrt(list_sum(list_transform(range(1,65), i -> CAST(cv.embedding[i] AS DOUBLE) * CAST(cv.embedding[i] AS DOUBLE))))"
      "WITH bits AS (SELECT e.vec_id, p, " +
        s"CASE WHEN $dotPlane >= 0 THEN CAST(1 AS BIGINT) << CAST(p AS INT) ELSE CAST(0 AS BIGINT) END AS bit " +
        "FROM embeddings e CROSS JOIN range(0, 32) r(p)), " +
        "sig AS (SELECT vec_id, CAST(SUM(bit) AS BIGINT) AS sig FROM bits GROUP BY vec_id), " +
        "banded AS (SELECT vec_id, b, (sig >> CAST(b * 4 AS INT)) & 15 AS k " +
        "FROM sig CROSS JOIN range(0, 8) r(b)), " +
        "cand AS (SELECT DISTINCT a.vec_id AS id_p, c.vec_id AS id_c FROM " +
        multiProbeSql("banded") + " a " +
        "JOIN banded c ON a.b = c.b AND a.k = c.k " +
        "WHERE a.vec_id < 10 AND c.vec_id <> a.vec_id) " +
        "SELECT id_p, id_c, cos, rn FROM (SELECT cand.id_p, cand.id_c, " +
        Tables.r6sql(s"$dotPQ / ($nP * $nC)") + " AS cos, " +
        "ROW_NUMBER() OVER (PARTITION BY cand.id_p ORDER BY " +
        Tables.r6sql(s"$dotPQ / ($nP * $nC)") + " DESC, cand.id_c) AS rn " +
        "FROM cand JOIN embeddings pv ON cand.id_p = pv.vec_id " +
        "JOIN embeddings cv ON cand.id_c = cv.vec_id) " +
        "WHERE rn <= 3 ORDER BY id_p, rn"
  }

  // lazy: referenced from `entries` above its definition point — a plain
  // val would still be null during the object's initializer
  private lazy val legacyEntries: Seq[Q] = Seq(
    Q("q181_ingest_dedup", q181 _, Some(
      simhashSql + ", " +
        "banded AS (SELECT doc_id, simhash, b, (simhash >> CAST(b * 8 AS INT)) & 255 AS k " +
        "FROM sh CROSS JOIN range(0, 4) r(b)), " +
        "eh AS (SELECT DISTINCT b.doc_id FROM documents b JOIN documents i " +
        "ON b.doc_id % 2 = 1 AND i.doc_id % 2 = 0 AND md5(b.text) = md5(i.text)), " +
        "nh AS (SELECT DISTINCT b1.doc_id FROM banded b1 JOIN banded b2 " +
        "ON b1.b = b2.b AND b1.k = b2.k AND b1.doc_id % 2 = 1 AND b2.doc_id % 2 = 0 " +
        "WHERE bit_count(xor(b1.simhash, b2.simhash)) <= 3) " +
        "SELECT d.doc_id, eh.doc_id IS NOT NULL AS dropped_exact, " +
        "nh.doc_id IS NOT NULL AS dropped_near, " +
        "(eh.doc_id IS NULL AND nh.doc_id IS NULL) AS kept " +
        "FROM documents d LEFT JOIN eh ON d.doc_id = eh.doc_id " +
        "LEFT JOIN nh ON d.doc_id = nh.doc_id " +
        "WHERE d.doc_id % 2 = 1 ORDER BY d.doc_id")),
    Q("q283_semantic_decontam", q283 _, Some {
      val dotPQ = "list_sum(list_transform(range(1,65), i -> CAST(pv.embedding[i] AS DOUBLE) * CAST(cv.embedding[i] AS DOUBLE)))"
      val nP = "sqrt(list_sum(list_transform(range(1,65), i -> CAST(pv.embedding[i] AS DOUBLE) * CAST(pv.embedding[i] AS DOUBLE))))"
      val nC = "sqrt(list_sum(list_transform(range(1,65), i -> CAST(cv.embedding[i] AS DOUBLE) * CAST(cv.embedding[i] AS DOUBLE))))"
      hyperplaneCtesSql + ", " +
        "bk AS (SELECT vec_id, " +
        CorpusOps.hexBucketSql(100, "md5('sdc:' || CAST(vec_id AS VARCHAR))") +
        " AS b100 FROM embeddings), " +
        "cand AS (SELECT DISTINCT a.vec_id AS id_p, c.vec_id AS id_c " +
        "FROM " + multiProbeSql("banded") + " a JOIN bk pa ON a.vec_id = pa.vec_id " +
        "JOIN banded c ON a.b = c.b AND a.k = c.k " +
        "JOIN bk pc ON c.vec_id = pc.vec_id " +
        "WHERE pa.b100 >= 90 AND pc.b100 < 90), " +
        "sc AS (SELECT id_p, " + Tables.r6sql(s"$dotPQ / ($nP * $nC)") + " AS cos " +
        "FROM cand JOIN embeddings pv ON id_p = pv.vec_id " +
        "JOIN embeddings cv ON id_c = cv.vec_id), " +
        "per AS (SELECT id_p, CAST(COUNT(*) AS BIGINT) AS n_cand, " +
        "MAX(cos) AS max_cos FROM sc GROUP BY id_p) " +
        "SELECT bk.vec_id, COALESCE(n_cand, 0) AS n_cand, max_cos, " +
        s"COALESCE(max_cos >= $SemThresh, false) AS contaminated " +
        "FROM bk LEFT JOIN per ON bk.vec_id = per.id_p " +
        "WHERE b100 >= 90 ORDER BY vec_id"
    }),
    Q("q309_blocking_quality", q309 _, Some(
      "WITH names AS (SELECT DISTINCT p_name FROM part), " +
        "truth AS (SELECT a.p_name AS na, b.p_name AS nb FROM names a " +
        "JOIN names b ON a.p_name < b.p_name " +
        s"WHERE ${Tables.r6sql("jaro_winkler_similarity(a.p_name, b.p_name)")} >= $ErJwThresh), " +
        "bk AS (" + erBlockKeysSql("names", "p_name") + "), " +
        "blocked AS (SELECT DISTINCT a.p_name AS na, b.p_name AS nb " +
        "FROM bk a JOIN bk b ON a.blk = b.blk AND a.p_name < b.p_name), " +
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_names FROM names), " +
        "nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true FROM truth), " +
        "nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM blocked), " +
        "nf AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_found FROM truth " +
        "JOIN blocked USING (na, nb)) " +
        "SELECT n_true, n_candidates, n_found, " +
        Tables.meanDSql("n_found", "n_true") + " AS recall, " +
        Tables.r6sql("1.0 - CAST(n_candidates AS DOUBLE) / " +
          "(n_names * (n_names - 1) / 2)") + " AS reduction " +
        "FROM nn CROSS JOIN nt CROSS JOIN nb CROSS JOIN nf")),
    Q("q302_jl_projection", q302 _, Some {
      def dotE(x: String, y: String) =
        s"list_sum(list_transform(range(1, 65), i -> " +
          s"CAST($x.embedding[CAST(i AS INT)] AS DOUBLE) * CAST($y.embedding[CAST(i AS INT)] AS DOUBLE)))"
      def zCol(p: Int) = {
        val sgn = s"(CASE WHEN (((${p} * 64 + j) * 2654435761) % 1000003) % 2 = 0 " +
          "THEN 1.0 ELSE -1.0 END)"
        Tables.r6sql("list_sum(list_transform(range(1, 65), j -> " +
          s"CAST(e.embedding[CAST(j AS INT)] AS DOUBLE) * $sgn)) / 4.0") + s" AS z$p"
      }
      val d16 = (0 until JlDims).map(p =>
        s"(a.z$p - b.z$p) * (a.z$p - b.z$p)").mkString(" + ")
      val d64 = Tables.r6sql(dotE("pa", "pa")) + " + " + Tables.r6sql(dotE("pb", "pb")) +
        " - 2.0 * " + Tables.r6sql(dotE("pa", "pb"))
      "WITH proj AS (SELECT vec_id, " +
        (0 until JlDims).map(zCol).mkString(", ") +
        " FROM embeddings e WHERE vec_id < 10), " +
        "d AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        Tables.r6sql(s"sqrt($d64)") + " AS d_orig, " +
        Tables.r6sql(s"sqrt($d16)") + " AS d_proj " +
        "FROM proj a JOIN proj b ON a.vec_id < b.vec_id " +
        "JOIN embeddings pa ON a.vec_id = pa.vec_id " +
        "JOIN embeddings pb ON b.vec_id = pb.vec_id) " +
        "SELECT id_a, id_b, d_orig, d_proj, " +
        Tables.r6sql("d_proj / d_orig") + " AS ratio " +
        "FROM d ORDER BY id_a, id_b"
    }),
    Q("q298_simhash_bit_balance", q298 _, Some(
      simhashSql + ", " +
        "nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM sh), " +
        "b AS (SELECT CAST(unnest(range(0, 32)) AS BIGINT) AS bit), " +
        "s AS (SELECT bit, CAST(SUM((simhash >> CAST(bit AS INT)) & 1) AS BIGINT) " +
        "AS n_set FROM sh CROSS JOIN b GROUP BY bit) " +
        "SELECT bit, n_set, " +
        Tables.meanDSql("n_set", "nd") + " AS p_set, " +
        Tables.r6sql("ABS(CAST(n_set AS DOUBLE) / nd - 0.5)") + " AS imbalance, " +
        "(" + Tables.meanDSql("n_set", "nd") + " < 0.4 OR " +
        Tables.meanDSql("n_set", "nd") + " > 0.6) AS degenerate " +
        "FROM s CROSS JOIN nd ORDER BY bit")),
    Q("q291_ann_recall_audit", q291 _, Some {
      val dotPQ = "list_sum(list_transform(range(1,65), i -> CAST(pv.embedding[i] AS DOUBLE) * CAST(cv.embedding[i] AS DOUBLE)))"
      val nP = "sqrt(list_sum(list_transform(range(1,65), i -> CAST(pv.embedding[i] AS DOUBLE) * CAST(pv.embedding[i] AS DOUBLE))))"
      val nC = "sqrt(list_sum(list_transform(range(1,65), i -> CAST(cv.embedding[i] AS DOUBLE) * CAST(cv.embedding[i] AS DOUBLE))))"
      val cosSql = Tables.r6sql(s"$dotPQ / ($nP * $nC)")
      hyperplaneCtesSql + ", " +
        s"exd AS (SELECT pv.vec_id AS id_p, cv.vec_id AS id_c, $cosSql AS cos " +
        "FROM embeddings pv JOIN embeddings cv ON cv.vec_id <> pv.vec_id " +
        "WHERE pv.vec_id < 10), " +
        "ex AS (SELECT id_p, id_c FROM (SELECT id_p, id_c, " +
        "ROW_NUMBER() OVER (PARTITION BY id_p ORDER BY cos DESC, id_c) AS rn " +
        s"FROM exd) WHERE rn <= $RecallK), " +
        "cand AS (SELECT DISTINCT a.vec_id AS id_p, c.vec_id AS id_c FROM " +
        multiProbeSql("banded") + " a " +
        "JOIN banded c ON a.b = c.b AND a.k = c.k " +
        "WHERE a.vec_id < 10 AND c.vec_id <> a.vec_id), " +
        s"ld AS (SELECT cand.id_p, cand.id_c, $cosSql AS cos " +
        "FROM cand JOIN embeddings pv ON cand.id_p = pv.vec_id " +
        "JOIN embeddings cv ON cand.id_c = cv.vec_id), " +
        "lsh AS (SELECT id_p, id_c FROM (SELECT id_p, id_c, " +
        "ROW_NUMBER() OVER (PARTITION BY id_p ORDER BY cos DESC, id_c) AS rn " +
        s"FROM ld) WHERE rn <= $RecallK), " +
        "nl AS (SELECT id_p, CAST(COUNT(*) AS BIGINT) AS n_lsh FROM lsh GROUP BY 1), " +
        "nh AS (SELECT e.id_p, CAST(COUNT(*) AS BIGINT) AS n_hit " +
        "FROM ex e JOIN lsh l ON e.id_p = l.id_p AND e.id_c = l.id_c GROUP BY 1) " +
        "SELECT p.vec_id, COALESCE(n_lsh, 0) AS n_lsh, COALESCE(n_hit, 0) AS n_hit, " +
        Tables.r6sql(s"COALESCE(n_hit, 0) / CAST($RecallK AS DOUBLE)") +
        " AS recall_at_k " +
        "FROM (SELECT vec_id FROM embeddings WHERE vec_id < 10) p " +
        "LEFT JOIN nl ON p.vec_id = nl.id_p LEFT JOIN nh ON p.vec_id = nh.id_p " +
        "ORDER BY p.vec_id"
    }),
    Q("q285_dedup_threshold_sweep", q285 _, Some(
      pairCtesSql + ", " +
        "jac AS (SELECT ib, " +
        Tables.r6sql("inter / (sa.n + sb.n - inter)") + " AS j " +
        "FROM pairs JOIN sizes sa ON ia = sa.doc_id " +
        "JOIN sizes sb ON ib = sb.doc_id WHERE inter >= 3), " +
        "g AS (SELECT unnest(range(5, 10)) * 10 AS thr), " +
        "pt AS (SELECT thr, CAST(COUNT(*) AS BIGINT) AS n_pairs, " +
        "CAST(COUNT(DISTINCT ib) AS BIGINT) AS n_docs_dropped " +
        "FROM g JOIN jac ON j >= thr / 100.0 GROUP BY thr), " +
        "nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents) " +
        "SELECT g.thr, COALESCE(n_pairs, 0) AS n_pairs, " +
        "COALESCE(n_docs_dropped, 0) AS n_docs_dropped, " +
        Tables.r6sql("COALESCE(n_docs_dropped, 0) / CAST(n_docs AS DOUBLE)") +
        " AS drop_rate " +
        "FROM g LEFT JOIN pt ON g.thr = pt.thr CROSS JOIN nd ORDER BY g.thr")),
  )
}
