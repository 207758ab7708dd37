package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-curation operators for large-scale training-data pipelines
  * (SURVEY.md §2.8b, q104/q105/q109): benchmark decontamination,
  * training-sequence packing, and class-balanced corpus rebalancing.
  *
  * Scale notes: decontamination joins the corpus against the eval-set
  * n-gram index — the eval side is the small curated benchmark by
  * construction, so it broadcasts and the 100 TB side streams once with
  * no shuffle; packing is a keyed window (hash-bucket partitions grow
  * with data, each sorted independently — no global sort); rebalancing
  * is a 5-row broadcast of per-class rates + a narrow hash filter.
  */
object CorpusOps {

  /** md5-prefix bucket 0..`mod`−1 of column `h` (two hex chars via instr
    * math — the q79/q85 portable-bucket idiom; shared with the other
    * operator modules so the bucket convention can't diverge). */
  private[operators] def hexBucket(mod: Int) = expr(
    "((instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16 + " +
      s"(instr('0123456789abcdef', substring(h, 2, 1)) - 1)) % $mod")

  private[operators] def hexBucketSql(mod: Int, h: String) =
    s"((instr('0123456789abcdef', substring($h, 1, 1)) - 1) * 16 + " +
      s"(instr('0123456789abcdef', substring($h, 2, 1)) - 1)) % $mod"

  /** Per-doc DISTINCT word 5-grams (distinct inside the row — narrow,
    * no pair-space shuffle; the q50 df-cap trick). `docs` needs
    * (doc_id, text). */
  private def fiveGrams(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), split(col("text"), " ").as("ts"))
    .filter(size(col("ts")) >= 5)
    .select(col("doc_id"), explode(array_distinct(expr(
      "transform(sequence(0, size(ts) - 5), i -> " +
        "concat_ws(' ', ts[i], ts[i+1], ts[i+2], ts[i+3], ts[i+4]))"))).as("g"))

  /** The generic decontamination primitive behind q104, exposed as
    * [[graft.Graft.decontaminate]]: flag every `train` document sharing
    * any word 5-gram with `evalDocs`. Both frames need (doc_id, text);
    * the eval n-gram index is assumed benchmark-sized and broadcasts.
    * Returns (doc_id, n_overlap, contaminated) covering ALL train docs. */
  private[graft] def decontaminateOf(train: DataFrame, evalDocs: DataFrame): DataFrame = {
    val evalIdx = fiveGrams(evalDocs).select("g").distinct()
    val hits = fiveGrams(train)
      .join(broadcast(evalIdx), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    train.select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0).as("contaminated"))
  }

  /** q104: benchmark decontamination — flag training documents sharing
    * any word 5-gram with the held-out eval split (the md5-bucket ≥ 90
    * tail, the q79 split convention). The standard n-gram-overlap
    * decontamination check every LLM data pipeline runs before training.
    *
    * Plan: the eval 5-gram index is DISTINCT n-grams of the small curated
    * split → broadcast; the train side explodes per-doc-distinct n-grams
    * (narrow) and equi-joins the broadcast — the corpus-sized side never
    * shuffles on n-gram strings. At 100 TB the eval set stays benchmark-
    * sized, so the broadcast holds; if it ever didn't, the same plan runs
    * as a shuffled equi-join on the n-gram key. */
  private def q104(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir, "documents")
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("bucket", hexBucket(100))
    decontaminateOf(
      docs.filter(col("bucket") < 90).select("doc_id", "text"),
      docs.filter(col("bucket") >= 90).select("doc_id", "text"))
      .orderBy("doc_id")
  }

  /** q310: eval n-gram coverage — the RECALL side of decontamination:
    * q104 flags train docs that leak INTO the eval split; this measures,
    * per eval document, what fraction of its distinct 5-grams exist
    * anywhere in train — high coverage means the "held-out" doc is
    * effectively memorizable from train even if no single doc contains
    * it (the stitched-leakage case doc-level overlap flags miss). The
    * per-doc coverage distribution is the honest answer to "how held
    * out is my eval set".
    *
    * Scale: the q104 dataflow reversed — the EVAL gram index is the
    * small side; here train grams form the big side of the SAME
    * equi-join (hits counted per eval doc); at corpus scale the join is
    * gram-keyed and shuffle-bounded by the eval index either way. */
  private def q310(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir, "documents")
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("bucket", hexBucket(100))
    val trainIdx = fiveGrams(docs.filter(col("bucket") < 90)
      .select("doc_id", "text")).select("g").distinct()
    val evalGrams = fiveGrams(docs.filter(col("bucket") >= 90)
      .select("doc_id", "text"))
    val hits = evalGrams.join(trainIdx.withColumn("hit", lit(1L)), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_covered"))
    hits.select(col("doc_id"), col("n_grams"), col("n_covered"),
        Tables.meanD(col("n_covered"), col("n_grams")).as("coverage"))
      .orderBy("doc_id")
  }

  /** Packing capacity (tokens per training sequence) and the bucket
    * count packing parallelizes over. */
  private val PackLen = 512
  private val PackBuckets = 16

  /** q105: training-sequence packing — distribute documents over
    * `PackBuckets` hash buckets, order each bucket by the deterministic
    * md5 shuffle key, and cut the running token count into `PackLen`-token
    * bins: bin = (cum_before DIV L). The distributed approximation of
    * greedy next-fit packing (a bin can overflow by < 1 doc, i.e. the doc
    * spanning the boundary stays in the bin where it started — the
    * boundary doc is split/truncated downstream by the q91 chunker).
    *
    * Plan: ONE shuffle keyed by bucket; each bucket sorts independently
    * (bucket count scales with cluster width, no global sort — this is
    * how 100 TB packs in parallel while staying byte-reproducible). */
  /** The generic packing primitive behind q105, exposed as
    * [[graft.Graft.packSequences]]: per-document bin assignment
    * (doc_id, tok, bucket, bin). `docs` needs (doc_id, text). */
  private[graft] def packAssignments(docs: DataFrame, packLen: Int,
      buckets: Int): DataFrame = {
    val w = Window.partitionBy("bucket").orderBy("h", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("tok"))
      .withColumn("h", md5(concat(lit("pack:"), col("doc_id").cast("string"))))
      .withColumn("bucket", hexBucket(buckets).cast("bigint"))
      .withColumn("cum", sum(col("tok")).over(w))
      .withColumn("bin", expr(s"(cum - tok) div $packLen"))
      .select("doc_id", "tok", "bucket", "bin")
  }

  private def q105(spark: SparkSession, sfDir: String): DataFrame = {
    packAssignments(Tables(spark, sfDir, "documents"), PackLen, PackBuckets)
      .groupBy("bucket", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).as("tokens_total"),
        Tables.r6(sum(col("tok")) / lit(PackLen.toDouble)).as("fill_ratio"))
      .orderBy("bucket", "bin")
  }

  /** q109: class-balanced corpus rebalance — downsample every language to
    * the smallest language's count (the balanced-mix curation step):
    * keep-rate r = min_n / lang_n, applied as a deterministic md5-bucket
    * filter so the sample is reproducible across runs, engines, and
    * partitionings. Output: per-language kept counts + the applied rate.
    *
    * Plan: per-class counts are a 5-row aggregate → broadcast; the filter
    * is a narrow per-row expression — the corpus never shuffles. The
    * integer threshold compare (bucket < r·10000 floor) avoids any
    * double-boundary ambiguity between engines. */
  /** The generic rebalance primitive behind q109, exposed as
    * [[graft.Graft.rebalanceClasses]]: downsample every class of
    * `classCol` to the smallest class's count via a deterministic
    * md5-bucket keep-filter on `idCol`. Returns the KEPT rows with
    * `graft_class_n` (original class size) and `graft_thresh` (the
    * integer keep-threshold out of 10000) attached. */
  private[graft] def rebalanceOf(df: DataFrame, classCol: String,
      idCol: String): DataFrame = {
    for (c <- Seq("graft_h", "graft_bucket", "graft_class_n", "graft_thresh"))
      require(!df.columns.contains(c), s"$c is reserved by rebalanceClasses")
    val counts = df.groupBy(classCol).agg(count(lit(1)).as("graft_class_n"))
    val minN = counts.agg(min(col("graft_class_n")).as("graft_min_n"))
    val rates = counts.crossJoin(broadcast(minN))
      // integer threshold out of 10000: floor(min_n·10000 / class_n) in
      // exact int64 math — no doubles anywhere near the keep boundary
      .select(col(classCol), col("graft_class_n"),
        expr("(graft_min_n * 10000) div graft_class_n").as("graft_thresh"))
    df
      .withColumn("graft_h", md5(concat(lit("bal:"), col(idCol).cast("string"))))
      .withColumn("graft_bucket", expr(
        "((instr('0123456789abcdef', substring(graft_h, 1, 1)) - 1) * 4096 + " +
          "(instr('0123456789abcdef', substring(graft_h, 2, 1)) - 1) * 256 + " +
          "(instr('0123456789abcdef', substring(graft_h, 3, 1)) - 1) * 16 + " +
          "(instr('0123456789abcdef', substring(graft_h, 4, 1)) - 1)) % 10000"))
      .join(broadcast(rates), classCol)
      .filter(col("graft_bucket") < col("graft_thresh"))
      .drop("graft_h", "graft_bucket")
  }

  private def q109(spark: SparkSession, sfDir: String): DataFrame = {
    rebalanceOf(Tables(spark, sfDir, "documents"), "lang", "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("kept"),
        min(col("graft_class_n")).as("orig"),
        Tables.r6(min(col("graft_thresh")) / lit(10000.0)).as("rate"))
      .orderBy("lang")
  }

  /** q338: rejection-sample the corpus to a TARGET length profile —
    * q109 balances classes to the minimum; this reshapes a continuous
    * marginal (document length) to an arbitrary target mix, the
    * "match the pretraining length distribution" curation step. Docs
    * bucket by n_chars/40; the target weight w_b = max(16 − b, 1)
    * (linear decay — long docs downweighted) is the profile the kept
    * corpus should follow. Per-bucket accept threshold out of 10000:
    *   R = min_b ⌊n_b·10000 / w_b⌋   (the binding bucket keeps ~all)
    *   t_b = ⌊R·w_b / n_b⌋           (kept_b ≈ n_b·t_b/10000 ∝ w_b)
    * — classical rejection sampling with the proposal = the empirical
    * distribution, scaled so acceptance maxes out at 1. The accept
    * decision is q109's deterministic md5-bucket filter with INTEGER
    * thresholds — no doubles near the keep boundary, reproducible
    * across runs, engines and partitionings. Output per bucket:
    * target weight, population, threshold, kept count.
    *
    * Scale: bucket counts are a tiny agg → broadcast; R is a 1-row
    * min over buckets; the verdict is a narrow per-row expression +
    * broadcast join — the corpus never shuffles, the same plan shape
    * at 100 TB. */
  private def q338(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), expr("n_chars div 40").as("bucket"))
      .withColumn("w", greatest(lit(16L) - col("bucket"), lit(1L)))
    val counts = docs.groupBy("bucket", "w").agg(count(lit(1)).as("n_docs"))
    val rMin = counts.agg(min(expr("(n_docs * 10000) div w")).as("r"))
    val rates = counts.crossJoin(broadcast(rMin))
      .select(col("bucket"), col("w"), col("n_docs"),
        expr("(r * w) div n_docs").as("thresh"))
    val kept = docs
      .withColumn("h", md5(concat(lit("shape:"), col("doc_id").cast("string"))))
      .withColumn("u", expr(
        "((instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 4096 + " +
          "(instr('0123456789abcdef', substring(h, 2, 1)) - 1) * 256 + " +
          "(instr('0123456789abcdef', substring(h, 3, 1)) - 1) * 16 + " +
          "(instr('0123456789abcdef', substring(h, 4, 1)) - 1)) % 10000"))
      .join(broadcast(rates.select("bucket", "thresh")), "bucket")
      .filter(col("u") < col("thresh"))
      .groupBy("bucket").agg(count(lit(1)).as("kept"))
    // both report frames are bucket-count-sized — broadcast the probe
    rates.join(broadcast(kept), Seq("bucket"), "left")
      .select(col("bucket"), col("w"), col("n_docs"), col("thresh"),
        coalesce(col("kept"), lit(0L)).as("kept"))
      .orderBy("bucket")
  }

  /** q344: cross-source quantile normalization of document length — the
    * score-calibration step that makes ONE global threshold meaningful
    * across heterogeneous sources (the genomics-lineage method of
    * Bolstad et al., Bioinformatics 2003, applied to corpus curation):
    * a length/quality cut tuned on one source silently keeps a
    * different fraction of every other source unless each source's
    * distribution is first mapped onto a common reference. Each doc's
    * within-source quantile cell g (of G = 20) maps to the REFERENCE
    * value at g = the cross-source mean of the per-source empirical
    * quantiles q(s,g) = min{v : cum_s(v)·G ≥ g·n_s} (type-1, integer
    * math — no doubles near any boundary). Ties share their max rank,
    * so the map is deterministic and engine-independent.
    *
    * Scale: the corpus collapses ONCE to the per-(source, value) domain
    * frame; cumulative counts are the two-phase per-group prefix sum
    * (no single-partition window); the quantile table is (domain × G)
    * bounded and the reference is G = 20 broadcast rows; docs re-attach
    * via one equi-join against the domain-bounded cum frame (AQE
    * broadcasts it) — the corpus never shuffles except the final
    * range-partitioned ORDER BY emission. */
  private def q344(spark: SparkSession, sfDir: String): DataFrame = {
    val G = 20L
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val perVal = docs.groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("n"))
    val cum = graft.plans.DistributedCumSum
      .cumulativeGrouped(perVal, Seq("source"), Seq(col("v")), Seq("n"))
      .localCheckpoint(true) // domain-bounded; totals, quantiles + doc join
    val totals = cum.groupBy("source").agg(max("cum_n").as("ns"))
    val grid = spark.range(1, G + 1).select(col("id").as("g"))
    val srcQ = cum.join(broadcast(totals), "source")
      .crossJoin(broadcast(grid))
      .filter(col("cum_n") * lit(G) >= col("g") * col("ns"))
      .groupBy("source", "g").agg(min("v").as("qv"))
    val ref = srcQ.groupBy("g")
      .agg(Tables.meanD(sum("qv"), count(lit(1))).as("ref_len"))
    docs
      .join(cum.select(col("source"), col("v").as("n_chars"), col("cum_n")),
        Seq("source", "n_chars"))
      .join(broadcast(totals), "source")
      .withColumn("g", expr(s"(cum_n * $G + ns - 1) div ns"))
      .join(broadcast(ref), "g")
      .select(col("doc_id"), col("source"), col("n_chars"), col("g"),
        col("ref_len"))
      .orderBy("doc_id")
  }

  private val bucketCte =
    "d AS (SELECT doc_id, text, " +
      hexBucketSql(100, "md5(CAST(doc_id AS VARCHAR))") + " AS bucket FROM documents)"

  /** q127: weighted sampling without replacement (Efraimidis–Spirakis,
    * IPL 2006) — top-5 docs per language by the A-ES key ln(u)/w, u a
    * deterministic per-doc uniform (q116's Knuth-hash grid), w = doc
    * length: longer docs proportionally likelier, the quality/length-
    * weighted curation draw. The key is r6-quantized with a doc_id
    * tie-break so both engines rank the identical value (libm `ln` may
    * differ in the last ulp between engines; at full precision that
    * could flip a boundary rank). Swap u for a real RNG per epoch in
    * production — the ranking structure is unchanged.
    *
    * Scale: the key is a narrow scalar; per-class top-k is a windowed
    * rank on the class partition — one shuffle, and with k≪class size
    * the window prunes early under TakeOrdered-style per-partition
    * limits. */
  private def q127(spark: SparkSession, sfDir: String): DataFrame = {
    // doc_id reduced mod 1000003 BEFORE the multiply: same residue by
    // modular arithmetic (so values are unchanged), but the product now
    // stays ≤ 1000002·2654435761 ≈ 2.7e15 — no silent Long wrap at
    // 100 TB doc_id ranges (Spark would wrap to a negative u and emit
    // NULL keys; DuckDB would raise int64 overflow — a cross-engine
    // divergence). +1/1000004: u ∈ (0,1), never ln(0).
    val u = (((col("doc_id") % lit(1000003L)) * lit(2654435761L)) % lit(1000003L) + lit(1L))
      .cast("double") / lit(1000004.0)
    val w = Window.partitionBy("lang").orderBy(col("aes_key").desc, col("doc_id"))
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        Tables.r6(log(u) / greatest(col("n_chars"), lit(1L))).as("aes_key"))
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= 5)
      .orderBy("lang", "rn")
  }

  /** q148: exact-k per-class sample — EXACTLY 10 documents per language,
    * chosen by md5 hash rank (deterministic "uniform" draw, epoch-
    * reseedable via the salt). Completes the sampling family: q85 draws
    * a FRACTION per stratum, q127 draws weighted, q148 draws an exact
    * count. Scale shape: the rank filter is a per-class window that
    * Spark executes as a WindowGroupLimit (per-partition top-k prune) —
    * no class's full member list ever sorts in one task beyond the
    * pruned k rows per partition. */
  private def q148(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("hk"), col("doc_id"))
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        md5(concat(lit("gk:"), col("doc_id").cast("string"))).as("hk"))
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= 10)
      .select("lang", "rn", "doc_id")
      .orderBy("lang", "rn")
  }

  /** q150: the end-to-end corpus curation pipeline — the LLM-side
    * counterpart of q140's anonymization ETL, the library's whole
    * training-data purpose as ONE per-language report. Three gates in
    * the canonical order, each charged only with documents the earlier
    * gates let through:
    *   1. exact dedup  — keep the min doc_id per md5(text);
    *   2. near dedup   — SimHash banding over the survivors (q83's
    *      4×8-bit pigeonhole recipe): any Hamming-≤3 pair drops the
    *      HIGHER id — pairwise, deterministic, SQL-expressible (the
    *      full CC resolution is q76/q93's iterative job);
    *   3. quality gate — r6(0.001·n_chars + 0.5·uniq_ratio) < 0.47
    *      drops the repetitive/short tail (~10% on this corpus).
    * Output: per language, total/kept/dropped-by-stage counts and the
    * surviving token volume — the numbers a curation run reports.
    * Scale: one hash-keyed dedup window, the banded equi-join (never
    * doc×doc), narrow quality scalars, one keyed agg. */
  private def q150(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
    val wDup = Window.partitionBy("h").orderBy("doc_id")
    val flagged = docs.withColumn("h", md5(col("text")))
      .withColumn("drop_exact", row_number().over(wDup) > 1)
      .transform(graft.plans.CorpusPin.pin) // feeds the simhash build AND the final agg
    val keepers = flagged.filter(!col("drop_exact"))
    val banded = NearDup.simhashOf(keepers.select("doc_id", "text"))
      .select(col("doc_id"), col("simhash"), explode(expr("sequence(0, 3)")).as("b"))
      .withColumn("k", expr("shiftright(simhash, cast(b * 8 as int)) & 255"))
      .transform(graft.plans.CorpusPin.pin) // both sides of the band self-join
    val nearDropped = banded
      .select(col("doc_id").as("ia"), col("simhash").as("sa"), col("b"), col("k"))
      .join(banded.select(col("doc_id").as("ib"), col("simhash").as("sb"), col("b"), col("k")),
        Seq("b", "k"))
      .filter(col("ia") < col("ib") && expr("bit_count(sa ^ sb)") <= 3)
      .select(col("ib").as("doc_id")).distinct()
      .withColumn("drop_near", lit(true))
    val quality = Tables.r6(
      lit(0.001) * col("n_chars") +
        lit(0.5) * (size(array_distinct(split(col("text"), " "))).cast("double") /
          size(split(col("text"), " "))))
    flagged
      .join(nearDropped, Seq("doc_id"), "left")
      .na.fill(false, Seq("drop_near"))
      .withColumn("drop_quality",
        !col("drop_exact") && !col("drop_near") && quality < 0.47)
      .withColumn("kept", !col("drop_exact") && !col("drop_near") && !col("drop_quality"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("drop_exact"), 1L).otherwise(0L)).as("n_drop_exact"),
        sum(when(col("drop_near"), 1L).otherwise(0L)).as("n_drop_near"),
        sum(when(col("drop_quality"), 1L).otherwise(0L)).as("n_drop_quality"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), size(split(col("text"), " ")).cast("bigint"))
          .otherwise(0L)).as("kept_tokens"))
      .orderBy("lang")
  }

  /** q182: split-leakage audit — the reversed direction of q104's
    * decontamination, run on the pipeline's OWN deterministic 3-way split
    * (q79's md5-bucket convention: 80/10/10 train/val/test): for each
    * held-out split, how many of its documents share ≥1 word 5-gram with
    * the train split, plus the distinct-gram containment fraction. The
    * audit that catches a bad split BEFORE eval numbers go wrong — a
    * held-out doc whose n-grams live in train is measuring memorization.
    * Docs shorter than one 5-gram carry no grams and are outside the
    * audit (identically on both engines).
    *
    * Plan: the train 5-gram index is distinct and joined on the gram key
    * with NO broadcast hint — train is the 80%-majority side, so the
    * index is corpus-scale and a forced broadcast would OOM / hit the
    * 8 GB broadcast ceiling at any realistic scale (ADVICE r9; unlike
    * q104's decontamination, whose hinted side is the provably-small
    * EVAL index). AQE/stats pick the strategy: a shuffled equi-join at
    * scale, broadcast only if the index measures small at runtime. The
    * held-out side explodes per-doc-distinct grams (narrow) and
    * aggregates twice (doc-level then the 2-row split report). */
  /** The generic split-leakage primitive behind q182, exposed as
    * [[graft.Graft.splitLeakage]]: `docs` needs (doc_id, text, <splitCol>);
    * every split value other than `trainValue` is audited against the
    * train gram index. */
  private[graft] def splitLeakageOf(docs: DataFrame, splitCol: String,
      trainValue: String): DataFrame = {
    val grams = fiveGrams(docs.select("doc_id", "text"))
      .join(docs.select(col("doc_id"), col(splitCol).as("graft_split")), "doc_id")
    val trainIdx = grams.filter(col("graft_split") === trainValue)
      .select(col("g"), lit(1L).as("hit")).distinct()
    val perDoc = grams.filter(col("graft_split") =!= trainValue)
      .join(trainIdx, Seq("g"), "left")
      .groupBy("graft_split", "doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
    perDoc.groupBy("graft_split")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_hit") > 0, 1L).otherwise(0L)).as("n_leaky"),
        Tables.r6(sum(when(col("n_hit") > 0, 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double")).as("leak_rate"),
        Tables.r6(sum(col("n_hit")).cast("double") /
          sum(col("n_grams")).cast("double")).as("gram_containment"))
      .withColumnRenamed("graft_split", splitCol)
      .orderBy(splitCol)
  }

  private def q182(spark: SparkSession, sfDir: String): DataFrame = {
    // delegates to the facade primitive (q120→pageRank convention): ONE
    // copy of the leakage semantics, oracle-verified through here
    splitLeakageOf(
      Tables(spark, sfDir, "documents")
        .withColumn("h", md5(col("doc_id").cast("string")))
        .withColumn("bucket", hexBucket(100))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test")),
      "split", "train")
  }

  /** q320: GROUP-aware split + leakage audit — the group-k-fold lesson
    * applied to corpus splitting: q182 buckets by md5(doc_id), so two
    * near-duplicate docs from the SAME source routinely straddle
    * train/test and its audit measures that leakage; q320 buckets by
    * md5(SOURCE) instead — every doc of a source lands in one split BY
    * CONSTRUCTION (zero same-source cross-split pairs, no audit needed
    * for that property), which is how production corpora split when
    * within-source duplication is the dominant leak channel (crawl
    * snapshots, forum mirrors). Same 80/10/10 buckets and the SAME
    * report shape as q182 ([[splitLeakageOf]] verbatim), so the two
    * split policies compare row-for-row: what survives here is only the
    * CROSS-source gram overlap — the irreducible floor a group split
    * can't remove (that's q104/q283's decontamination job).
    *
    * Scale: identical to q182 — the split column is a narrow hash of a
    * row attribute (no extra shuffle), and the audit is the shared
    * gram-index left join. */
  private def q320(spark: SparkSession, sfDir: String): DataFrame =
    splitLeakageOf(
      Tables(spark, sfDir, "documents")
        .withColumn("h", md5(col("source")))
        .withColumn("bucket", hexBucket(100))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test")),
      "split", "train")

  /** q322: dataset-card rollup — the release artifact every corpus
    * ships (a "datasheet for datasets" summary table), computed at
    * every grain in ONE pass: ROLLUP(lang, source) gives per-(lang,
    * source) rows, per-lang subtotals, and the grand total from a
    * single shuffle — per group: docs, tokens, mean tokens/doc,
    * distinct texts (exact-hash), and the exact-dup fraction. The
    * composite the card needs exists piecemeal across q64/q49/q178;
    * this is the one-scan rollup a 100 TB release job runs LAST, after
    * curation, to stamp the shipped corpus.
    *
    * Scale: ONE corpus scan into a rollup aggregate (Spark expands
    * grouping sets map-side; the shuffle carries (lang, source,
    * grouping-id) keys); distinct texts ride md5 (16-byte keys, not
    * text) through a count-distinct — at extreme scale swap for the
    * q14 HLL sketch, same plan shape. NULL group cells mark subtotal
    * rows exactly as the SQL standard renders them. */
  private def q322(spark: SparkSession, sfDir: String): DataFrame = {
    val d = (c: Column) => c.cast("double")
    Tables(spark, sfDir, "documents")
      .select(col("lang"), col("source"),
        size(split(col("text"), " ")).cast("bigint").as("n_tok"),
        md5(col("text")).as("th"))
      .rollup("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        countDistinct("th").as("n_unique_texts"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
        Tables.r6(d(col("n_tokens")) / d(col("n_docs"))).as("avg_tokens"),
        col("n_unique_texts"),
        Tables.r6(lit(1.0) - d(col("n_unique_texts")) / d(col("n_docs")))
          .as("dup_frac"))
      .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)
  }

  private val q322Sql: String =
    "WITH b AS (SELECT lang, source, " +
      "CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok, md5(text) AS th FROM documents) " +
      "SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
      "CAST(SUM(n_tok) AS BIGINT) AS n_tokens, " +
      Tables.r6sql("CAST(SUM(n_tok) AS DOUBLE) / COUNT(*)") + " AS avg_tokens, " +
      "CAST(COUNT(DISTINCT th) AS BIGINT) AS n_unique_texts, " +
      Tables.r6sql("1.0 - CAST(COUNT(DISTINCT th) AS DOUBLE) / COUNT(*)") +
      " AS dup_frac " +
      "FROM b GROUP BY ROLLUP (lang, source) " +
      "ORDER BY lang ASC NULLS FIRST, source ASC NULLS FIRST"

  /** q178: dataset mixture weights — the multilingual-sampling standard
    * (temperature-scaled source weights, α = 0.5): per source,
    * w_s = √n_s / Σ√n_j, plus the raw share, the implied up/down-sampling
    * rate w_s·N/n_s, and the expected document count in a 1000-doc draw.
    * The knob every mixed-corpus training run turns — α = 1 reproduces raw
    * proportions, α → 0 approaches uniform; √ keeps head sources from
    * drowning tail sources without inverting the order.
    *
    * Parity: α = 0.5 is computed as `sqrt` (correctly-rounded IEEE on
    * both engines, unlike a general `pow`), each √n is pinned to
    * DECIMAL(18,4) before the cross-source Σ (exact, order-free — the
    * established dec() pattern), and every ratio is one double division
    * under r6.
    *
    * Scale: ONE corpus pass (the source groupBy, map-side combined,
    * shuffle bounded by source cardinality); the totals fold and the
    * final projection run on the bounded per-source frame (checkpointed
    * once, sources × 1 rows). */
  /** The generic mixture-weight primitive behind q178, exposed as
    * [[graft.Graft.mixtureWeights]]: any frame, any categorical column. */
  private[graft] def mixtureWeightsOf(df: DataFrame, srcCol: String): DataFrame = {
    val bySrc = df.groupBy(col(srcCol)).agg(count(lit(1)).as("n_docs"))
      .localCheckpoint(true) // sources-sized; feeds the totals AND the output
    val tot = bySrc.agg(
      sum(col("n_docs")).as("n_total"),
      sum(Tables.dec(sqrt(col("n_docs").cast("double")))).as("sq_sum"))
    // the unrounded weight feeds three outputs; r6 applies per output
    val w = Tables.dec(sqrt(col("n_docs").cast("double"))).cast("double") /
      col("sq_sum").cast("double")
    bySrc.crossJoin(broadcast(tot))
      .select(col(srcCol), col("n_docs"),
        Tables.r6(col("n_docs").cast("double") / col("n_total").cast("double"))
          .as("raw_share"),
        Tables.r6(w).as("weight"),
        Tables.r6((w * col("n_total").cast("double")) / col("n_docs").cast("double"))
          .as("sample_rate"),
        Tables.r6(w * lit(1000.0)).as("exp_docs_1k"))
      .orderBy(srcCol)
  }

  private def q178(spark: SparkSession, sfDir: String): DataFrame =
    // delegates to the facade primitive (q120→pageRank convention): ONE
    // copy of the weighting semantics, oracle-verified through here
    mixtureWeightsOf(Tables(spark, sfDir, "documents"), "source")

  /** q190: first-occurrence n-gram NOVELTY scoring — for every document
    * (in doc_id ingest order), the fraction of its distinct word 5-grams
    * whose FIRST occurrence in the corpus is this document. The standard
    * incremental-corpus diagnostic between exact dedup and near-dedup:
    * a doc with novelty ≈ 0 is assembled entirely from already-ingested
    * text (template/boilerplate/recombination) even when no single
    * earlier doc is similar enough for q61/q83 to pair with it, and
    * novelty-vs-ingest-order curves show when a crawl stops adding
    * information. Complements q104 (overlap vs a FIXED eval set) and
    * q181 (batch vs standing index): here the reference corpus is every
    * EARLIER document, defined per-gram by min(doc_id).
    *
    * Determinism: pure integer counts + one int/int double division,
    * r6'd. Scale: one gram-keyed aggregation builds the first-occurrence
    * index from the SAME distinct (doc, gram-hash) frame the scoring
    * join reads (q61's hash-before-shuffle trick — 16-byte rows, string
    * grams never shuffle; collision risk ≈ n²/2⁶⁵, surfaced by the
    * oracle's exact-string mirror); the scoring join is gram-keyed
    * equi, the fold doc-keyed — never doc×doc, no driver state. */
  /** The generic novelty primitive behind q190, exposed as
    * [[graft.Graft.noveltyScores]]: `docs` needs (doc_id, text). */
  private[graft] def noveltyOf(docs: DataFrame): DataFrame = {
    val g = fiveGrams(docs.select("doc_id", "text"))
      .select(col("doc_id"), xxhash64(col("g")).as("gh"))
      // r17: co-partitioned by gh (guide §2.4) — both consumers (the
      // first-occurrence groupBy(gh) and the scoring join on gh) reuse
      // this one exchange instead of re-shuffling the gram stream twice;
      // gh is a 64-bit hash, so the layout is skew-free by construction
      .repartition(col("gh"))
      .transform(graft.plans.CorpusPin.pin) // feeds the first-occurrence index AND the scoring side
    val first = g.groupBy("gh").agg(min("doc_id").as("first_doc"))
    g.join(first, "gh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        Tables.r6(col("n_novel") / col("n_grams")).as("novelty"))
      .orderBy("doc_id")
  }

  private def q190(spark: SparkSession, sfDir: String): DataFrame =
    noveltyOf(Tables(spark, sfDir, "documents"))

  /** q271: token-budget corpus selection — the knapsack-shaped curation
    * step a training mix actually runs: within each source, take the
    * highest-quality documents IN ORDER until the source's token budget
    * (25% of its total tokens) is spent, then report per source what the
    * budget bought. Quality = the integer distinct-token density
    * (1000·distinct DIV total — the q65/q196 score family; integer so
    * ordering has no float-tie hazard), tie-broken by doc_id; a doc
    * whose cumulative tokens would cross the budget is dropped and the
    * scan stops (prefix selection — deterministic and what a streaming
    * selector does; it does not backfill with smaller lower-ranked
    * docs).
    *
    * Scale: the ordered per-source cumulative sum is the scale-bearing
    * step — ONE source can hold half the corpus, so
    * `sum.over(partitionBy(source))` would funnel it through one task.
    * [[graft.plans.DistributedCumSum.cumulativeGrouped]] range-partitions
    * by (source, score desc, doc_id), splits oversized groups across
    * partitions, and stitches with broadcast per-(partition, group)
    * offsets (≤ partitions × sources rows). Budgets are a 5-row
    * broadcast. */
  private def q271(spark: SparkSession, sfDir: String): DataFrame = {
    val sel = budgetSelectOf(
      Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("source"),
          expr("CAST(size(split(text, ' ')) AS BIGINT)").as("tokens"),
          expr("(1000 * size(array_distinct(split(text, ' ')))) DIV size(split(text, ' '))")
            .as("score")),
      group = "source", budgetDiv = 4)
    val budgets = sel.select("source", "budget").distinct()
    budgets.join(
      sel.filter(col("kept")).groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum("tokens").as("tokens_kept")),
      Seq("source"), "left")
      .select(col("source"), col("budget"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"),
        Tables.r6(coalesce(col("tokens_kept"), lit(0L)) / col("budget"))
          .as("utilization"))
      .orderBy("source")
  }

  /** The generic selection behind q271, exposed as
    * [[graft.Graft.budgetSelect]]: `scored` needs (doc_id, `group`,
    * tokens, score); returns every input row plus (cum_tokens, budget,
    * kept) where budget = group's Σtokens DIV `budgetDiv` and kept =
    * cum_tokens ≤ budget under (score DESC, doc_id) order. */
  private[graft] def budgetSelectOf(scored: DataFrame, group: String,
      budgetDiv: Int): DataFrame = {
    require(budgetDiv >= 1, s"budgetSelect: budgetDiv $budgetDiv must be >= 1")
    val cum = graft.plans.DistributedCumSum.cumulativeGrouped(
      scored, Seq(group), Seq(col("score").desc, col("doc_id")), Seq("tokens"))
    val budgets = scored.groupBy(group)
      .agg(expr(s"sum(tokens) DIV $budgetDiv").as("budget"))
    cum.join(broadcast(budgets), group)
      .withColumn("kept", col("cum_tokens") <= col("budget"))
  }

  /** q282 hashed-feature domain (DSIR buckets unigrams into a fixed
    * feature space so the ratio model is constant-size at any corpus). */
  private val DsirBuckets = 256

  /** q282: DSIR-style importance scoring (Xie et al., NeurIPS 2023 —
    * Data Selection via Importance Resampling): score every raw-pool
    * document by Σ_f c_f(doc)·ln(p_target(f)/p_raw(f)) over hashed
    * unigram features, where `target` is the curated split (the q79
    * md5-bucket ≥ 90 tail) and `raw` is the remaining 90%. Positive
    * scores mark raw documents that look like the target distribution —
    * the principled replacement for hand-tuned quality filters when a
    * trusted seed corpus exists. Laplace-smoothed (+1 / +|F|); output
    * (doc_id, n_tok, lw, selected = lw > 0) over the raw pool.
    *
    * Parity: the per-feature log-ratio is r6-quantized → DECIMAL, the
    * per-doc Σ c_f·lr is exact DECIMAL (merge-order-free), cast once.
    *
    * Scale: the feature domain is FIXED at 256 buckets, so both count
    * frames, the ratio table, and its broadcast are constant-size; the
    * corpus is scanned twice (once for feature stats, once for scoring),
    * both passes narrow with vocabulary-bounded shuffles — no token
    * stream is ever checkpointed. */
  private def q282(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir, "documents")
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("split_b", hexBucket(100))
      .select(col("doc_id"), col("split_b"), split(col("text"), " ").as("ts"))
    def toks(d: DataFrame) = d
      .select(col("doc_id"), explode(col("ts")).as("t"))
      .withColumn("h", md5(col("t")))
      .withColumn("fb", hexBucket(DsirBuckets))
    val tgtCnt = toks(docs.filter(col("split_b") >= 90))
      .groupBy("fb").agg(count(lit(1)).as("ct"))
    // r17 optimization (guide §1.2 step 1 — don't compute things twice):
    // the raw pool's token explode + per-token md5 ran TWICE (feature
    // counts and per-doc scoring). Collapse to the (doc_id, fb) grain
    // once, pin it (doc×256-bounded, far below the token stream), and
    // derive BOTH consumers from it: cr = Σ_doc cf exactly.
    val rawDocFb = toks(docs.filter(col("split_b") < 90))
      .groupBy("doc_id", "fb").agg(count(lit(1)).as("cf"))
      .transform(graft.plans.CorpusPin.pin)
    val rawCnt = rawDocFb.groupBy("fb").agg(sum("cf").as("cr"))
    val totT = tgtCnt.agg(sum("ct").as("tt"))
    val totR = rawCnt.agg(sum("cr").as("tr"))
    val ratio = tgtCnt.join(rawCnt, Seq("fb"), "full_outer")
      .na.fill(0L, Seq("ct", "cr"))
      .crossJoin(broadcast(totT)).crossJoin(broadcast(totR))
      .select(col("fb"), Tables.r6(
        log((col("ct") + lit(1.0)) / (col("tt") + lit(DsirBuckets.toDouble))) -
          log((col("cr") + lit(1.0)) / (col("tr") + lit(DsirBuckets.toDouble))))
        .cast(DecimalType(18, 6)).as("lr"))
    val perDoc = rawDocFb
      .join(broadcast(ratio), "fb")
      .groupBy("doc_id")
      .agg(sum("cf").as("n_tok"), sum(col("cf") * col("lr")).as("lw_dec"))
    perDoc.select(col("doc_id"), col("n_tok"),
      col("lw_dec").cast("double").as("lw"),
      (col("lw_dec") > 0).as("selected"))
      .orderBy("doc_id")
  }

  /** q286 band width (tokens) and cap — difficulty bands 0..4. */
  private val CurBandTokens = 64
  private val CurBands = 5

  /** q286: curriculum ordering — assign every document a deterministic
    * GLOBAL training position ordered by difficulty band (token count
    * DIV 64, capped at band 4) with an md5 shuffle WITHIN each band:
    * easy-to-hard curriculum between bands, unbiased order inside one
    * (the Bengio et al. 2009 curriculum shape, made reproducible —
    * re-running on the same corpus yields byte-identical order, the
    * property a resumable training run needs).
    *
    * Scale: the global position is NOT a global-window row_number (one
    * task) — it rides `DistributedCumSum.cumulativeGrouped` under a
    * constant group: range-partition by (band, h, doc_id), per-partition
    * row counts, broadcast offsets. The corpus sorts only WITHIN
    * partitions of the range layout. */
  private def q286(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        least(lit((CurBands - 1).toLong),
          expr(s"CAST(size(split(text, ' ')) DIV $CurBandTokens AS BIGINT)"))
          .as("band"),
        md5(concat(lit("cur:"), col("doc_id").cast("string"))).as("hh"))
      .withColumn("g", lit(0)).withColumn("one", lit(1L))
    graft.plans.DistributedCumSum
      .cumulativeGrouped(d, Seq("g"),
        Seq(col("band"), col("hh"), col("doc_id")), Seq("one"))
      .select(col("doc_id"), col("band"), col("cum_one").as("pos"))
      .orderBy("pos")
  }

  /** q289 temperature (the mT5 α = 0.3 convention). */
  private val MixAlpha = 0.3

  /** q289: temperature-smoothed mixture weights — the multilingual/
    * multi-source sampling-rate formula (Arivazhagan et al. 2019; mT5):
    * q_s ∝ p_s^α with α = 0.3, where p_s is the source's token share.
    * Low-resource sources are up-sampled (upsample = q/p > 1), dominant
    * ones damped — the knob between proportional (α=1) and uniform
    * (α=0) mixing. Complements q178's boost-table mixture with the
    * closed-form temperature family.
    *
    * Parity: p and p^α are r6-quantized before the Σ p^α normalizer
    * (DECIMAL sum, merge-order-free); q and upsample recompute from the
    * quantized pieces identically on both engines.
    *
    * Scale: one map-side-combined groupBy(source) (≤ #sources rows);
    * the normalizer is a 1-row fold over that bounded frame. */
  private def q289(spark: SparkSession, sfDir: String): DataFrame = {
    val perSrc = Tables(spark, sfDir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("bigint")).as("tokens"))
      .localCheckpoint(true) // ≤ #sources rows; totals fold + final join
    val tot = perSrc.agg(sum("tokens").as("tt"))
    val withP = perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("tokens"),
        Tables.r6(col("tokens").cast("double") / col("tt")).as("p"))
      .withColumn("pa", Tables.r6(pow(col("p"), lit(MixAlpha))))
    val norm = withP.agg(sum(col("pa").cast(DecimalType(18, 6))).as("z"))
    withP.crossJoin(broadcast(norm))
      .select(col("source"), col("n_docs"), col("tokens"), col("p"),
        Tables.r6(col("pa") / col("z").cast("double")).as("q"),
        Tables.r6(Tables.r6(col("pa") / col("z").cast("double")) / col("p"))
          .as("upsample"))
      .orderBy("source")
  }

  /** q364: token-budget allocation under the repetition ceiling — the
    * data-constrained-scaling planner (Muennighoff et al., NeurIPS 2023:
    * past ~4 epochs, repeating data stops buying loss) that turns
    * q289's temperature weights into an executable plan: for a training
    * budget T = 4× the corpus, each source gets alloc_s = q_s·T, reads
    * as epochs_s = alloc_s/tokens_s, and caps at 4 epochs; the capped
    * surplus is reported as freed budget (what a second allocation
    * round redistributes). Per source: tokens, weight, allocation,
    * epochs, the cap verdict, effective tokens — plus the freed total
    * carried on every row (q196's convention). The table a pretraining
    * lead reads to turn "mixture weights" into "how many times do we
    * actually loop each source".
    *
    * Determinism: q289's exact weight recipe (pow + r6, r6-pinned
    * DECIMAL normalizer); every derived double fixed-shape, r6'd;
    * surplus terms r6→DECIMAL-summed.
    *
    * Scale: ONE corpus collapse to ≤#sources rows; every fold after is
    * source-bounded. */
  private def q364(spark: SparkSession, sfDir: String): DataFrame = {
    val perSrc = Tables(spark, sfDir, "documents")
      .groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("bigint")).as("tokens"))
      .localCheckpoint(true) // ≤ #sources rows; totals + final join
    val tot = perSrc.agg(sum("tokens").as("tt"))
    val withP = perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("tokens"), col("tt"),
        Tables.r6(col("tokens").cast("double") / col("tt")).as("p"))
      .withColumn("pa", Tables.r6(pow(col("p"), lit(MixAlpha))))
    val norm = withP.agg(sum(col("pa").cast(DecimalType(18, 6))).as("z"))
    val planned = withP.crossJoin(broadcast(norm))
      .withColumn("q", Tables.r6(col("pa") / col("z").cast("double")))
      .withColumn("alloc", Tables.r6(col("q") * lit(4.0) *
        col("tt").cast("double")))
      .withColumn("epochs", Tables.r6(col("alloc") / col("tokens")))
      .withColumn("capped", col("epochs") > lit(4.0))
      .withColumn("eff", Tables.r6(least(col("epochs"), lit(4.0)) *
        col("tokens").cast("double")))
      .localCheckpoint(true) // ≤ #sources rows; freed fold + emission
    val freed = planned.agg(Tables.r6(
      sum(Tables.r6(greatest(col("alloc") - col("eff"), lit(0.0)))
        .cast(DecimalType(18, 6))).cast("double")).as("freed_budget"))
    planned.crossJoin(broadcast(freed))
      .select(col("source"), col("tokens"), col("q"), col("alloc"),
        col("epochs"), col("capped"), col("eff").as("effective_tokens"),
        col("freed_budget"))
      .orderBy("source")
  }

  val entries: Seq[Q] = Seq(
    Q("q190_text_novelty", q190 _, Some(
      "WITH s AS (SELECT doc_id, str_split(text, ' ') AS ts FROM documents " +
        "WHERE len(str_split(text, ' ')) >= 5), " +
        "gr AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ts) - 3), i -> " +
        "ts[CAST(i AS INT)] || ' ' || ts[CAST(i + 1 AS INT)] || ' ' || ts[CAST(i + 2 AS INT)] || ' ' || " +
        "ts[CAST(i + 3 AS INT)] || ' ' || ts[CAST(i + 4 AS INT)]))) AS g FROM s), " +
        "f AS (SELECT g, MIN(doc_id) AS first_doc FROM gr GROUP BY g) " +
        "SELECT gr.doc_id, COUNT(*) AS n_grams, " +
        "CAST(SUM(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel, " +
        Tables.r6sql("CAST(SUM(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END) AS BIGINT) / COUNT(*)") +
        " AS novelty FROM gr JOIN f USING (g) GROUP BY gr.doc_id ORDER BY gr.doc_id")),
    Q("q150_curation_pipeline", q150 _, Some(
      "WITH flagged AS MATERIALIZED (SELECT doc_id, lang, text, n_chars, " +
        "ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) > 1 AS drop_exact " +
        "FROM documents), " +
        "keepers AS MATERIALIZED (SELECT doc_id, text FROM flagged WHERE NOT drop_exact), " +
        NearDup.simhashCtes("keepers") + ", " +
        "banded AS MATERIALIZED (SELECT doc_id, simhash, b, " +
        "(simhash >> CAST(b * 8 AS INT)) & 255 AS k " +
        "FROM sh CROSS JOIN range(0, 4) r(b)), " +
        "near AS (SELECT DISTINCT b2.doc_id FROM banded b1 " +
        "JOIN banded b2 ON b1.b = b2.b AND b1.k = b2.k AND b1.doc_id < b2.doc_id " +
        "WHERE bit_count(xor(b1.simhash, b2.simhash)) <= 3), " +
        "scored AS (SELECT f.lang, f.doc_id, f.drop_exact, " +
        "(near.doc_id IS NOT NULL) AS drop_near, " +
        "len(str_split(f.text, ' ')) AS n_tokens, " +
        Tables.r6sql("0.001 * n_chars + 0.5 * (CAST(len(list_distinct(str_split(f.text, ' '))) AS DOUBLE) " +
          "/ len(str_split(f.text, ' ')))") + " AS q " +
        "FROM flagged f LEFT JOIN near ON f.doc_id = near.doc_id) " +
        "SELECT lang, COUNT(*) AS n_docs, " +
        "CAST(SUM(CASE WHEN drop_exact THEN 1 ELSE 0 END) AS BIGINT) AS n_drop_exact, " +
        "CAST(SUM(CASE WHEN drop_near THEN 1 ELSE 0 END) AS BIGINT) AS n_drop_near, " +
        "CAST(SUM(CASE WHEN NOT drop_exact AND NOT drop_near AND q < 0.47 THEN 1 ELSE 0 END) AS BIGINT) AS n_drop_quality, " +
        "CAST(SUM(CASE WHEN NOT drop_exact AND NOT drop_near AND q >= 0.47 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, " +
        "CAST(SUM(CASE WHEN NOT drop_exact AND NOT drop_near AND q >= 0.47 THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens " +
        "FROM scored GROUP BY lang ORDER BY lang")),
    Q("q148_sample_group_k", q148 _, Some(
      "SELECT lang, rn, doc_id FROM (" +
        "SELECT lang, doc_id, CAST(ROW_NUMBER() OVER (PARTITION BY lang " +
        "ORDER BY md5('gk:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn " +
        "FROM documents) WHERE rn <= 10 ORDER BY lang, rn")),
    Q("q310_eval_ngram_coverage", q310 _, Some(
      s"WITH $bucketCte, " +
        "s AS (SELECT doc_id, bucket, str_split(text, ' ') AS ts FROM d " +
        "WHERE len(str_split(text, ' ')) >= 5), " +
        "g AS (SELECT doc_id, bucket, unnest(list_distinct(list_transform(range(1, len(ts) - 3), i -> " +
        "ts[CAST(i AS INT)] || ' ' || ts[CAST(i + 1 AS INT)] || ' ' || ts[CAST(i + 2 AS INT)] || ' ' || " +
        "ts[CAST(i + 3 AS INT)] || ' ' || ts[CAST(i + 4 AS INT)]))) AS g FROM s), " +
        "tr AS (SELECT DISTINCT g FROM g WHERE bucket < 90), " +
        "per AS (SELECT t.doc_id, COUNT(*) AS n_grams, " +
        "SUM(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS n_covered " +
        "FROM g t LEFT JOIN tr ON t.g = tr.g WHERE t.bucket >= 90 GROUP BY t.doc_id) " +
        "SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, " +
        "CAST(n_covered AS BIGINT) AS n_covered, " +
        Tables.meanDSql("n_covered", "n_grams") + " AS coverage " +
        "FROM per ORDER BY doc_id")),
    Q("q104_decontamination", q104 _, Some(
      s"WITH $bucketCte, " +
        "s AS (SELECT doc_id, bucket, str_split(text, ' ') AS ts FROM d " +
        "WHERE len(str_split(text, ' ')) >= 5), " +
        "g AS (SELECT doc_id, bucket, unnest(list_distinct(list_transform(range(1, len(ts) - 3), i -> " +
        "ts[CAST(i AS INT)] || ' ' || ts[CAST(i + 1 AS INT)] || ' ' || ts[CAST(i + 2 AS INT)] || ' ' || " +
        "ts[CAST(i + 3 AS INT)] || ' ' || ts[CAST(i + 4 AS INT)]))) AS g FROM s), " +
        "ev AS (SELECT DISTINCT g FROM g WHERE bucket >= 90), " +
        "hits AS (SELECT t.doc_id, COUNT(*) AS n_overlap FROM g t JOIN ev USING (g) " +
        "WHERE t.bucket < 90 GROUP BY t.doc_id) " +
        "SELECT d.doc_id, CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap, " +
        "COALESCE(h.n_overlap, 0) > 0 AS contaminated " +
        "FROM d LEFT JOIN hits h USING (doc_id) WHERE d.bucket < 90 ORDER BY doc_id")),
    Q("q105_pack_sequences", q105 _, Some(
      "WITH t AS (SELECT doc_id, CAST(len(str_split(text, ' ')) AS BIGINT) AS tok, " +
        "md5('pack:' || CAST(doc_id AS VARCHAR)) AS h FROM documents), " +
        "b AS (SELECT doc_id, tok, h, CAST(" + hexBucketSql(PackBuckets, "h") + " AS BIGINT) AS bucket FROM t), " +
        "c AS (SELECT bucket, tok, CAST(SUM(tok) OVER (PARTITION BY bucket ORDER BY h, doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM b) " +
        s"SELECT bucket, (cum - tok) // $PackLen AS bin, COUNT(*) AS n_docs, " +
        "CAST(SUM(tok) AS BIGINT) AS tokens_total, " +
        Tables.r6sql(s"CAST(SUM(tok) AS DOUBLE) / $PackLen") + " AS fill_ratio " +
        "FROM c GROUP BY bucket, bin ORDER BY bucket, bin")),
    // same integer thresholds (R, t_b) and the same md5 'shape:' filter
    Q("q338_length_reshape", q338 _, Some(
      "WITH d AS (SELECT doc_id, n_chars // 40 AS bucket, " +
        "GREATEST(16 - n_chars // 40, 1) AS w FROM documents), " +
        "counts AS (SELECT bucket, w, COUNT(*) AS n_docs FROM d GROUP BY 1, 2), " +
        "rates AS (SELECT bucket, w, n_docs, " +
        "((SELECT MIN((n_docs * 10000) // w) FROM counts) * w) // n_docs AS thresh FROM counts), " +
        "u AS (SELECT d.bucket, " +
        "((instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 4096 + " +
        "(instr('0123456789abcdef', substring(h, 2, 1)) - 1) * 256 + " +
        "(instr('0123456789abcdef', substring(h, 3, 1)) - 1) * 16 + " +
        "(instr('0123456789abcdef', substring(h, 4, 1)) - 1)) % 10000 AS u " +
        "FROM (SELECT doc_id, bucket, md5('shape:' || CAST(doc_id AS VARCHAR)) AS h FROM d) d), " +
        "k AS (SELECT u.bucket, COUNT(*) AS kept FROM u JOIN rates ON u.bucket = rates.bucket " +
        "WHERE u.u < rates.thresh GROUP BY 1) " +
        "SELECT rates.bucket, rates.w, rates.n_docs, rates.thresh, " +
        "COALESCE(k.kept, 0) AS kept FROM rates LEFT JOIN k ON rates.bucket = k.bucket " +
        "ORDER BY rates.bucket")),
    Q("q344_quantile_normalize", q344 _, Some(
      "WITH perval AS (SELECT source, n_chars AS v, COUNT(*) AS n " +
        "FROM documents GROUP BY 1, 2), " +
        "cum AS (SELECT source, v, n, CAST(SUM(n) OVER " +
        "(PARTITION BY source ORDER BY v) AS BIGINT) AS cum_n FROM perval), " +
        "tot AS (SELECT source, MAX(cum_n) AS ns FROM cum GROUP BY 1), " +
        "grid AS (SELECT range AS g FROM range(1, 21)), " +
        "srcq AS (SELECT c.source, grid.g AS g, MIN(v) AS qv " +
        "FROM cum c JOIN tot t USING (source) CROSS JOIN grid " +
        "WHERE c.cum_n * 20 >= grid.g * t.ns GROUP BY 1, 2), " +
        "ref AS (SELECT g, " + Tables.meanDSql("SUM(qv)", "COUNT(*)") +
        " AS ref_len FROM srcq GROUP BY 1), " +
        "dd AS (SELECT doc_id, d.source AS source, d.n_chars AS n_chars, " +
        "CAST((cum_n * 20 + ns - 1) // ns AS BIGINT) AS g " +
        "FROM documents d JOIN cum c ON d.source = c.source AND d.n_chars = c.v " +
        "JOIN tot t ON d.source = t.source) " +
        "SELECT doc_id, source, n_chars, g, ref_len " +
        "FROM dd JOIN ref USING (g) ORDER BY doc_id")),
    Q("q109_corpus_rebalance", q109 _, Some(
      "WITH counts AS (SELECT lang, COUNT(*) AS lang_n FROM documents GROUP BY lang), " +
        "rates AS (SELECT lang, lang_n, " +
        "((SELECT MIN(lang_n) FROM counts) * 10000) // lang_n AS thresh FROM counts), " +
        "b AS (SELECT doc_id, lang, " +
        "((instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 4096 + " +
        "(instr('0123456789abcdef', substring(h, 2, 1)) - 1) * 256 + " +
        "(instr('0123456789abcdef', substring(h, 3, 1)) - 1) * 16 + " +
        "(instr('0123456789abcdef', substring(h, 4, 1)) - 1)) % 10000 AS bucket " +
        "FROM (SELECT doc_id, lang, md5('bal:' || CAST(doc_id AS VARCHAR)) AS h FROM documents)) " +
        "SELECT b.lang, COUNT(*) AS kept, MIN(r.lang_n) AS orig, " +
        Tables.r6sql("MIN(r.thresh) / 10000.0") + " AS rate " +
        "FROM b JOIN rates r ON b.lang = r.lang WHERE b.bucket < r.thresh " +
        "GROUP BY b.lang ORDER BY b.lang")),
    Q("q127_sample_weighted", q127 _, Some(
      "SELECT doc_id, lang, n_chars, aes_key, rn FROM (" +
        "SELECT doc_id, lang, n_chars, aes_key, " +
        "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY aes_key DESC, doc_id) AS rn FROM (" +
        "SELECT doc_id, lang, n_chars, " +
        Tables.r6sql(
          "LN(CAST(((doc_id % 1000003) * 2654435761) % 1000003 + 1 AS DOUBLE) / 1000004.0) " +
            "/ GREATEST(n_chars, 1)") + " AS aes_key " +
        "FROM documents)) WHERE rn <= 5 ORDER BY lang, rn")),
    Q("q178_dataset_mixture", q178 _, Some {
      val w = "CAST(CAST(sqrt(CAST(n_docs AS DOUBLE)) AS DECIMAL(18,4)) AS DOUBLE) " +
        "/ CAST(sq_sum AS DOUBLE)"
      "WITH s AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source), " +
        "t AS (SELECT SUM(n_docs) AS n_total, " +
        "SUM(CAST(sqrt(CAST(n_docs AS DOUBLE)) AS DECIMAL(18,4))) AS sq_sum FROM s) " +
        "SELECT source, n_docs, " +
        Tables.r6sql("CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE)") + " AS raw_share, " +
        Tables.r6sql(w) + " AS weight, " +
        Tables.r6sql(s"($w * CAST(n_total AS DOUBLE)) / CAST(n_docs AS DOUBLE)") +
        " AS sample_rate, " +
        Tables.r6sql(s"$w * CAST(1000 AS DOUBLE)") + " AS exp_docs_1k " +
        "FROM s CROSS JOIN t ORDER BY source"
    }),
    Q("q322_dataset_card", q322 _, Some(q322Sql)),
    Q("q320_group_split_leakage", q320 _, Some(
      "WITH d AS (SELECT doc_id, text, " +
        hexBucketSql(100, "md5(source)") + " AS bucket FROM documents), " +
        "s AS (SELECT doc_id, bucket, str_split(text, ' ') AS ts FROM d " +
        "WHERE len(str_split(text, ' ')) >= 5), " +
        "g AS (SELECT doc_id, bucket, unnest(list_distinct(list_transform(range(1, len(ts) - 3), i -> " +
        "ts[CAST(i AS INT)] || ' ' || ts[CAST(i + 1 AS INT)] || ' ' || ts[CAST(i + 2 AS INT)] || ' ' || " +
        "ts[CAST(i + 3 AS INT)] || ' ' || ts[CAST(i + 4 AS INT)]))) AS g FROM s), " +
        "sp AS (SELECT doc_id, CASE WHEN bucket < 80 THEN 'train' " +
        "WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split, g FROM g), " +
        "tr AS (SELECT DISTINCT g FROM sp WHERE split = 'train'), " +
        "pd AS (SELECT split, sp.doc_id, COUNT(*) AS n_grams, " +
        "CAST(SUM(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit " +
        "FROM sp LEFT JOIN tr ON sp.g = tr.g " +
        "WHERE split <> 'train' GROUP BY split, sp.doc_id) " +
        "SELECT split, COUNT(*) AS n_docs, " +
        "CAST(SUM(CASE WHEN n_hit > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky, " +
        Tables.r6sql("CAST(SUM(CASE WHEN n_hit > 0 THEN 1 ELSE 0 END) AS DOUBLE) / " +
          "CAST(COUNT(*) AS DOUBLE)") + " AS leak_rate, " +
        Tables.r6sql("CAST(SUM(n_hit) AS DOUBLE) / CAST(SUM(n_grams) AS DOUBLE)") +
        " AS gram_containment " +
        "FROM pd GROUP BY split ORDER BY split")),
    Q("q182_split_leakage", q182 _, Some(
      s"WITH $bucketCte, " +
        "s AS (SELECT doc_id, bucket, str_split(text, ' ') AS ts FROM d " +
        "WHERE len(str_split(text, ' ')) >= 5), " +
        "g AS (SELECT doc_id, bucket, unnest(list_distinct(list_transform(range(1, len(ts) - 3), i -> " +
        "ts[CAST(i AS INT)] || ' ' || ts[CAST(i + 1 AS INT)] || ' ' || ts[CAST(i + 2 AS INT)] || ' ' || " +
        "ts[CAST(i + 3 AS INT)] || ' ' || ts[CAST(i + 4 AS INT)]))) AS g FROM s), " +
        "sp AS (SELECT doc_id, CASE WHEN bucket < 80 THEN 'train' " +
        "WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split, g FROM g), " +
        "tr AS (SELECT DISTINCT g FROM sp WHERE split = 'train'), " +
        "pd AS (SELECT split, sp.doc_id, COUNT(*) AS n_grams, " +
        "CAST(SUM(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit " +
        "FROM sp LEFT JOIN tr ON sp.g = tr.g " +
        "WHERE split <> 'train' GROUP BY split, sp.doc_id) " +
        "SELECT split, COUNT(*) AS n_docs, " +
        "CAST(SUM(CASE WHEN n_hit > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky, " +
        Tables.r6sql("CAST(SUM(CASE WHEN n_hit > 0 THEN 1 ELSE 0 END) AS DOUBLE) / " +
          "CAST(COUNT(*) AS DOUBLE)") + " AS leak_rate, " +
        Tables.r6sql("CAST(SUM(n_hit) AS DOUBLE) / CAST(SUM(n_grams) AS DOUBLE)") +
        " AS gram_containment " +
        "FROM pd GROUP BY split ORDER BY split")),
    Q("q271_corpus_budget_select", q271 _, Some(
      "WITH s AS (SELECT doc_id, source, " +
        "CAST(len(str_split(text, ' ')) AS BIGINT) AS tokens, " +
        "(1000 * len(list_distinct(str_split(text, ' ')))) // " +
        "len(str_split(text, ' ')) AS score FROM documents), " +
        "b AS (SELECT source, CAST(SUM(tokens) AS BIGINT) // 4 AS budget " +
        "FROM s GROUP BY 1), " +
        "c AS (SELECT source, tokens, SUM(tokens) OVER (PARTITION BY source " +
        "ORDER BY score DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM s), " +
        "k AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept, " +
        "CAST(SUM(tokens) AS BIGINT) AS tokens_kept " +
        "FROM c JOIN b USING (source) WHERE cum <= budget GROUP BY 1) " +
        "SELECT b.source, b.budget, COALESCE(k.n_kept, 0) AS n_kept, " +
        "CAST(COALESCE(k.tokens_kept, 0) AS BIGINT) AS tokens_kept, " +
        Tables.r6sql("COALESCE(k.tokens_kept, 0) / b.budget") + " AS utilization " +
        "FROM b LEFT JOIN k USING (source) ORDER BY source")),
    Q("q282_dsir_importance", q282 _, Some(
      "WITH d AS (SELECT doc_id, str_split(text, ' ') AS ts, " +
        "md5(CAST(doc_id AS VARCHAR)) AS h FROM documents), " +
        "db AS (SELECT doc_id, ts, " + hexBucketSql(100, "h") +
        " AS split_b FROM d), " +
        "tf AS MATERIALIZED (SELECT doc_id, split_b, " +
        hexBucketSql(DsirBuckets, "md5(t)") + " AS fb FROM (" +
        "SELECT doc_id, split_b, unnest(ts) AS t FROM db)), " +
        "tgt AS (SELECT fb, CAST(COUNT(*) AS BIGINT) AS ct FROM tf " +
        "WHERE split_b >= 90 GROUP BY fb), " +
        "raw AS (SELECT fb, CAST(COUNT(*) AS BIGINT) AS cr FROM tf " +
        "WHERE split_b < 90 GROUP BY fb), " +
        "tots AS (SELECT (SELECT CAST(SUM(ct) AS BIGINT) FROM tgt) AS tt, " +
        "(SELECT CAST(SUM(cr) AS BIGINT) FROM raw) AS tr), " +
        "ratio AS (SELECT COALESCE(tgt.fb, raw.fb) AS fb, CAST(" +
        Tables.r6sql(s"LN((COALESCE(ct, 0) + 1.0) / (tt + $DsirBuckets.0)) - " +
          s"LN((COALESCE(cr, 0) + 1.0) / (tr + $DsirBuckets.0))") +
        " AS DECIMAL(18,6)) AS lr " +
        "FROM tgt FULL OUTER JOIN raw ON tgt.fb = raw.fb CROSS JOIN tots), " +
        "pd AS (SELECT doc_id, fb, CAST(COUNT(*) AS BIGINT) AS cf FROM tf " +
        "WHERE split_b < 90 GROUP BY 1, 2) " +
        "SELECT doc_id, CAST(SUM(cf) AS BIGINT) AS n_tok, " +
        "CAST(SUM(cf * lr) AS DOUBLE) AS lw, SUM(cf * lr) > 0 AS selected " +
        "FROM pd JOIN ratio USING (fb) GROUP BY doc_id ORDER BY doc_id")),
    Q("q286_curriculum_order", q286 _, Some(
      "WITH d AS (SELECT doc_id, " +
        s"least(CAST(${CurBands - 1} AS BIGINT), " +
        s"CAST(len(str_split(text, ' ')) // $CurBandTokens AS BIGINT)) AS band, " +
        "md5('cur:' || CAST(doc_id AS VARCHAR)) AS hh FROM documents) " +
        "SELECT doc_id, band, " +
        "CAST(ROW_NUMBER() OVER (ORDER BY band, hh, doc_id) AS BIGINT) AS pos " +
        "FROM d ORDER BY pos")),
    Q("q289_mixture_temperature", q289 _, Some(
      "WITH s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS tokens " +
        "FROM documents GROUP BY source), " +
        "tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS tt FROM s), " +
        "wp AS (SELECT source, n_docs, tokens, " +
        Tables.r6sql("CAST(tokens AS DOUBLE) / tt") + " AS p " +
        "FROM s CROSS JOIN tot), " +
        s"wpa AS (SELECT *, ${Tables.r6sql(s"POWER(p, $MixAlpha)")} AS pa FROM wp), " +
        "norm AS (SELECT SUM(CAST(pa AS DECIMAL(18,6))) AS z FROM wpa) " +
        "SELECT source, n_docs, tokens, p, " +
        Tables.r6sql("pa / CAST(z AS DOUBLE)") + " AS q, " +
        Tables.r6sql(s"${Tables.r6sql("pa / CAST(z AS DOUBLE)")} / p") + " AS upsample " +
        "FROM wpa CROSS JOIN norm ORDER BY source")),
    Q("q364_mixture_budget", q364 _, Some {
      val qw = Tables.r6sql("pa / CAST(z AS DOUBLE)")
      "WITH s AS (SELECT source, " +
        "CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS tokens " +
        "FROM documents GROUP BY source), " +
        "tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS tt FROM s), " +
        "wp AS (SELECT source, tokens, tt, " +
        Tables.r6sql("CAST(tokens AS DOUBLE) / tt") + " AS p " +
        "FROM s CROSS JOIN tot), " +
        s"wpa AS (SELECT *, ${Tables.r6sql(s"POWER(p, $MixAlpha)")} AS pa FROM wp), " +
        "norm AS (SELECT SUM(CAST(pa AS DECIMAL(18,6))) AS z FROM wpa), " +
        s"pl1 AS (SELECT source, tokens, tt, $qw AS q FROM wpa CROSS JOIN norm), " +
        "pl2 AS (SELECT *, " +
        Tables.r6sql("q * 4.0 * CAST(tt AS DOUBLE)") + " AS alloc FROM pl1), " +
        "pl3 AS (SELECT *, " + Tables.r6sql("alloc / tokens") +
        " AS epochs FROM pl2), " +
        "pl AS (SELECT *, epochs > 4.0 AS capped, " +
        Tables.r6sql("LEAST(epochs, 4.0) * CAST(tokens AS DOUBLE)") +
        " AS eff FROM pl3), " +
        "fr AS (SELECT " + Tables.r6sql("CAST(SUM(CAST(" +
        Tables.r6sql("GREATEST(alloc - eff, 0.0)") +
        " AS DECIMAL(18,6))) AS DOUBLE)") + " AS freed_budget FROM pl) " +
        "SELECT source, tokens, q, alloc, epochs, capped, " +
        "eff AS effective_tokens, freed_budget " +
        "FROM pl CROSS JOIN fr ORDER BY source"
    }),
  )
}
