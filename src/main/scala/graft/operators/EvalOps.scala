package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-evaluation operators (SURVEY.md §2.8b continuation): the
  * metrics a training-data pipeline computes AFTER a model scores a
  * corpus — ROC/AUC, calibration (reliability) bins, and thresholded
  * confusion matrices. The "model" here is a deterministic heuristic
  * score over `documents` (distinct-token ratio, the q65 quality-family
  * signal) against the binary label lang='en', so both engines derive
  * the identical score from raw data and no model artifact is needed.
  *
  * Determinism: the score is quantized to an INTEGER bin
  * `(1000·distinct_tokens) div tokens` ∈ [0,1000] — pure integer math,
  * bit-identical cross-engine (no float ranks, §2.9 R6). Binned AUC is
  * what production eval at corpus scale computes anyway (a total order
  * over 10^11 raw floats is neither needed nor stable).
  *
  * Scale notes: every query is ONE corpus-collapsing groupBy(bin) — map-
  * side combinable, ≤1001-row result — and all curve/threshold math runs
  * on that bounded frame (global windows on it are the q23/q189 bounded-
  * frame exception). The corpus never moves twice.
  */
object EvalOps {

  /** Per-document (bin, pos): integer score bin + binary label. */
  private def scored(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .select(
        expr("(1000 * size(array_distinct(split(text, ' ')))) DIV size(split(text, ' '))")
          .as("bin"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))

  private val scoredSql: String =
    "SELECT (1000 * len(list_distinct(string_split(text, ' ')))) // " +
      "len(string_split(text, ' ')) AS bin, " +
      "CAST(lang = 'en' AS BIGINT) AS pos FROM documents"

  /** Shared per-bin aggregation: npos/nneg counts per score bin of ANY
    * (bin, pos) frame — ONE implementation for the q196/q197/q198 path
    * and prCurveOf (r15 review: the facade carried an inline twin that
    * could drift from the verified query's bin contract). */
  private def binnedOf(scoredDf: DataFrame): DataFrame =
    scoredDf.groupBy("bin")
      .agg(sum(col("pos")).as("npos"),
        (count(lit(1)) - sum(col("pos"))).as("nneg"))

  /** Shared per-bin frame over the house scored(documents) input. */
  private def binned(spark: SparkSession, sfDir: String): DataFrame =
    binnedOf(scored(spark, sfDir))

  private val binnedSql: String =
    s"SELECT bin, CAST(SUM(pos) AS BIGINT) AS npos, " +
      s"CAST(COUNT(*) - SUM(pos) AS BIGINT) AS nneg FROM ($scoredSql) GROUP BY bin"

  /** q196: ROC curve + AUC — descending-score sweep over the bin frame:
    * tpr/fpr after admitting each bin, plus the Mann-Whitney AUC with
    * the standard tie (trapezoid) correction, carried on every row. The
    * AUC numerator is kept EXACT: Σ nneg·(2·cumpos_prev + npos) over
    * bins is pure int64 (tie term ×2 instead of ÷2), divided once at the
    * end by 2·P·N.
    *
    * Scale: one groupBy(bin) shuffle; windows + the AUC fold run on the
    * ≤1001-row frame; P/N/auc attach as broadcast 1-row aggregates. */
  private def q196(spark: SparkSession, sfDir: String): DataFrame = {
    val b = binned(spark, sfDir).localCheckpoint(true) // ≤1001 rows; 3 consumers
    val w = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = b.agg(sum("npos").as("p_tot"), sum("nneg").as("n_tot"))
    val aucNum = b
      .withColumn("cumpos_prev", coalesce(sum("npos").over(wPrev), lit(0L)))
      .agg(sum(col("nneg") * (lit(2L) * col("cumpos_prev") + col("npos"))).as("auc_num2"))
    b.withColumn("cumpos", sum("npos").over(w))
      .withColumn("cumneg", sum("nneg").over(w))
      .crossJoin(broadcast(totals)).crossJoin(broadcast(aucNum))
      .select(col("bin"), col("npos"), col("nneg"),
        Tables.r6(col("cumpos").cast("double") / col("p_tot")).as("tpr"),
        Tables.r6(col("cumneg").cast("double") / col("n_tot")).as("fpr"),
        Tables.r6(col("auc_num2").cast("double") /
          (lit(2.0) * col("p_tot") * col("n_tot"))).as("auc"))
      .orderBy("bin")
  }

  /** q255: precision–recall curve + average precision over the same
    * bounded bin frame as q196 — the metric that matters when positives
    * are rare (ROC's FPR denominator hides minority-class failure; PR's
    * precision denominator does not, Davis & Goadrich ICML'06). AP is
    * the step-wise sum Σ_b (npos_b / p_tot) · precision_b over bins in
    * descending score order — each term r6-quantized then DECIMAL-summed
    * (§2.9 R1) so partition merge order can't move the result.
    *
    * Scale: identical shape to q196 — ONE corpus-collapsing groupBy to
    * ≤1001 bins, then windows/aggregates on the bounded frame only. */
  /** The PR-curve/AP computation behind q255 AND [[graft.Graft.prCurve]]
    * — one implementation so the facade can't drift from the verified
    * query. `scoredDf` needs (bin, pos); output is unordered (q255 adds
    * its oracle ORDER BY). */
  private[graft] def prCurveOf(scoredDf: DataFrame): DataFrame = {
    val b = binnedOf(scoredDf)
      .localCheckpoint(true)
    val w = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = b.agg(sum("npos").as("p_tot"))
    val d = b.withColumn("cumpos", sum("npos").over(w))
      .withColumn("cumneg", sum("nneg").over(w))
      .crossJoin(broadcast(totals))
      .withColumn("prec",
        Tables.r6(col("cumpos").cast("double") / (col("cumpos") + col("cumneg"))))
      .withColumn("recall", Tables.r6(col("cumpos").cast("double") / col("p_tot")))
      .localCheckpoint(true) // ≤1001 rows; AP aggregate + emission both read it
    val ap = d.agg(sum(Tables.r6(col("npos") * col("prec") / col("p_tot"))
      .cast("decimal(18,6)")).as("ap_dec"))
    d.crossJoin(broadcast(ap))
      .select(col("bin"), col("npos"), col("nneg"), col("prec"), col("recall"),
        Tables.r6(col("ap_dec").cast("double")).as("avg_precision"))
  }

  private def q255(spark: SparkSession, sfDir: String): DataFrame =
    prCurveOf(scored(spark, sfDir)).orderBy("bin")

  /** q197: calibration / reliability bins — score deciles vs observed
    * positive rate. A well-calibrated scorer has mean_pred ≈ pos_rate
    * per decile; the gap column is the per-decile calibration error
    * (its n-weighted sum = ECE). Decile = bin div 100 capped at 9 (bin
    * 1000 folds into the top decile) — integer math end-to-end; means
    * divide exact integer sums once at emission. */
  private def q197(spark: SparkSession, sfDir: String): DataFrame =
    scored(spark, sfDir)
      .groupBy(least(expr("bin DIV 100"), lit(9L)).as("decile"))
      .agg(count(lit(1)).as("n"), sum("pos").as("npos"), sum("bin").as("sbin"))
      .select(col("decile"), col("n"),
        Tables.r6(col("sbin").cast("double") / (col("n") * lit(1000.0))).as("mean_pred"),
        Tables.r6(col("npos").cast("double") / col("n")).as("pos_rate"),
        Tables.r6(col("sbin").cast("double") / (col("n") * lit(1000.0)) -
          col("npos").cast("double") / col("n")).as("gap"))
      .orderBy("decile")

  /** q343: isotonic (PAV) calibration over the score deciles — the
    * calibration MAP the family lacked: q197 only MEASURES per-decile
    * miscalibration and q220 wraps intervals around a regressor; q343
    * produces the monotone score→probability mapping itself (what
    * Zadrozny & Elkan KDD'02 fit before trusting classifier scores as
    * probabilities). Pool-adjacent-violators is textbook-sequential, so
    * we compute the IDENTICAL fit via the minimax identity (Barlow et
    * al. 1972 §1.2): iso(i) = max_{k≤i} min_{j≥i} mean(k..j) — every
    * block mean from cumulative sums, pure relational algebra, no loop.
    *
    * Determinism: block means are exact-int64 ratios r6-quantized; the
    * max/min lattice over them is order-free.
    *
    * Scale: the corpus collapses in ONE groupBy to the 10-decile frame;
    * the cumulative window, the ≤55-span self-join and the ≤550-row
    * minimax grouping all run on constant-bounded frames (q23
    * exception) — B³ work for B = 10 deciles regardless of corpus
    * size. */
  private def q343(spark: SparkSession, sfDir: String): DataFrame = {
    val w10 = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = scored(spark, sfDir)
      .groupBy(least(expr("bin DIV 100"), lit(9L)).as("d"))
      .agg(count(lit(1)).as("w"), sum("pos").as("s"))
      .withColumn("cw", sum("w").over(w10))
      .withColumn("cs", sum("s").over(w10))
      .localCheckpoint(true) // ≤10 rows; spans, anchors + emission read it
    val k = cum.select(col("d").as("kd"), col("w").as("kw"),
      col("s").as("ks"), col("cw").as("kcw"), col("cs").as("kcs"))
    val j = cum.select(col("d").as("jd"), col("cw").as("jcw"), col("cs").as("jcs"))
    val spans = k.join(j, col("kd") <= col("jd"))
      .select(col("kd"), col("jd"),
        Tables.r6((col("jcs") - col("kcs") + col("ks")).cast("double") /
          (col("jcw") - col("kcw") + col("kw"))).as("m"))
    val fit = cum.select(col("d").as("i"))
      .join(spans, col("kd") <= col("i") && col("i") <= col("jd"))
      .groupBy("i", "kd").agg(min("m").as("mn"))
      .groupBy("i").agg(max("mn").as("iso_rate"))
    cum.join(fit, col("d") === col("i"))
      .select(col("d").as("decile"), col("w").as("n"),
        Tables.r6(col("s").cast("double") / col("w")).as("raw_rate"),
        col("iso_rate"))
      .orderBy("decile")
  }

  /** q198: thresholded confusion matrices — precision/recall/F1 at three
    * operating points (bin ≥ 300/500/700). The threshold sweep rides the
    * SAME single bin-frame pass: thresholds explode against the bounded
    * frame (≤1001×3 rows), never against the corpus. F1 uses the
    * division-free form 2·tp/(2·tp+fp+fn) (exact integer denominator;
    * precision/recall guard empty predictions with NULL). */
  private def q198(spark: SparkSession, sfDir: String): DataFrame = {
    val b = binned(spark, sfDir)
    b.select(col("bin"), col("npos"), col("nneg"),
        explode(array(lit(300L), lit(500L), lit(700L))).as("tau"))
      .groupBy("tau")
      .agg(
        sum(when(col("bin") >= col("tau"), col("npos")).otherwise(0L)).as("tp"),
        sum(when(col("bin") >= col("tau"), col("nneg")).otherwise(0L)).as("fp"),
        sum(when(col("bin") < col("tau"), col("npos")).otherwise(0L)).as("fn"),
        sum(when(col("bin") < col("tau"), col("nneg")).otherwise(0L)).as("tn"))
      .select(col("tau"), col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") > 0,
          Tables.r6(col("tp").cast("double") / (col("tp") + col("fp")))).as("precision"),
        when(col("tp") + col("fn") > 0,
          Tables.r6(col("tp").cast("double") / (col("tp") + col("fn")))).as("recall"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
          Tables.r6(lit(2.0) * col("tp") /
            (lit(2L) * col("tp") + col("fp") + col("fn")))).as("f1"))
      .orderBy("tau")
  }

  /** q220: split-conformal prediction intervals (Vovk; Lei et al.
    * JASA'18) — the distribution-free "how wide must my error bars be"
    * calibration the q197 reliability bins can't give a REGRESSOR: the
    * customer md5-bucket 3-way split (train 50 / calibration 25 / test
    * 25) fits a per-segment mean model on train, takes qhat = the 0.9
    * quantile of absolute calibration residuals (global — the standard
    * marginal-coverage form), and audits test coverage of
    * |y − ŷ| ≤ qhat per segment (≈0.9 by the conformal guarantee).
    *
    * Scale: the split is a per-row hash (no shuffle); the model is one
    * segment-keyed agg; qhat is ONE BoundedQuantiles pass (R7) over
    * calibration residuals; coverage is one keyed agg with qhat as a
    * broadcast scalar. */
  private def q220(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables(spark, sfDir, "customer")
      .withColumn("h", expr("md5(cast(c_custkey AS STRING))"))
      .withColumn("bucket", expr(
        "((instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16 + " +
          "(instr('0123456789abcdef', substring(h, 2, 1)) - 1)) % 100"))
      .withColumn("split",
        when(col("bucket") < 50, "train")
          .when(col("bucket") < 75, "cal").otherwise("test"))
      .select(col("c_mktsegment").as("segment"), col("c_acctbal").as("bal"),
        col("split"))
      .transform(graft.plans.CorpusPin.pin) // model, calibration, and test all read it
    val model = cust.filter(col("split") === "train")
      .groupBy("segment")
      .agg(Tables.meanD(sum(Tables.dec(col("bal"))), count(lit(1))).as("mu"),
        count(lit(1)).as("n_train"))
    val cal = cust.filter(col("split") === "cal")
      .join(broadcast(model.select("segment", "mu")), "segment")
      .select(col("segment"), abs(col("bal") - col("mu")).as("r"), lit(0).as("g"))
      .transform(graft.plans.CorpusPin.pin) // BoundedQuantiles scans its input internally
    val qhat = graft.plans.BoundedQuantiles.groupQuantiles(
      cal, Seq("g"), col("r"), Seq(0.9), Seq("qhat"), pin = false)
      .select("qhat")
    val nCal = cal.groupBy("segment").agg(count(lit(1)).as("n_cal"))
    cust.filter(col("split") === "test")
      .join(broadcast(model), "segment")
      .crossJoin(broadcast(qhat))
      .groupBy("segment")
      .agg(max("n_train").as("n_train"), max(col("mu")).as("mu"),
        count(lit(1)).as("n_test"),
        max(Tables.r6(col("qhat"))).as("qhat"),
        sum(when(abs(col("bal") - col("mu")) <= col("qhat"), 1L).otherwise(0L))
          .as("n_covered"))
      .join(broadcast(nCal), "segment")
      .select(col("segment"), col("n_train"), col("n_cal"), col("n_test"),
        col("mu"), col("qhat"),
        Tables.r6(col("n_covered").cast("double") / col("n_test")).as("coverage"))
      .orderBy("segment")
  }

  /** q264: NDCG@5 of the q51 brute-force cosine retrieval, scored against
    * label agreement — the ranking-quality metric (Järvelin & Kekäläinen,
    * TOIS 2002) the eval family lacked: q196/q255 grade a CLASSIFIER's
    * score ordering; NDCG grades a RETRIEVAL's ranked list, position-
    * discounted. Relevance of a retrieved neighbor = 1 iff its label
    * matches the probe's; DCG = Σ rel(r)/log₂(r+1) over ranks 1..5; IDCG
    * places the min(5, n_rel) available relevant docs at the top (n_rel =
    * corpus members of the probe's label minus the probe itself); NDCG =
    * DCG/IDCG.
    *
    * Determinism: rank positions come from q51's 6-dp-rounded-cosine
    * ordering (id tiebreak); each discount term ln(2)/ln(r+1) is rounded
    * to 6 dp and summed as DECIMAL(18,6) — exact, associative, identical
    * cross-engine (ln-parity precedent q116/q154).
    *
    * Scale: the ranked list is 10 probes × 5 rows; label lookups and the
    * per-label corpus counts are equi-joins against it (AQE broadcasts
    * the 50-row side). The only corpus-shaped work is the retrieval
    * itself — swap bruteTopK for q63's IVF probe at scale, the metric
    * layer is unchanged. */
  private def q264(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables(spark, sfDir, "embeddings")
    ndcgOf(LLMPipeline.bruteTopK(spark, emb, col("vec_id") < 10, topK = 5),
      emb.select(col("vec_id").as("id"), col("label")))
  }

  /** Generic form behind q264 and [[graft.Graft.ndcg]]: `ranked` is any
    * (id_a, id_b, rn) retrieval output (rn 1-based per probe); `labels`
    * is (id, label). Binary relevance = label agreement. */
  private[graft] def ndcgOf(ranked: DataFrame, labels: DataFrame): DataFrame = {
    val relCnt = labels.groupBy(col("label").as("lbl")).agg(count(lit(1)).as("n_lbl"))
    val disc = log(lit(2.0)) / log(col("rn").cast("double") + lit(1.0))
    ranked
      .join(labels.select(col("id").as("id_a"), col("label").as("label_a")), Seq("id_a"))
      .join(labels.select(col("id").as("id_b"), col("label").as("label_b")), Seq("id_b"))
      .join(broadcast(relCnt), col("label_a") === col("lbl"))
      .withColumn("nrel", (col("n_lbl") - lit(1)).cast("bigint"))
      .groupBy(col("id_a"), col("label_a"), col("nrel"))
      .agg(
        sum(Tables.r6(when(col("label_a") === col("label_b"), disc)
          .otherwise(lit(0.0))).cast("decimal(18,6)")).as("dcgD"),
        sum(Tables.r6(when(col("rn") <= col("nrel"), disc)
          .otherwise(lit(0.0))).cast("decimal(18,6)")).as("idcgD"))
      .select(col("id_a"), col("label_a"), col("nrel").as("n_rel"),
        Tables.r6(col("dcgD").cast("double")).as("dcg"),
        Tables.r6(col("idcgD").cast("double")).as("idcg"),
        when(col("idcgD").cast("double") > 0,
          Tables.r6(col("dcgD").cast("double") / col("idcgD").cast("double")))
          .as("ndcg"))
      .orderBy("id_a")
  }

  /** q317: group-fairness audit (demographic parity + the EEOC
    * four-fifths rule) — the responsible-AI sibling the eval family
    * (rank q196, calibration q197, conformal q220) lacked: whatever the
    * upstream selector is (here the corpus-standard ≥40-token quality
    * screen, standing in for any classifier/filter), per GROUP (source,
    * the protected-attribute stand-in): selected count, selection rate,
    * the disparate-impact ratio rate/max-group-rate, and the four-fifths
    * flag (ratio < 0.8 — the threshold adverse-impact analyses use).
    * A data-curation pipeline runs exactly this before shipping a
    * filtered corpus: a screen that silently drops one source's docs at
    * 2× the rate of another's is a bias bug no accuracy metric shows.
    *
    * Determinism: counts exact integers; rates r6'd; the ratio composes
    * from already-r6'd values. Scale: ONE map-side-combined corpus
    * groupBy to the ≤|sources| frame; the max rate is a 1-row fold
    * broadcast back — arithmetic on ≤20 rows after the first agg. */
  private def q317(spark: SparkSession, sfDir: String): DataFrame = {
    val per = Tables(spark, sfDir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(when(size(split(col("text"), " ")) >= 40, 1L).otherwise(0L))
          .as("n_selected"))
      .withColumn("sel_rate",
        Tables.r6(col("n_selected").cast("double") / col("n")))
    val mx = per.agg(max("sel_rate").as("max_rate"))
    per.crossJoin(broadcast(mx))
      .select(col("source"), col("n"), col("n_selected"), col("sel_rate"),
        Tables.r6(col("sel_rate") / col("max_rate")).as("di_ratio"))
      .withColumn("four_fifths_fail", col("di_ratio") < 0.8)
      .orderBy("source")
  }

  private val q317Sql: String =
    "WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n, " +
      "CAST(SUM(CASE WHEN len(str_split(text, ' ')) >= 40 THEN 1 ELSE 0 END) AS BIGINT) AS n_selected " +
      "FROM documents GROUP BY 1), " +
      "r AS (SELECT source, n, n_selected, " +
      Tables.r6sql("CAST(n_selected AS DOUBLE) / n") + " AS sel_rate FROM per), " +
      "mx AS (SELECT MAX(sel_rate) AS max_rate FROM r) " +
      "SELECT source, n, n_selected, sel_rate, " +
      Tables.r6sql("sel_rate / max_rate") + " AS di_ratio, " +
      Tables.r6sql("sel_rate / max_rate") + " < 0.8 AS four_fifths_fail " +
      "FROM r CROSS JOIN mx ORDER BY source"

  val entries: Seq[Q] = Seq(
    Q("q317_fairness_parity", q317 _, Some(q317Sql)),
    Q("q220_eval_conformal", q220 _, Some {
      val bucket = "((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 + " +
        "(strpos('0123456789abcdef', substr(h, 2, 1)) - 1)) % 100"
      "WITH c AS (SELECT c_mktsegment AS segment, c_acctbal AS bal, " +
        s"CASE WHEN $bucket < 50 THEN 'train' WHEN $bucket < 75 THEN 'cal' " +
        "ELSE 'test' END AS split FROM " +
        "(SELECT c_mktsegment, c_acctbal, md5(CAST(c_custkey AS VARCHAR)) AS h " +
        "FROM customer)), " +
        "m AS (SELECT segment, " +
        Tables.meanDSql("SUM(CAST(bal AS DECIMAL(18,4)))", "COUNT(*)") + " AS mu, " +
        "CAST(COUNT(*) AS BIGINT) AS n_train FROM c WHERE split = 'train' GROUP BY 1), " +
        "cal AS (SELECT c.segment, ABS(bal - mu) AS r FROM c " +
        "JOIN m ON c.segment = m.segment WHERE split = 'cal'), " +
        "q AS (SELECT quantile_cont(r, 0.9) AS qhat FROM cal), " +
        "nc AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_cal " +
        "FROM cal GROUP BY 1), " +
        "t AS (SELECT c.segment, CAST(COUNT(*) AS BIGINT) AS n_test, " +
        s"MAX(${Tables.r6sql("qhat")}) AS qhat, " +
        "CAST(SUM(CASE WHEN ABS(bal - mu) <= qhat THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_covered FROM c JOIN m ON c.segment = m.segment CROSS JOIN q " +
        "WHERE split = 'test' GROUP BY 1) " +
        "SELECT m.segment, m.n_train, nc.n_cal, t.n_test, m.mu, t.qhat, " +
        Tables.r6sql("CAST(n_covered AS DOUBLE) / n_test") + " AS coverage " +
        "FROM m JOIN nc ON m.segment = nc.segment " +
        "JOIN t ON m.segment = t.segment ORDER BY m.segment"
    }),
    Q("q196_eval_roc_auc", q196 _, Some(
      s"WITH b AS ($binnedSql), " +
        "c AS (SELECT bin, npos, nneg, " +
        "CAST(SUM(npos) OVER w AS BIGINT) AS cumpos, " +
        "CAST(SUM(nneg) OVER w AS BIGINT) AS cumneg, " +
        "CAST(COALESCE(SUM(npos) OVER wp, 0) AS BIGINT) AS cumpos_prev " +
        "FROM b WINDOW " +
        "w AS (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
        "wp AS (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), " +
        "t AS (SELECT CAST(SUM(npos) AS BIGINT) AS p_tot, " +
        "CAST(SUM(nneg) AS BIGINT) AS n_tot FROM b), " +
        "a AS (SELECT CAST(SUM(nneg * (2 * cumpos_prev + npos)) AS BIGINT) " +
        "AS auc_num2 FROM c) " +
        "SELECT bin, npos, nneg, " +
        Tables.r6sql("CAST(cumpos AS DOUBLE) / p_tot") + " AS tpr, " +
        Tables.r6sql("CAST(cumneg AS DOUBLE) / n_tot") + " AS fpr, " +
        Tables.r6sql("CAST(auc_num2 AS DOUBLE) / (2.0 * p_tot * n_tot)") + " AS auc " +
        "FROM c CROSS JOIN t CROSS JOIN a ORDER BY bin")),
    Q("q255_eval_pr_auc", q255 _, Some(
      s"WITH b AS ($binnedSql), " +
        "c AS (SELECT bin, npos, nneg, " +
        "CAST(SUM(npos) OVER w AS BIGINT) AS cumpos, " +
        "CAST(SUM(nneg) OVER w AS BIGINT) AS cumneg " +
        "FROM b WINDOW " +
        "w AS (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), " +
        "t AS (SELECT CAST(SUM(npos) AS BIGINT) AS p_tot FROM b), " +
        "d AS (SELECT bin, npos, nneg, " +
        Tables.r6sql("CAST(cumpos AS DOUBLE) / (cumpos + cumneg)") + " AS prec, " +
        Tables.r6sql("CAST(cumpos AS DOUBLE) / p_tot") + " AS recall, p_tot " +
        "FROM c CROSS JOIN t), " +
        "a AS (SELECT SUM(CAST(" +
        Tables.r6sql("npos * prec / p_tot") + " AS DECIMAL(18,6))) AS ap_dec FROM d) " +
        "SELECT bin, npos, nneg, prec, recall, " +
        Tables.r6sql("CAST(ap_dec AS DOUBLE)") + " AS avg_precision " +
        "FROM d CROSS JOIN a ORDER BY bin")),
    Q("q343_eval_isotonic", q343 _, Some(
      s"WITH sc AS ($scoredSql), " +
        "bins AS (SELECT LEAST(bin // 100, 9) AS d, COUNT(*) AS w, " +
        "CAST(SUM(pos) AS BIGINT) AS s FROM sc GROUP BY 1), " +
        "cum AS (SELECT d, w, s, SUM(w) OVER (ORDER BY d) AS cw, " +
        "SUM(s) OVER (ORDER BY d) AS cs FROM bins), " +
        "spans AS (SELECT a.d AS kd, b.d AS jd, " +
        Tables.r6sql("CAST(b.cs - a.cs + a.s AS DOUBLE) / (b.cw - a.cw + a.w)") +
        " AS m FROM cum a JOIN cum b ON a.d <= b.d), " +
        "fitk AS (SELECT i.d AS i, sp.kd, MIN(sp.m) AS mn FROM cum i " +
        "JOIN spans sp ON sp.kd <= i.d AND i.d <= sp.jd GROUP BY 1, 2), " +
        "fit AS (SELECT i, MAX(mn) AS iso_rate FROM fitk GROUP BY 1) " +
        "SELECT c.d AS decile, CAST(c.w AS BIGINT) AS n, " +
        Tables.r6sql("CAST(c.s AS DOUBLE) / c.w") + " AS raw_rate, iso_rate " +
        "FROM cum c JOIN fit f ON c.d = f.i ORDER BY decile")),
    Q("q197_eval_calibration", q197 _, Some(
      s"WITH s AS ($scoredSql) " +
        "SELECT LEAST(bin // 100, 9) AS decile, " +
        "CAST(COUNT(*) AS BIGINT) AS n, " +
        Tables.r6sql("CAST(SUM(bin) AS DOUBLE) / (COUNT(*) * 1000.0)") + " AS mean_pred, " +
        Tables.r6sql("CAST(SUM(pos) AS DOUBLE) / COUNT(*)") + " AS pos_rate, " +
        Tables.r6sql("CAST(SUM(bin) AS DOUBLE) / (COUNT(*) * 1000.0) - " +
          "CAST(SUM(pos) AS DOUBLE) / COUNT(*)") + " AS gap " +
        "FROM s GROUP BY 1 ORDER BY decile")),
    Q("q198_eval_confusion", q198 _, Some(
      s"WITH b AS ($binnedSql), " +
        "m AS (SELECT tau, " +
        "CAST(SUM(CASE WHEN bin >= tau THEN npos ELSE 0 END) AS BIGINT) AS tp, " +
        "CAST(SUM(CASE WHEN bin >= tau THEN nneg ELSE 0 END) AS BIGINT) AS fp, " +
        "CAST(SUM(CASE WHEN bin < tau THEN npos ELSE 0 END) AS BIGINT) AS fn, " +
        "CAST(SUM(CASE WHEN bin < tau THEN nneg ELSE 0 END) AS BIGINT) AS tn " +
        "FROM b CROSS JOIN (VALUES (CAST(300 AS BIGINT)), (CAST(500 AS BIGINT)), " +
        "(CAST(700 AS BIGINT))) t(tau) GROUP BY tau) " +
        "SELECT tau, tp, fp, fn, tn, " +
        "CASE WHEN tp + fp > 0 THEN " +
        Tables.r6sql("CAST(tp AS DOUBLE) / (tp + fp)") + " END AS precision, " +
        "CASE WHEN tp + fn > 0 THEN " +
        Tables.r6sql("CAST(tp AS DOUBLE) / (tp + fn)") + " END AS recall, " +
        "CASE WHEN 2 * tp + fp + fn > 0 THEN " +
        Tables.r6sql("2.0 * tp / (2 * tp + fp + fn)") + " END AS f1 " +
        "FROM m ORDER BY tau")),
    Q("q264_eval_ndcg", q264 _, Some {
      val dot = LLMPipeline.dotSql("a", "b")
      val na = LLMPipeline.dotSql("a", "a")
      val nb = LLMPipeline.dotSql("b", "b")
      val disc = "LN(2.0) / LN(rn + 1.0)"
      "WITH ranked AS (SELECT id_a, id_b, rn FROM (SELECT id_a, id_b, " +
        "ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rn FROM (" +
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        Tables.r6sql(s"$dot / (sqrt($na) * sqrt($nb))") + " AS cos " +
        "FROM embeddings a, embeddings b " +
        "WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id)) WHERE rn <= 5), " +
        "lbl AS (SELECT vec_id, label FROM embeddings), " +
        "cnt AS (SELECT label AS lbl, COUNT(*) AS n_lbl FROM embeddings GROUP BY 1), " +
        "terms AS (SELECT r.id_a, la.label AS label_a, " +
        "CAST(n_lbl - 1 AS BIGINT) AS nrel, rn, " +
        s"CASE WHEN la.label = lb.label THEN " +
        Tables.r6sql(disc) + " ELSE 0.0 END AS term, " +
        s"CASE WHEN rn <= n_lbl - 1 THEN " +
        Tables.r6sql(disc) + " ELSE 0.0 END AS ideal " +
        "FROM ranked r JOIN lbl la ON r.id_a = la.vec_id " +
        "JOIN lbl lb ON r.id_b = lb.vec_id JOIN cnt ON la.label = cnt.lbl), " +
        "agg AS (SELECT id_a, label_a, nrel AS n_rel, " +
        "SUM(CAST(term AS DECIMAL(18,6))) AS dcgD, " +
        "SUM(CAST(ideal AS DECIMAL(18,6))) AS idcgD FROM terms GROUP BY 1, 2, 3) " +
        "SELECT id_a, label_a, n_rel, " +
        Tables.r6sql("CAST(dcgD AS DOUBLE)") + " AS dcg, " +
        Tables.r6sql("CAST(idcgD AS DOUBLE)") + " AS idcg, " +
        "CASE WHEN CAST(idcgD AS DOUBLE) > 0 THEN " +
        Tables.r6sql("CAST(dcgD AS DOUBLE) / CAST(idcgD AS DOUBLE)") +
        " END AS ndcg FROM agg ORDER BY id_a"
    }))
}
