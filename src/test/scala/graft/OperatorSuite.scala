package graft

import org.scalatest.funsuite.AnyFunSuite

/** Per-operator smoke + spot checks on sf0.001 (SURVEY.md §5.1). The deep
  * correctness gate is the DuckDB oracle (dev/check.py); here we assert
  * the queries run, have sane shapes, and a few independently computed
  * values. */
class OperatorSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sfDir

  test("every registered query runs; single-partition exchanges only where justified") {
    // a SinglePartition exchange is the q48-class scale bug (everything
    // through one task) — EXCEPT where what flows through it is bounded:
    // global scalar aggregates merge one partial row per partition, and
    // q23's global window sorts the pre-aggregated DAILY series, bounded
    // by the calendar, not the data volume. Every other query must stay
    // free of single-partition stages.
    val justified = Set(
      "q23_win_moving_avg",      // calendar-bounded daily-series window
      "q61_dedup_ngram_jaccard", // ndocs 1-row aggregate (df-cap)
      "q77_text_tfidf",          // corpus-size 1-row aggregate
      "q80_anon_tcloseness",     // n_total 1-row aggregate
      "q100_quality_audit",      // global metric aggregates
      "q109_corpus_rebalance",   // min-class-count 1-row aggregate
      "q111_agg_sketch_distinct", // global union of per-day KB sketches
      "q113_agg_sketch_overlap", // global algebra over 2 sketch rows
      "q123_agg_heavy_hitters",  // global merge of k-bounded MG summaries
      "q106_kmeans",             // k-row seed-labelling window (k = constant 8)
      "q133_agg_chi_square",     // n_total 1-row aggregate
      "q136_ab_test",            // median + final 2-arm fold: 1-row aggregates
      "q137_rfm_scoring",        // quintile-cutpoint 1-row percentile aggregate
      "q139_skew_report",        // per-table 1-row profile folds
      "q141_anon_utility",       // cell-stats 1-row fold
      "q142_equidepth_bins",     // global BoundedQuantiles fold: histogram
                                 // window ≤ 4096 rows + 7-cut 1-row result
      "q149_token_pmi",          // total-bigram-count 1-row aggregate
      "q337_kneser_ney_lm",      // bigram-type-total 1-row aggregate
      "q338_length_reshape",     // rejection-scaling 1-row MIN over buckets
      "q364_mixture_budget",     // token-total / normalizer / freed 1-row
                                 // folds over the ≤#sources frame
      "q343_eval_isotonic",      // cumulative window + minimax self-joins
                                 // over the CONSTANT 10-decile frame
                                 // (q23 exception)
      "q365_ab_cluster_robust",  // the ONE grand fold over the ≤25-row
                                 // cluster frame
      "q366_ab_icc",             // same ≤25-row cluster-frame grand fold
      "q358_ab_power_mde",       // the ONE 3-term moment grand aggregate;
                                 // 5 rows explode from a constant grid
      "q356_ab_poststrat",       // split-day 1-row fold + estimator folds
                                 // over the ≤4-stratum frame
      "q355_stats_jackknife",    // totals / theta-bar / SE 1-row folds over
                                 // the CONSTANT 32-bucket frame
      "q353_ab_ratio_delta",     // the ONE 12-term moment grand aggregate
                                 // (map-side combined); 2 rows unpivot
      "q352_ab_cuped",           // day-bounds 1-row fold + the ONE 12-term
                                 // moment grand aggregate (map-side combined)
      "q351_ab_health",          // the ONE 14-term moment grand aggregate —
                                 // 1-row by design, map-side combined
      "q363_stats_hill_tail",    // three 1-row folds + rank window over
                                 // the CONSTANT 101-row TakeOrdered head
                                 // (q179/q246 exception)
      "q360_stats_gini",         // totals + Gini 1-row folds over the
                                 // value-domain-bounded Lorenz frame
      "q357_stats_anderson_darling", // same shared-ECDF 1-row folds
      "q349_stats_cvm",          // totals + statistic 1-row folds over the
                                 // shared value-domain-bounded ECDF frame
                                 // (q263/q266's justification)
      "q348_negative_sampling",  // total-weight 1-row max-fold over the
                                 // vocabulary-bounded cumulative frame
                                 // (cumsum itself is DistributedCumSum)
      "q346_good_turing",        // token-total + N1 1-row folds over the
                                 // vocabulary-bounded count frames
      "q345_stats_kendall_tau",  // C/D, tie and total 1-row folds over the
                                 // bucket-grid contingency frame
      "q342_stats_fdr_bh",       // totals + step-up-k 1-row folds and the
                                 // rank window over the ≤25-row family
                                 // frame (q23 exception)
      "q341_stats_spearman",     // the ONE six-moment rank aggregate —
                                 // 1-row by design, map-side combined
                                 // (rank maps themselves are
                                 // DistributedCumSum, no global window)
      "q151_anon_lattice",       // best-height 1-row aggregate over 18 node rows
      "q154_benford_audit",      // global total over the 9 digit rows
      "q156_mutual_info",        // global total over the ≤25 cell rows
      "q157_contrastive_pairs",  // n_docs/n_pos 1-row count aggregates
      "q162_fd_audit",           // four per-FD 1-row folds over grouped frames
      "q165_langid_kappa",       // confusion-matrix (≤36 rows) 1-row folds
      "q166_column_profile",     // five per-column 1-row profile folds
      "q168_dataset_card",       // corpus-total 1-row fold over ≤#langs rows
      "q175_decile_lift",        // base-rate 1-row fold over the 10 decile rows
      "q178_dataset_mixture",    // totals 1-row fold over the ≤#sources rows
      "q179_vocab_coverage",     // corpus-total 1-row fold + rank window over
                                 // the constant ≤40-row TakeOrdered head
      "q185_dedup_containment",  // ndocs 1-row aggregate (q61's shared df-cap)
      "q187_graph_khop",         // optimizer-INJECTED bloom runtime filter on
                                 // the seed key (InjectRuntimeFilter): a
                                 // grand aggregate merging one bloom buffer
                                 // per partition — bounded, and a scale WIN
                                 // (pre-filters the edge scan by seed)
      "q189_survival_km",        // calendar-bounded duration-frame windows
                                 // (≤ #days rows — the q23 exception)
      "q192_dp_median_expmech",  // n 1-row aggregate + value-domain-bounded
                                 // bin window (≤ #bins rows)
      "q193_dedup_minhash_accuracy", // ndocs 1-row aggregates (the q50 AND
                                 // q61 df-cap paths both run here)
      "q196_eval_roc_auc",       // ROC sweep windows + AUC fold over the
                                 // ≤1001-row score-bin frame (score is
                                 // integer-quantized, so the domain is
                                 // bounded by construction) + P/N 1-row
                                 // totals
      "q212_assoc_rules",        // n_baskets 1-row count (merges one
                                 // partial row per partition)
      "q214_psi_drift",          // totals/psi_total 1-row folds over the
                                 // bounded bin frame
      "q210_corr_matrix",        // the ONE 14-moment grand aggregate —
                                 // 1-row by design, map-side combined
      "q211_impute_group_mean",  // global-mean 1-row fallback aggregate
      "q222_inclusion_deps",     // five 1-row containment folds (one per
                                 // audited candidate pair)
      "q228_eval_multiclass",    // micro-accuracy 1-row fold over the
                                 // ≤(k+1)-class frame
      "q231_scan_codecs",        // three per-codec 1-row checksum folds
                                 // over the 25-row roundtrip table
      "q232_text_bm25",          // (N, avgdl) corpus-stats 1-row aggregate
      "q234_join_bloom_prefilter", // the Bloom MASK build: one map row per
                                 // partition merges into the single 8 KB
                                 // map — bounded by design, and the whole
                                 // point (constant-size broadcast)
      "q236_quality_expectations", // the ONE N-check grand aggregate —
                                 // 1-row by design, map-side combined
      "q238_profile_columns",    // same shape: one grand profile aggregate
      "q246_pareto_heads",       // rank/cumsum window over the CONSTANT
                                 // 100-row TakeOrdered head (q179 argument)
      "q243_segment_trend",      // series-start (d0) 1-row min over the
                                 // calendar-bounded daily frame
      "q245_weekday_seasonality", // overall-mean 1-row fold over the same
                                 // bounded daily frame
      "q248_journey_paths",      // session-total 1-row fold over the
                                 // path-vocabulary-bounded count frame
      "q254_dp_randomized_response", // n_total 1-row aggregate over the
                                 // 5-segment domain
      "q255_eval_pr_auc",        // q196's shape: PR sweep windows + AP
                                 // fold over the ≤1001-row bin frame
      "q257_agg_approx_sample",  // the ONE sample+exact grand aggregate —
                                 // 1-row by design, map-side combined
      "q258_gdpr_erasure_audit", // three per-table 1-row purge counts
                                 // unioned to the 3-row report
      "q259_anon_ref_integrity", // one audit row: four 1-row count folds
      "q261_anon_km_suppress",   // k / before / after 1-row folds over
                                 // brand-bounded frames
      "q263_stats_ks_test",      // sample-totals 1-row max-fold over the
                                 // value-domain-bounded ECDF frame (the
                                 // corpus-sized cumulative pass itself is
                                 // DistributedCumSum — no single-partition
                                 // window, PlanShapeSuite asserts it)
      "q266_stats_mannwhitney",  // same totals fold + the final 1-row
                                 // U-statistic aggregate over the bounded
                                 // ECDF frame
      "q272_dedup_source_matrix", // ndocs 1-row aggregate (q61's shared
                                 // df-cap machinery under the matrix)
      "q275_target_encoding",    // global-prior 1-row mean fold (merges
                                 // one partial row per partition)
      "q278_retrieval_rrf",      // rank windows + fuse over the two
                                 // CONSTANT 20-row TakeOrdered heads
                                 // (q179/q246 exception); corpus side is
                                 // q232's justified shape
      "q281_heaps_law",          // OLS-sums 1-row fold over the 10-row
                                 // decile frame (q173's fit shape)
      "q311_naive_bayes_langid", // train-doc-count 1-row fold feeding the
                                 // priors (model frames are langs×64)
      "q312_uncertainty_sampling", // n_docs 1-row fold (q290's GD shape)
      "q313_quality_ensemble",   // the ONE six-moment sufficient-statistics
                                 // grand aggregate — 1-row by design
      "q308_gaussian_mixture_em", // per-step sufficient-statistics grand
                                 // aggregate — 1-row BY DESIGN (map-side
                                 // combined) + the (min,max) init fold
      "q309_blocking_quality",   // four 1-row count folds over the
                                 // ≤name-domain² bounded frames
      "q319_sorted_neighborhood", // same four 1-row folds (q309's
                                 // report shape, sorted-neighborhood pass)
      "q307_embedding_outliers", // centroid-norm 1-row fold over the
                                 // 64-row centroid frame
      "q299_decision_stump",     // cumulative window over the bounded
                                 // 16-char-bin histogram (q23/q196 shape)
                                 // + class-total 1-row fold
      "q300_dupcluster_audit",   // ndocs 1-row aggregate (df-cap under
                                 // the exact-Jaccard edge scoring)
      "q301_feature_mi_ranking", // corpus-total/positive-total 1-row fold
      "q296_lsh_probability_curve", // ndocs 1-row aggregates (q50 AND q61
                                 // df-cap paths, q193's justification)
      "q297_learning_curve",     // fraction-keyed folds are grouped aggs;
                                 // only the final ≤|pcts|-row report sorts
      "q298_simhash_bit_balance", // ndocs 1-row fold over the simhash frame
      "q293_embedding_pca",      // per-step norm + n_vecs 1-row folds
      "q361_embedding_abtt",     // same per-step folds + the 1-row
                                 // anisotropy-share fold
                                 // over the 64-row update frames
      "q295_perplexity_sweep",   // corpus-mean-NLL 1-row fold (one
                                 // partial row per partition)
      "q290_quality_classifier", // n_docs + train-accuracy 1-row folds
                                 // (one partial row per partition); every
                                 // weight/gradient frame is 64 rows
      "q292_winnowing_dedup",    // ndocs 1-row aggregate (q61's shared
                                 // df-cap shape over selected fingerprints)
      "q282_dsir_importance",    // target/raw token-total 1-row folds
                                 // over the 256-bucket feature frames
      "q285_dedup_threshold_sweep", // n_docs 1-row count (q61's df-cap
                                 // shape) swept against the 5-row grid
      "q287_term_burstiness",    // n_docs 1-row count feeding the
                                 // Poisson adaptation baseline
      "q289_mixture_temperature", // token-total + Σp^α normalizer 1-row
                                 // folds over the ≤#sources frame
      "q276_join_fanout_audit",  // est/na/nb 1-row folds: Σ-product over
                                 // the key-bounded count frame + two
                                 // input-size counts
      "q315_feature_woe",        // good/bad totals 1-row fold over the
                                 // ≤|priority-domain| (≤5-row) frame
      "q317_fairness_parity",    // max-rate 1-row fold over the
                                 // ≤|sources| (≤20-row) frame
      "q324_table_manifest",     // five per-table 1-row manifest folds
                                 // (count + two commutative checksums)
      "q204_graph_hits")         // r17: the HITS L1-normalization total
                                 // rides a global window over the
                                 // ≤|nodes| per-half-step contribution
                                 // frame (single-reference loop state —
                                 // see GraphOps.hits), node-bounded at
                                 // any scale like q293's per-step folds
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try {
        val qe = fn(spark, sf).queryExecution
        qe.toRdd.count() // drives THIS execution so the AQE plan finalizes
        if (qe.executedPlan.toString.contains("Exchange SinglePartition") &&
            !justified(name))
          Some(s"$name: unjustified Exchange SinglePartition")
        else None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
      finally {
        // sweep AROUND FrameMemo-owned frames (graft.plans.FrameMemo
        // contract rule 1) — unpersisting them would rebuild the shared
        // dedup/minhash frames on every one of the 300+ queries here
        val owned = graft.plans.FrameMemo.ownedIds(spark)
        spark.sparkContext.getPersistentRDDs.values
          .filterNot(r => owned(r.id)).foreach(_.unpersist(blocking = true))
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every query name has oracle SQL or a documented omission") {
    // the sketch family (q111–q113) has no DuckDB equivalent — bounds
    // are asserted in SketchSuite instead (see SketchOps doc)
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == Set("q14_agg_approx_distinct", "q111_agg_sketch_distinct",
      "q112_agg_sketch_quantile", "q113_agg_sketch_overlap",
      "q123_agg_heavy_hitters", "q233_agg_sketch_countmin"), s"unexpected: $noOracle")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q04 broadcast join: 5 regions, counts sum to customer count") {
    val rows = SparkEntry.queries("q04_join_broadcast")(spark, sf).collect()
    assert(rows.length == 5)
    val total = rows.map(_.getAs[Long]("cnt")).sum
    assert(total == Tables(spark, sf, "customer").count())
  }

  test("q12 agg: group sums positive, cnt matches filter") {
    val rows = SparkEntry.queries("q12_agg_hash")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
    }
  }

  test("q14 approx distinct within 5% of exact") {
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("q14_agg_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables(spark, sf, "customer")
      .groupBy("c_mktsegment").agg(countDistinct(col("c_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (seg, n) =>
      assert(math.abs(approx(seg) - n).toDouble / n < 0.05, s"$seg: ${approx(seg)} vs $n")
    }
  }

  test("q36 pseudonyms are 64-hex and injective") {
    val rows = SparkEntry.queries("q36_anon_pseudonymize")(spark, sf).collect()
    assert(rows.forall(_.getString(1).matches("[0-9a-f]{64}")))
    assert(rows.map(_.getString(1)).distinct.length == rows.length)
  }

  test("q41/q42: suppression nulls exactly the sub-k groups") {
    val audit = SparkEntry.queries("q41_anon_kanon_audit")(spark, sf).collect()
    val violating = audit.count(_.getAs[Boolean]("violates_k5"))
    val suppressed = SparkEntry.queries("q42_anon_suppress_k")(spark, sf)
      .collect().count(_.isNullAt(1))
    val violatingRows = audit.filter(_.getAs[Boolean]("violates_k5"))
      .map(_.getAs[Long]("group_size")).sum
    assert(suppressed == violatingRows,
      s"suppressed rows $suppressed != member count of violating groups $violatingRows")
  }

  test("q47 rank swap preserves the multiset of balances per nation") {
    import org.apache.spark.sql.functions._
    val swapped = SparkEntry.queries("q47_anon_swap")(spark, sf)
      .groupBy("c_nationkey").agg(sum(Tables.dec(col("acctbal_swapped"))).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    val orig = Tables(spark, sf, "customer")
      .groupBy("c_nationkey").agg(sum(Tables.dec(col("c_acctbal"))).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    assert(swapped == orig)
  }

  test("q51 returns exactly 5 neighbors per probe, ranks 1..5") {
    val rows = SparkEntry.queries("q51_sim_cosine_topk")(spark, sf).collect()
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.size == 10)
    byProbe.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rn")).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      val cosines = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("cos"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q58 session count equals gap count + users with events") {
    import org.apache.spark.sql.functions._
    val sess = SparkEntry.queries("q58_stream_session")(spark, sf)
    val nSessions = sess.groupBy("user_id")
      .agg(max("session_id").as("m")).agg(sum("m")).collect()(0).getLong(0)
    val ev = Tables.events(spark, sf)
    val nUsers = ev.select("user_id").distinct().count()
    val gaps = ev.selectExpr("user_id", "ts_us AS t")
      .withColumn("prev", expr(
        "lag(t, 1) over (partition by user_id order by t, user_id)"))
      .filter(col("prev").isNotNull && col("t") - col("prev") > 1800000000L)
      .count()
    assert(nSessions == nUsers + gaps)
  }

  test("q94 native session_window agrees with a >=-gap lag derivation") {
    import org.apache.spark.sql.functions._
    val native = SparkEntry.queries("q94_session_window")(spark, sf).collect()
    // derive sessions with the SAME boundary rule as session_window
    // (new session at gap >= 30 min — the half-open merge). q58 itself
    // uses the strict > rule, so comparing against q58 would assert a
    // false invariant on any corpus with an exact 30-minute gap.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val derived = Tables.events(spark, sf)
      .withColumn("prev", lag(col("ts_us"), 1).over(w))
      .withColumn("ns", when(col("prev").isNull ||
        col("ts_us") - col("prev") >= 1800000000L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid").agg(min("ts_us").as("s"))
    val cntNative = native.map(r => (r.getLong(0), r.getAs[Long]("sess_start_us")))
      .sorted.toSeq
    val cntDerived = derived.collect()
      .map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(cntNative == cntDerived)
  }

  test("q60 simhash: near-identical docs get near-identical hashes") {
    // determinism + stability: same doc → same hash across two runs
    val a = SparkEntry.queries("q60_dedup_simhash")(spark, sf).collect()
    val b = SparkEntry.queries("q60_dedup_simhash")(spark, sf).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("simhash short-doc fallback: a 2-token exact-dup pair IS flagged by the near leg") {
    // VERDICT r12 item 3: <3-token docs previously emitted NO fingerprint,
    // so the q181 ingest path could never near-dup-flag a short doc even
    // against its byte-identical twin. The degenerate whole-text
    // fingerprint closes that: identical short texts collide at Hamming 0.
    import spark.implicits._
    val index = Seq(1L -> "hello world", 2L -> "a much longer standing document with many tokens")
      .toDF("doc_id", "text")
    val batch = Seq(
      10L -> "hello world",        // 2-token exact dup of index doc 1
      11L -> "goodbye moon",       // 2-token, novel
      12L -> "a much longer standing document with many tokens extra") // near-dup of 2
      .toDF("doc_id", "text")
    val got = Graft.ingestDedup(batch, index).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(got(10L) == ((true, true, false)),
      s"2-token dup must be flagged by BOTH legs now, got ${got(10L)}")
    assert(got(11L)._1 == false && got(11L)._3 == true,
      s"novel short doc must be kept, got ${got(11L)}")
    // every doc still carries exactly one fingerprint (short branch unions in)
    val sh = Graft.simhash(batch.union(index)).collect()
    assert(sh.length == 5 && sh.map(_.getLong(0)).distinct.length == 5)
    // identical texts → identical fingerprints across the two frames
    val byId = sh.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(10L) == byId(1L))
  }

  test("q326 perceptual hash: every clone pair flagged, zero false positives, headers decode") {
    // fixtures are 12 Knuth-noise base images + 12 small-perturbation
    // clones (ids +100): aHash must pair each base with exactly its clone
    val rows = SparkEntry.queries("q326_image_phash_dedup")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.length == 12, s"expected the 12 clone pairs, got ${rows.mkString(", ")}")
    rows.foreach { case (a, b, ham) =>
      assert(b.replace("img_1", "img_0") == a, s"false positive pair ($a, $b)")
      assert(ham <= 6)
    }
    // the fixtures are REAL BMPs: the house header decoder parses them.
    // Path DERIVED from the content-addressed builder (r15 lesson: a
    // hardcoded copy of the dir name went stale when the dir renamed).
    val f = new java.io.File(graft.operators.Scans.imageFixture, "img_000.bmp")
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    assert(graft.streaming.Multimodal.decodeReal(bytes, "") == ((16, 16)))
  }

  test("q327 keep-best resolution: one keeper per component, keeper has max quality") {
    val rows = SparkEntry.queries("q327_dedup_keep_best")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    // exactly one keep per representative, and it IS the representative
    val byRep = rows.groupBy(_._2)
    byRep.foreach { case (rep, members) =>
      val keepers = members.filter(_._4)
      assert(keepers.length == 1, s"component $rep has ${keepers.length} keepers")
      assert(keepers.head._1 == rep)
      // the keeper's quality is the component max (doc_id breaks ties)
      val maxQ = members.map(_._3).max
      assert(keepers.head._3 == maxQ,
        s"component $rep kept quality ${keepers.head._3}, max is $maxQ")
    }
    // the policy differs from q93's min-id exactly when a higher-quality
    // non-min member exists — sanity that the join/window wiring is live
    assert(rows.length == SparkEntry.queries("q93_dedup_resolution")(spark, sf).count())
  }

  test("q328 audio features: peaks match the generator's amplitude law, RMS ≈ peak/√3") {
    val rows = SparkEntry.queries("q328_audio_features")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.length == 48) // 6 files × 8 windows
    rows.foreach { case (fname, _, peak, crossings, rms) =>
      val f = fname.slice(5, 7).toInt
      val bound = 100L * (100 + 40 * f)
      // generator amplitude law: |sample| ≤ 100·(100 + 40f) per window
      assert(peak <= bound && peak > bound / 2, s"$fname peak $peak vs bound $bound")
      // a symmetric sawtooth's RMS is bound/√3 (±5% per-window for the
      // discrete ramp's phase)
      assert(math.abs(rms / (bound / math.sqrt(3.0)) - 1.0) < 0.05, s"$fname rms $rms vs bound $bound")
      assert(crossings >= 1 && crossings < 100)
    }
    // the bound is ATTAINED somewhere in every file (i = 0 → sample −100·amp)
    rows.groupBy(_._1).foreach { case (fname, rs) =>
      val f = fname.slice(5, 7).toInt
      assert(rs.map(_._3).max == 100L * (100 + 40 * f), s"$fname never attains its amplitude bound")
    }
    // higher file index ⇒ shorter period ⇒ strictly more total crossings
    val byFile = rows.groupBy(_._1).map { case (f, rs) => f -> rs.map(_._4).sum }
    assert(byFile("tone_00.wav") < byFile("tone_05.wav"))
  }

  test("q329 frame sampling: 4 frames per video at stride 4, motion changes the hash") {
    val rows = SparkEntry.queries("q329_video_frame_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), (r.getLong(2), r.getLong(3)), r.getDouble(4)))
    assert(rows.length == 20) // 5 videos × frames 0,4,8,12
    rows.groupBy(_._1).foreach { case (v, rs) =>
      assert(rs.map(_._2).sorted.toSeq == Seq(0L, 4L, 8L, 12L), s"$v sampled wrong frames")
      // motion: the 4 sampled frames of one video are not all hash-equal
      assert(rs.map(_._3).distinct.length > 1, s"$v frames all hash-identical")
      // uniform 0..250 noise ⇒ mean luminance near 125
      rs.foreach { case (_, _, _, lum) => assert(lum > 100 && lum < 150) }
    }
  }

  test("q330 resize: thumbnail equals an independently computed 2x2 box pool") {
    val rows = SparkEntry.queries("q330_image_resize")(spark, sf).collect()
    assert(rows.length == 24 * 64) // one scalar row per (image, block)
    val thumb0 = rows.filter(_.getString(0) == "img_000.bmp")
      .sortBy(_.getLong(5)).map(_.getLong(6)).toVector
    assert(thumb0.length == 64)
    // recompute from the fixture's generator law (base image 0, grayscale
    // so B+G+R = 3v): block (bx, by) = Σ over its 2×2 pixels of 3·pix
    def pix(x: Int, y: Int): Long =
      (((x * 31L + y * 17L + 23L) * 2654435761L) % 1000003L) % 251L
    val expected = (0 until 64).map { bi =>
      val (bx, by) = (bi % 8, bi / 8)
      (for (dx <- 0 to 1; dy <- 0 to 1)
        yield 3L * pix(bx * 2 + dx, by * 2 + dy)).sum
    }.toVector
    assert(thumb0 == expected, s"thumb diverges from the box pool at ${
      thumb0.zip(expected).indexWhere(p => p._1 != p._2)}")
  }

  test("q333 PQ: seed vectors self-assign with zero residual; codes stay in the codebook") {
    val rows = SparkEntry.queries("q333_ann_pq")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val nVec = rows.map(_._1).distinct.length
    assert(rows.length == nVec * 8, "each vector must emit exactly 8 subspace rows")
    // the 16 codebook seeds are their own nearest centroid, residual 0
    rows.filter(_._1 < 16).foreach { case (vid, sub, code, err) =>
      assert(code == vid && err == 0.0,
        s"seed $vid sub $sub: expected self-assignment, got code=$code err=$err")
    }
    // every code addresses the 16-entry codebook; residuals are non-negative
    rows.foreach { case (vid, sub, code, err) =>
      assert(code >= 0 && code < 16, s"vec $vid sub $sub: code $code out of range")
      assert(err >= 0.0, s"vec $vid sub $sub: negative residual $err")
    }
  }

  test("q335 html extract: titles, link census and entity decode follow the wrapper law") {
    val rows = SparkEntry.queries("q335_html_extract")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getString(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, title, nLinks, nExt, head) =>
      assert(title == s"Doc $id", s"doc $id: title '$title'")
      // every doc carries the relative link; every third doc adds the
      // absolute one (which is also the only https:// occurrence)
      val expLinks = if (id % 3 == 0) 2L else 1L
      assert(nLinks == expLinks && nExt == expLinks - 1,
        s"doc $id: links $nLinks/$nExt, expected $expLinks/${expLinks - 1}")
      // tags are gone and the &amp; entity decoded in the visible text
      assert(!head.contains("<") && head.startsWith(s"Doc $id "), s"doc $id: head '$head'")
    }
  }

  test("q336 semdedup: lower-id-wins verdicts are consistent and bucket-local") {
    val rows = SparkEntry.queries("q336_semdedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    val bucketOf = rows.map(r => r._1 -> r._2).toMap
    rows.foreach { case (vid, bucket, rep, keep) =>
      assert(bucket >= 0 && bucket < 16, s"vec $vid: bucket $bucket")
      assert(rep <= vid, s"vec $vid: representative $rep is not lower-id")
      assert(keep == (rep == vid), s"vec $vid: keep=$keep but rep=$rep")
      assert(bucketOf(rep) == bucket,
        s"vec $vid: rep $rep lives in bucket ${bucketOf(rep)}, not $bucket")
    }
    // the 16 seeds are their own bucket centroids — each must land in
    // its own cell (distance 0 to itself)
    rows.filter(_._1 < 16).foreach { case (vid, bucket, _, _) =>
      assert(bucket == vid, s"seed $vid assigned to bucket $bucket")
    }
  }

  test("q337 Kneser-Ney: matches an independent recomputation; discount mass sums to 1") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val bigrams = docs.flatMap { t =>
      val ts = t.split(" ")
      if (ts.length >= 2) ts.sliding(2).map(a => (a(0), a(1))) else Iterator.empty
    }
    val cnt = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = cnt.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val nAfter = cnt.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nBefore = cnt.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nTypes = cnt.size.toLong
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val rows = SparkEntry.queries("q337_kneser_ney_lm")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w1, w2, c, p) = (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
      assert(c == cnt((w1, w2)) && c >= 3)
      val exp = r6(math.max(c - 0.75, 0.0) / c1(w1) +
        (0.75 * nAfter(w1) / c1(w1)) * (nBefore(w2).toDouble / nTypes))
      assert(math.abs(p - exp) < 1e-9, s"($w1, $w2): $p vs $exp")
    }
    // the KN normalization: for any context w1, summing P over the FULL
    // vocabulary gives Σ_seen (c−D)/c1 + λ(w1)·Σ P_cont = 1 exactly
    // (Σ P_cont = 1 by construction)
    rows.map(_.getString(0)).distinct.take(5).foreach { w1 =>
      val seen = cnt.collect { case ((a, _), c) if a == w1 =>
        math.max(c - 0.75, 0.0) / c1(w1) }.sum
      val lam = 0.75 * nAfter(w1) / c1(w1)
      assert(math.abs(seen + lam - 1.0) < 1e-9, s"context '$w1' mass ${seen + lam}")
    }
  }

  test("q338 length reshape: thresholds scale with w/n and the binding bucket keeps ~all") {
    val rows = SparkEntry.queries("q338_length_reshape")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val r = rows.map { case (_, w, n, _, _) => n * 10000 / w }.min
    rows.foreach { case (b, w, n, thresh, kept) =>
      assert(w == math.max(16 - b, 1), s"bucket $b: weight $w")
      assert(thresh == r * w / n, s"bucket $b: threshold $thresh != ${r * w / n}")
      assert(thresh >= 0 && thresh <= 10000 && kept <= n)
    }
    // the binding bucket's threshold sits at ~10000 (floor slack only)
    assert(rows.map(_._4).max >= 9990, s"max threshold ${rows.map(_._4).max}")
    // kept counts actually follow the target: the kept/w ratio varies far
    // less than the raw n/w ratio it replaced (profile reshaped, not noise)
    val keptRatio = rows.map { case (_, w, _, _, k) => k.toDouble / w }
    val nRatio = rows.map { case (_, w, n, _, _) => n.toDouble / w }
    def spread(xs: Seq[Double]) = xs.max / math.max(xs.min, 1e-9)
    assert(spread(keptRatio) < spread(nRatio),
      s"reshape did not tighten the profile: kept ${spread(keptRatio)} vs raw ${spread(nRatio)}")
  }

  test("q339 IVF-PQ: ADC scores equal an independent codes-and-table recomputation") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def sub(v: Array[Double], s: Int) = v.slice(s * 8, s * 8 + 8)
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val seeds = (0L until 16L).map(emb)
    // PQ code of (vector, subspace): nearest seed subvector, id tie-break
    def code(v: Array[Double], s: Int): Int =
      (0 until 16).minBy(j => (d2(sub(v, s), sub(seeds(j), s)), j))
    val rows = SparkEntry.queries("q339_ann_ivf_pq")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (p, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (1L to rs.length).toSeq, s"probe $p ranks")
      assert(rs.length <= 3)
    }
    rows.foreach { case (p, c, adc, _) =>
      // ADC = Σ_s r6(|| probe_sub − centroid(code of CANDIDATE) ||²),
      // decimal-summed — recompute from raw vectors and the same codes
      val expected = (0 until 8).map { s =>
        BigDecimal(r6(d2(sub(emb(p), s), sub(seeds(code(emb(c), s)), s))))
          .setScale(6, BigDecimal.RoundingMode.DOWN)
      }.sum.toDouble
      assert(math.abs(adc - expected) < 1e-9, s"($p, $c): $adc vs $expected")
    }
  }

  test("q340 Lloyd step: within-cell SSE never increases and strictly decreases globally") {
    val rows = SparkEntry.queries("q340_pq_lloyd_step")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // each vector contributes one membership per subspace
    val nVec = SparkEntry.queries("q333_ann_pq")(spark, sf)
      .select("vec_id").distinct().count()
    assert(rows.map(_._3).sum == nVec * 8, "cell memberships don't cover the corpus")
    rows.foreach { case (s, code, n, before, after) =>
      assert(s >= 0 && s < 8 && code >= 0 && code < 16 && n >= 1)
      // the mean minimizes within-cell SSE; 1e-4 absorbs the r6 noise
      assert(after <= before + 1e-4, s"cell ($s, $code): SSE rose $before -> $after")
    }
    assert(rows.map(_._5).sum < rows.map(_._4).sum,
      "a Lloyd sweep must strictly decrease total distortion on a non-degenerate corpus")
  }

  test("q334 audio dedup: exactly the three dithered clones pair with their sources") {
    val rows = SparkEntry.queries("q334_audio_dup")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.map(p => (p._1, p._2)).toSet == Set(
      ("rec_000.wav", "rec_100.wav"),
      ("rec_002.wav", "rec_102.wav"),
      ("rec_005.wav", "rec_105.wav")),
      s"expected exactly the 3 clone pairs, got ${rows.mkString(", ")}")
    // ±5 dither on ±15000 amplitudes must not move any envelope bit far:
    // clones sit well inside the Hamming ≤ 6 dup threshold
    rows.foreach { case (a, b, h) => assert(h <= 2, s"($a, $b) hamming $h") }
  }

  test("q331 shot boundaries: the scene cut at frame 8 is the ONLY cut in every video") {
    val rows = SparkEntry.queries("q331_video_shot_boundary")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getBoolean(4)))
    assert(rows.length == 15) // 5 videos × 3 consecutive sampled pairs
    rows.foreach { case (v, frameIdx, hamming, isCut) =>
      if (frameIdx == 8L) {
        assert(isCut && hamming > 16, s"$v missed the scene cut (hamming $hamming)")
      } else {
        assert(!isCut && hamming <= 3, s"$v false cut at $frameIdx (hamming $hamming)")
      }
    }
  }

  test("q332 duplicate footage: the re-encoded clone pairs with its source, nothing else") {
    val rows = SparkEntry.queries("q332_video_dup_footage")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // every flagged pair is between video_00 and its re-encode video_04
    rows.foreach { case (a, b, _, _, ham) =>
      assert(a == "video_00.bin" && b == "video_04.bin", s"false dup pair ($a, $b)")
      assert(ham <= 6)
    }
    // the same-frame pairs (the actual duplicated footage) are all present
    val sameFrame = rows.filter(r => r._3 == r._4).map(_._3).sorted.toSeq
    assert(sameFrame == Seq(0L, 4L, 8L, 12L), s"missed same-frame dups: $sameFrame")
  }

  test("q110 z-order tiles bound BOTH dimensions (the locality property)") {
    // tile = top 2 interleaved bits of each 5-bit dim → within any tile
    // both x and y span at most 8 consecutive values (vs 25/28 global).
    // This is the property that makes either-dim predicates prune tiles;
    // the oracle checks the values, this checks the layout's point.
    val rows = SparkEntry.queries("q110_zorder_locality")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("x_max") - r.getAs[Long]("x_min") <= 7,
        s"tile ${r.getAs[Long]("tile")} x-range too wide")
      assert(r.getAs[Long]("y_max") - r.getAs[Long]("y_min") <= 7,
        s"tile ${r.getAs[Long]("tile")} y-range too wide")
    }
  }

  test("q106 k-means: every vector assigned to a seed-derived cluster, d2 >= 0") {
    val rows = SparkEntry.queries("q106_kmeans")(spark, sf).collect()
    assert(rows.length == Tables(spark, sf, "embeddings").count())
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 8))
    assert(rows.forall(_.getDouble(2) >= 0.0))
  }

  test("q63 IVF candidates are a subset of brute-force space and ranked") {
    val rows = SparkEntry.queries("q63_ann_ivf")(spark, sf).collect()
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length <= 3))
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("q81 redaction: every doc present; hits imply a rewritten prefix") {
    val rows = SparkEntry.queries("q81_pii_redact")(spark, sf).collect()
    assert(rows.length == Tables(spark, sf, "documents").count())
    assert(rows.exists(_.getAs[Long]("n_hits") > 0)) // corpus contains matches
    rows.filter(_.getAs[Long]("n_hits") > 0).take(20).foreach { r =>
      val red = r.getAs[String]("redacted_prefix")
      assert(!red.contains("customer") || red.contains("<PII>"))
    }
  }

  test("q82 repetition ratio is in [0, 1) and consistent with its counts") {
    val rows = SparkEntry.queries("q82_text_repetition")(spark, sf).collect()
    rows.foreach { r =>
      val n = r.getAs[Long]("n_bigrams"); val d = r.getAs[Long]("n_distinct")
      val ratio = r.getAs[Double]("rep_ratio")
      assert(d >= 1 && d <= n)
      assert(ratio >= 0.0 && ratio < 1.0)
      assert(math.abs(ratio - (1.0 - d.toDouble / n)) < 1e-6)
    }
  }

  test("q83 simhash pairs: all pairs within hamming 3, none missed (exact check)") {
    val pairs = SparkEntry.queries("q83_dedup_simhash_pairs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("hamming")))
    assert(pairs.forall(_._3 <= 3))
    // exhaustive cross-check on the fingerprints: banding must lose nothing
    val sh = SparkEntry.queries("q60_dedup_simhash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = for {
      (ia, sa) <- sh; (ib, sb) <- sh
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib, java.lang.Long.bitCount(sa ^ sb).toLong)
    assert(pairs.toSet == brute.toSet)
  }

  test("q181 ingest dedup: flags consistent; near drops truly have an index twin") {
    val rows = SparkEntry.queries("q181_ingest_dedup")(spark, sf).collect()
    assert(rows.length.toLong ==
      Tables(spark, sf, "documents").filter("doc_id % 2 = 1").count())
    rows.foreach { r =>
      assert(r.getAs[Boolean]("kept") ==
        (!r.getAs[Boolean]("dropped_exact") && !r.getAs[Boolean]("dropped_near")))
    }
    // every near-drop must have an EVEN-id fingerprint within Hamming 3
    // (brute-force over the q60 fingerprints — the q83 cross-check recipe,
    // restricted to batch×index pairs)
    val sh = SparkEntry.queries("q60_dedup_simhash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val idx = sh.filter(_._1 % 2 == 0)
    val nearTrue = sh.filter(_._1 % 2 == 1).filter { case (_, sa) =>
      idx.exists { case (_, sb) => java.lang.Long.bitCount(sa ^ sb) <= 3 }
    }.map(_._1).toSet
    assert(rows.filter(_.getAs[Boolean]("dropped_near")).map(_.getLong(0)).toSet == nearTrue)
  }

  test("q84 histogram partitions the corpus; q85 sample rates per stratum hold") {
    val hist = SparkEntry.queries("q84_length_histogram")(spark, sf).collect()
    val total = hist.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables(spark, sf, "documents").count())
    val sample = SparkEntry.queries("q85_sample_stratified")(spark, sf).collect()
    assert(sample.forall(_.getAs[Long]("bucket") < 50))
    sample.filter(_.getString(1) != "en")
      .foreach(r => assert(r.getAs[Long]("bucket") < 20))
    // determinism: same rows on a second run
    val again = SparkEntry.queries("q85_sample_stratified")(spark, sf).collect()
    assert(sample.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
  }

  test("q86 funnel stages are strictly ordered and monotonically fewer") {
    val rows = SparkEntry.queries("q86_funnel")(spark, sf).collect()
    assert(rows.nonEmpty)
    var (nC, nV, nP) = (0, 0, 0)
    rows.foreach { r =>
      nC += 1
      if (!r.isNullAt(2)) { nV += 1; assert(r.getLong(2) > r.getLong(1)) }
      if (!r.isNullAt(3)) {
        nP += 1
        assert(!r.isNullAt(2), "purchase stage requires view stage")
        assert(r.getLong(3) > r.getLong(2))
      }
    }
    assert(nC >= nV && nV >= nP && nP > 0)
  }

  test("q88 bucketed join equals the plain join on original tables") {
    import org.apache.spark.sql.functions._
    val bucketed = SparkEntry.queries("q88_join_bucketed")(spark, sf).collect()
    val plain = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        Tables.r6(sum(Tables.dec(col("o_totalprice"))).cast("double")).as("revenue"))
      .orderBy("c_mktsegment").collect()
    assert(bucketed.toSeq == plain.toSeq)
  }

  test("q89 salted join equals the plain join; q90 ranks are sane") {
    import org.apache.spark.sql.functions._
    val salted = SparkEntry.queries("q89_join_salted")(spark, sf).collect()
    val plain = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_orders"),
        Tables.r6(sum(Tables.dec(col("o_totalprice"))).cast("double")).as("revenue"))
      .orderBy("c_nationkey").collect()
    assert(salted.toSeq == plain.toSeq)
    val fuzzy = SparkEntry.queries("q90_join_fuzzy_topk")(spark, sf).collect()
    fuzzy.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rn")).sorted.toSeq == Seq(1L, 2L, 3L))
      val dists = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Long]("dist"))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
      assert(dists.forall(_ > 0)) // self-match excluded
    }
  }

  test("q91 chunks tile each document; stride prefixes rebuild the text") {
    val rows = SparkEntry.queries("q91_doc_chunking")(spark, sf).collect()
    val docs = Tables(spark, sf, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(rows.map(_.getLong(0)).distinct.length == docs.size)
    rows.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("chunk_id"))
      assert(sorted.map(_.getAs[Long]("chunk_id")).toSeq == sorted.indices.map(_.toLong))
      // rebuild: first 20 tokens of every chunk except the last, then the
      // last chunk whole, must reproduce the original token stream
      val rebuilt = (sorted.init.map(_.getAs[String]("chunk_text").split(" ").take(20).mkString(" ")) :+
        sorted.last.getAs[String]("chunk_text")).filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == docs(id), s"doc $id not rebuilt from chunks")
    }
  }

  test("q92 shuffle is a deterministic permutation of the corpus") {
    val a = SparkEntry.queries("q92_corpus_shuffle")(spark, sf).collect()
    val b = SparkEntry.queries("q92_corpus_shuffle")(spark, sf).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
    assert(a.map(_.getLong(0)).sorted.toSeq ==
      Tables(spark, sf, "documents").collect().map(_.getAs[Long]("doc_id")).sorted.toSeq)
    // it actually permutes (the hash order differs from id order)
    assert(a.map(_.getLong(0)).toSeq != a.map(_.getLong(0)).sorted.toSeq)
  }

  test("q93 resolution keeps exactly one representative per component") {
    val res = SparkEntry.queries("q93_dedup_resolution")(spark, sf).collect()
    val comps = SparkEntry.queries("q76_dedup_components")(spark, sf).collect()
    assert(res.count(_.getAs[Boolean]("keep")) ==
      comps.map(_.getAs[Long]("comp")).distinct.length)
    res.foreach { r =>
      assert(r.getAs[Long]("representative") <= r.getAs[Long]("doc_id"))
      assert(r.getAs[Boolean]("keep") ==
        (r.getAs[Long]("representative") == r.getAs[Long]("doc_id")))
    }
  }

  test("q87 gapfill: dense per-user grid, zeros on gaps, forward fill holds") {
    val rows = SparkEntry.queries("q87_gapfill")(spark, sf).collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.values.foreach { rs =>
      val days = rs.map(_.getLong(1)).sorted
      assert(days.head.to(days.last) == days.toSeq.map(identity), "grid must be dense")
      // first bucket of each span is an observed day (span starts at
      // first activity) so filled_value is defined from row one onward
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.head.getAs[Long]("cnt") > 0)
      sorted.foreach(r => assert(!r.isNullAt(3)))
      // zero-count days must repeat the previous filled value
      sorted.sliding(2).foreach {
        case Array(a, b) if b.getAs[Long]("cnt") == 0L =>
          assert(b.getAs[Double]("filled_value") == a.getAs[Double]("filled_value"))
        case _ => ()
      }
    }
  }

  test("q115 mondrian cells partition each nation; splits are median-balanced") {
    val cells = SparkEntry.queries("q115_anon_mondrian")(spark, sf).collect()
    val custByNation = Tables(spark, sf, "customer").collect()
      .groupBy(_.getAs[Int]("c_nationkey")).view.mapValues(_.length.toLong).toMap
    val byNation = cells.groupBy(_.getAs[Int]("c_nationkey"))
    assert(byNation.keySet == custByNation.keySet)
    byNation.foreach { case (nat, cs) =>
      // the cells of a stratum tile it exactly
      assert(cs.map(_.getAs[Long]("cell_n")).sum == custByNation(nat))
      assert(cs.length <= 4) // depth 2 ⇒ ≤4 leaf cells
      // ntile(2) balance: the two halves of any split differ by ≤1
      val h1Sizes = cs.groupBy(_.getAs[Int]("h1")).view
        .mapValues(_.map(_.getAs[Long]("cell_n")).sum).toMap
      if (h1Sizes.size == 2)
        assert(math.abs(h1Sizes(1) - h1Sizes(2)) <= 1)
      // generalized ranges are genuine bounds
      cs.foreach(c => assert(
        c.getAs[Double]("acct_lo") <= c.getAs[Double]("acct_hi") &&
          c.getAs[String]("seg_lo") <= c.getAs[String]("seg_hi")))
    }
  }

  test("q116 dp counts: reproducible, and |noise| within the ε=0.5 tail bound") {
    val a = SparkEntry.queries("q116_anon_dp_noise")(spark, sf).collect()
    val b = SparkEntry.queries("q116_anon_dp_noise")(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq, "fixed-seed DP must be reproducible")
    val truth = Tables(spark, sf, "customer").collect()
      .groupBy(r => (r.getAs[Int]("c_nationkey"), r.getAs[String]("c_mktsegment")))
      .view.mapValues(_.length.toDouble).toMap
    a.foreach { r =>
      val t = truth((r.getAs[Int]("c_nationkey"), r.getAs[String]("c_mktsegment")))
      val noise = r.getAs[Double]("noisy_n") - t
      // Laplace(b=2) inverse-CDF from u on a 1e6 grid: |noise| ≤ b·ln(1e6/2) ≈ 26.2
      assert(math.abs(noise) <= 2.0 * math.log(1000003.0 / 2.0) + 1e-6,
        s"noise $noise outside the deterministic-grid tail bound")
      assert(noise != 0.0, "noise must actually perturb")
    }
  }

  test("q117 navigation keys agree with a direct per-brand sort") {
    val rows = SparkEntry.queries("q117_win_distribution")(spark, sf).collect()
    rows.groupBy(_.getAs[String]("p_brand")).values.foreach { rs =>
      val ordered = rs.sortBy(r => (r.getAs[Double]("p_retailprice"), r.getAs[Long]("p_partkey")))
      val cheapest = ordered.head.getAs[Long]("p_partkey")
      val priciest = ordered.last.getAs[Long]("p_partkey")
      rs.foreach { r =>
        assert(r.getAs[Long]("cheapest_key") == cheapest)
        assert(r.getAs[Long]("priciest_key") == priciest)
        assert(r.getAs[Long]("second_cheapest_key") == ordered(1).getAs[Long]("p_partkey"))
        val cd = r.getAs[Double]("cdist")
        assert(cd > 0.0 && cd <= 1.0)
      }
    }
  }

  test("q118 skyline: kept points undominated, dropped points dominated (exact)") {
    val sky = SparkEntry.queries("q118_skyline")(spark, sf).collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Double]("p_retailprice"), r.getAs[Int]("p_size")))
    val all = Tables(spark, sf, "part").collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Double]("p_retailprice"), r.getAs[Int]("p_size")))
      .distinct
    def dominates(a: (String, Double, Int), b: (String, Double, Int)): Boolean =
      a._1 == b._1 && a._2 <= b._2 && a._3 <= b._3 && (a._2 < b._2 || a._3 < b._3)
    val skySet = sky.toSet
    all.foreach { p =>
      val dominated = all.exists(q => dominates(q, p))
      assert(skySet.contains(p) == !dominated,
        s"$p ${if (dominated) "dominated but kept" else "undominated but dropped"}")
    }
  }

  test("q120 pagerank: a distribution up to dangling leak, teleport floor holds") {
    val rows = SparkEntry.queries("q120_graph_pagerank")(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.length
    val ranks = rows.map(_.getAs[Double]("rank"))
    // every node keeps at least its teleport share; nothing exceeds 1
    ranks.foreach(r => assert(r >= 0.15 / n - 1e-9 && r < 1.0))
    // total mass ≤ 1 up to the r6 rounding budget (each of n ranks and
    // each source's transition row carries ≤0.5e-6 per iteration —
    // measured drift at n=25 is ~2.3e-5) minus what dangling nodes
    // didn't forward; and can't collapse below the teleport mass
    val total = ranks.sum
    assert(total <= 1.0 + n * 2e-6 && total >= 0.15 - 1e-6, s"mass $total")
  }

  test("q122 TWA sits within each user's [min,max] value envelope") {
    val twa = SparkEntry.queries("q122_time_weighted_avg")(spark, sf).collect()
    assert(twa.nonEmpty)
    val env = Tables.events(spark, sf).groupBy("user_id")
      .agg(org.apache.spark.sql.functions.min("value").as("lo"),
        org.apache.spark.sql.functions.max("value").as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    twa.foreach { r =>
      val (lo, hi) = env(r.getLong(0))
      val v = r.getAs[Double]("twa")
      assert(v >= lo - 1e-6 && v <= hi + 1e-6, s"user ${r.getLong(0)}: twa $v outside [$lo,$hi]")
    }
  }

  test("q124 hyperplane ANN never beats exact search at any rank (subset property)") {
    val ann = SparkEntry.queries("q124_ann_hyperplane")(spark, sf).collect()
    assert(ann.nonEmpty)
    val brute = operators.LLMPipeline.bruteTopK(
      spark, Tables(spark, sf, "embeddings"), org.apache.spark.sql.functions.col("vec_id") < 10,
      topK = 3).collect()
    val bruteByProbe = brute.groupBy(_.getLong(0))
    ann.groupBy(_.getLong(0)).foreach { case (p, rs) =>
      val cosines = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("cos"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b }, s"probe $p not ranked")
      val exact = bruteByProbe(p).sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("cos"))
      cosines.zip(exact).foreach { case (ac, bc) =>
        assert(ac <= bc + 1e-9, s"probe $p: ann cos $ac beats exact $bc")
      }
    }
  }

  test("q125 regression: r2 in [0,1], line passes through the group mean") {
    val rows = SparkEntry.queries("q125_agg_regression")(spark, sf).collect()
    assert(rows.nonEmpty)
    val means = Tables(spark, sf, "lineitem").groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.avg("l_quantity").as("mx"),
        org.apache.spark.sql.functions.avg("l_extendedprice").as("my"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0)
      val (mx, my) = means(r.getString(0))
      // OLS identity: ŷ(mean x) = mean y (up to the 6-dp rounding of the
      // published coefficients propagated through mx)
      val yhat = r.getAs[Double]("intercept") + r.getAs[Double]("slope") * mx
      assert(math.abs(yhat - my) < 1e-2, s"${r.getString(0)}: $yhat vs $my")
    }
  }

  test("q126 pattern matches are exactly the consecutive click-view-purchase triples") {
    val got = SparkEntry.queries("q126_event_pattern")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("start_event"))).toSet
    val want = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type", "ts_us AS t")
      .collect()
      .groupBy(_.getLong(0))
      .flatMap { case (_, rs) =>
        val seq = rs.sortBy(r => (r.getLong(3), r.getLong(1)))
        seq.sliding(3).collect {
          case Array(a, b, c)
            if a.getString(2) == "click" && b.getString(2) == "view" &&
              c.getString(2) == "purchase" =>
            (a.getLong(0), a.getLong(1))
        }
      }.toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("q127 weighted sample is the exact top-5 by the A-ES key per language") {
    val got = SparkEntry.queries("q127_sample_weighted")(spark, sf).collect()
      .map(r => (r.getString(1), r.getAs[Long]("rn")) -> r.getLong(0)).toMap
    val docs = Tables(spark, sf, "documents").select("doc_id", "lang", "n_chars").collect()
    def key(id: Long, w: Long): Double = {
      val u = ((id * 2654435761L) % 1000003L + 1L).toDouble / 1000004.0
      math.floor(math.log(u) / math.max(w, 1L) * 1e6 + 0.5) / 1e6
    }
    docs.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      val want = rs.map(r => (r.getLong(0), key(r.getLong(0), r.getLong(2))))
        .sortBy { case (id, k) => (-k, id) }.take(5).map(_._1)
      want.zipWithIndex.foreach { case (id, i) =>
        assert(got((lang, i + 1L)) == id, s"$lang rank ${i + 1}")
      }
    }
    // heavier docs are favored: the sample's mean length exceeds the
    // population mean in every language on this corpus (weight = length)
    val popMean = docs.groupBy(_.getString(1)).view
      .mapValues(rs => rs.map(_.getLong(2)).sum.toDouble / rs.length).toMap
    val sampleRows = SparkEntry.queries("q127_sample_weighted")(spark, sf).collect()
    sampleRows.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      val m = rs.map(_.getAs[Long]("n_chars")).sum.toDouble / rs.length
      assert(m > popMean(lang) * 0.8, s"$lang: sample mean $m vs pop ${popMean(lang)}")
    }
  }

  test("q128 mode is the true max-count segment with smallest-value ties") {
    val got = SparkEntry.queries("q128_agg_mode")(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getLong(2))).toMap
    val counts = Tables(spark, sf, "customer").collect()
      .groupBy(r => (r.getAs[Int]("c_nationkey"), r.getAs[String]("c_mktsegment")))
      .view.mapValues(_.length.toLong).toMap
    counts.keys.map(_._1).toSet.foreach { (nat: Int) =>
      val best = counts.filter(_._1._1 == nat).toSeq
        .map { case ((_, seg), n) => (seg, n) }
        .minBy { case (seg, n) => (-n, seg) }
      assert(got(nat) == best, s"nation $nat: ${got(nat)} vs $best")
    }
  }

  test("q129 bigram LM: probs in (0,1], one consistent denominator per (lang,w1)") {
    val rows = SparkEntry.queries("q129_text_bigram_lm")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r.getString(0), r.getString(1))).foreach { case (key, rs) =>
      var sum = 0.0
      rs.foreach { r =>
        val p = r.getAs[Double]("prob")
        assert(p > 0.0 && p <= 1.0, s"$key prob $p")
        // implied denominator cnt/p must agree across the group (±r6 quantum)
        val denom = r.getAs[Long]("cnt") / p
        val denom0 = rs.head.getAs[Long]("cnt") / rs.head.getAs[Double]("prob")
        assert(math.abs(denom - denom0) / denom0 < 1e-3, s"$key denom $denom vs $denom0")
        sum += p
      }
      assert(sum <= 1.0 + 1e-4, s"$key probs sum $sum > 1")
    }
  }

  test("q133 chi2 terms non-negative; q134 gini in [0,1) for positive revenue") {
    val chi = SparkEntry.queries("q133_agg_chi_square")(spark, sf).collect()
    assert(chi.nonEmpty)
    chi.foreach(r => assert(r.getAs[Double]("chi2_part") >= 0.0))
    val gini = SparkEntry.queries("q134_agg_gini")(spark, sf).collect()
    assert(gini.nonEmpty)
    gini.foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 && g < 1.0, s"${r.getString(0)}: gini $g")
    }
  }

  test("q135 cohort offset 0 equals the cohort size; actives never exceed it") {
    val rows = SparkEntry.queries("q135_cohort_retention")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("active_users")).toMap
    assert(rows.nonEmpty)
    val sizes = rows.collect { case ((c, 0L), n) => c -> n }
    assert(sizes.nonEmpty, "every cohort must have an offset-0 row")
    rows.foreach { case ((c, off), n) =>
      assert(off >= 0L)
      assert(n <= rows((c, 0L)), s"cohort $c offset $off: $n > cohort size")
    }
  }

  test("q136 A/B arms partition the users; rates in [0,1]; q137 scores in 1..5") {
    val ab = SparkEntry.queries("q136_ab_test")(spark, sf).head()
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(ab.getAs[Long]("n_a") + ab.getAs[Long]("n_b") == nUsers)
    assert(ab.getAs[Long]("conv_a") <= ab.getAs[Long]("n_a"))
    assert(ab.getAs[Long]("conv_b") <= ab.getAs[Long]("n_b"))
    for (c <- Seq("rate_a", "rate_b")) {
      val r = ab.getAs[Double](c)
      assert(r >= 0.0 && r <= 1.0, s"$c = $r")
    }
    val rfm = SparkEntry.queries("q137_rfm_scoring")(spark, sf).collect()
    assert(rfm.length == nUsers)
    rfm.foreach { r =>
      val (rs, fs, ms) = (r.getAs[Long]("r_score"), r.getAs[Long]("f_score"), r.getAs[Long]("m_score"))
      assert(rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 && ms >= 1 && ms <= 5)
      assert(r.getAs[Long]("rfm_code") == rs * 100 + fs * 10 + ms)
    }
    // quintile grading is balanced up to ties: every grade bucket ≤ ~40%
    val byF = rfm.groupBy(_.getAs[Long]("f_score")).view.mapValues(_.length).toMap
    assert(byF.values.forall(_ <= nUsers * 0.4 + 1), byF.toString)
  }

  test("q138 anomaly scores only after warmup; q139 skew stats are coherent") {
    val an = SparkEntry.queries("q138_ts_anomaly")(spark, sf).collect()
    assert(an.nonEmpty)
    an.foreach { r =>
      val warm = r.getAs[Long]("n_trail") >= 12
      if (!warm) assert(r.isNullAt(r.fieldIndex("z")), "cold-start rows must not score")
      if (r.getAs[Boolean]("anomalous")) assert(math.abs(r.getAs[Double]("z")) > 2.0)
    }
    val skew = SparkEntry.queries("q139_skew_report")(spark, sf).collect()
    assert(skew.length == 3)
    skew.foreach { r =>
      assert(r.getAs[Long]("n_keys") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("max_per_key") >= 1L)
      val share = r.getAs[Double]("top1_share")
      assert(share > 0.0 && share <= 1.0)
      assert(r.getAs[Double]("p99_per_key") >= r.getAs[Double]("p50_per_key"))
    }
  }

  test("q140 published table is k-5-safe; q141 metrics reconcile with it") {
    val pub = SparkEntry.queries("q140_anon_pipeline")(spark, sf).collect()
    // pseudonyms unique (same injectivity contract as q36)
    assert(pub.map(_.getString(0)).distinct.length == pub.length)
    // every surviving QI triple appears >= 5 times; suppression is all-or-nothing per row
    val cells = pub.filter(!_.isNullAt(1))
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    cells.groupBy(identity).values.foreach(g => assert(g.length >= 5, s"cell ${g.head} < k"))
    pub.foreach(r => assert(r.isNullAt(1) == r.isNullAt(2) && r.isNullAt(2) == r.isNullAt(3)))
    val u = SparkEntry.queries("q141_anon_utility")(spark, sf).head()
    assert(u.getAs[Long]("n_rows") == pub.length)
    assert(u.getAs[Long]("suppressed_rows") == pub.count(_.isNullAt(1)))
    // discernibility recomputed directly from the published cells
    val dm = cells.groupBy(identity).values.map(g => g.length.toLong * g.length).sum +
      pub.length.toLong * pub.count(_.isNullAt(1))
    assert(u.getAs[Long]("discernibility") == dm)
  }

  test("q119 OHLC bars: o/h/l/c ordering invariants and volume consistency") {
    val bars = SparkEntry.queries("q119_ts_ohlc")(spark, sf).collect()
    assert(bars.nonEmpty)
    bars.foreach { b =>
      val (o, h, l, c) = (b.getAs[Double]("open"), b.getAs[Double]("high"),
        b.getAs[Double]("low"), b.getAs[Double]("close"))
      assert(l <= o && o <= h && l <= c && c <= h && l <= h)
      assert(b.getAs[Long]("n_events") > 0)
    }
    // volumes sum to the whole-table sum (same r6/decimal path as q56)
    val volSum = bars.map(_.getAs[Double]("volume")).sum
    val direct = Tables.events(spark, sf)
      .agg(Tables.r6(org.apache.spark.sql.functions.sum(
        Tables.dec(org.apache.spark.sql.functions.col("value"))).cast("double")))
      .collect()(0).getDouble(0)
    assert(math.abs(volSum - direct) < 1e-3)
  }

  test("q142 equi-depth bins: near-equal populations, ordered disjoint extents") {
    val bins = SparkEntry.queries("q142_equidepth_bins")(spark, sf).collect()
    assert(bins.map(_.getAs[Long]("bin")).toSeq == (1L to 8L))
    val total = Tables(spark, sf, "orders").count()
    assert(bins.map(_.getAs[Long]("n")).sum == total)
    // equal-population up to quantile-boundary ties: no bin deviates
    // from n/8 by more than 2 (money values are near-distinct)
    val target = total / 8.0
    bins.foreach(b => assert(math.abs(b.getAs[Long]("n") - target) <= 2,
      s"bin ${b.getAs[Long]("bin")} holds ${b.getAs[Long]("n")} vs ~$target"))
    // extents are internally sane and strictly ordered across bins
    bins.foreach(b => assert(b.getAs[Double]("lo") <= b.getAs[Double]("hi")))
    bins.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"),
        s"bins ${a.getAs[Long]("bin")}/${b.getAs[Long]("bin")} overlap")
    }
  }

  test("q143 perplexity: n_bigrams reconciles with token counts, NLL positive") {
    val scored = SparkEntry.queries("q143_text_perplexity")(spark, sf).collect()
    assert(scored.nonEmpty)
    scored.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") > 0)
      assert(r.getAs[Double]("avg_nll") > 0.0) // probs < 1 ⇒ −ln > 0
    }
    // n_bigrams == token count − 1 for every scored doc
    val expected = Tables(spark, sf, "documents")
      .selectExpr("doc_id", "size(split(text, ' ')) - 1 AS nb")
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    scored.foreach(r => assert(
      r.getAs[Long]("n_bigrams") == expected(r.getAs[Long]("doc_id"))))
    // a doc made of the corpus's most common bigrams would score lower
    // than a doc of rare ones — proxy check: scores are not constant
    assert(scored.map(_.getAs[Double]("avg_nll")).distinct.length > 1)
  }

  test("q145 attribution: same-user prior click, gap within lookback") {
    val rows = SparkEntry.queries("q145_attribution_last_touch")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .selectExpr("event_id", "user_id", "ts_us").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      if (!r.isNullAt(3)) {
        val (cu, cts) = clicks(r.getLong(3))
        assert(cu == r.getLong(1), "attributed click belongs to another user")
        assert(cts <= r.getLong(2), "attributed click is after the purchase")
        assert(r.getLong(4) == r.getLong(2) - cts, "gap inconsistent")
        assert(r.getLong(4) <= 3600000000L, "gap beyond the 1 h lookback")
      } else assert(r.isNullAt(4), "gap set on an unattributed purchase")
    }
    // every purchase appears exactly once, attributed or not
    val np = ev.filter(org.apache.spark.sql.functions.col("event_type") === "purchase").count()
    assert(rows.length.toLong == np)
  }

  test("q146 journeys: partition of users, ≤5 steps, rank-limit pushed down") {
    val df = SparkEntry.queries("q146_user_journeys")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // journeys partition the user base
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers)
    // at most 5 steps; every step is a real event type
    val types = Set("click", "view", "purchase", "signup", "error")
    rows.foreach { r =>
      val steps = r.getAs[String]("journey").split(">")
      assert(steps.length <= 5 && steps.forall(types))
    }
    // the scale claim: the rank filter runs as a WindowGroupLimit (per-
    // partition top-k prune), not a full window over each user's history
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "rn <= 5 did not plan a WindowGroupLimit:\n" +
        df.queryExecution.executedPlan.toString)
  }

  test("q147 triangles: matches in-memory enumeration on the nation graph") {
    val got = SparkEntry.queries("q147_graph_triangles")(spark, sf).collect()
      .map(r => r.getAs[Number](0).longValue -> r.getAs[Long]("n_triangles")).toMap
    // reference: enumerate triangles naively from the same edge set
    val und = operators.GraphOps.nationEdges(spark, sf).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val expect = nodes.map { n =>
      n -> (for {
        Seq(a, b) <- nodes.filter(_ != n).combinations(2).toSeq
        if und(math.min(n, a) -> math.max(n, a)) &&
          und(math.min(n, b) -> math.max(n, b)) &&
          und(math.min(a, b) -> math.max(a, b))
      } yield 1).size.toLong
    }.filter(_._2 > 0).toMap
    assert(got == expect, s"got $got want $expect")
  }

  test("q148 exact-k sample: 10 per language, rank-limit pushed down") {
    val df = SparkEntry.queries("q148_sample_group_k")(spark, sf)
    val rows = df.collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    val nLangs = Tables(spark, sf, "documents").select("lang").distinct().count()
    assert(byLang.size.toLong == nLangs)
    byLang.foreach { case (lang, rs) =>
      assert(rs.map(_.getAs[Long]("rn")).sorted.toSeq == (1L to 10L), s"$lang ranks off")
    }
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("q149 PMI: independent recomputation for the top collocation") {
    val rows = SparkEntry.queries("q149_token_pmi")(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("cnt") >= 5L))
    // recompute the top row's PMI from raw bigram counts
    val top = rows.head
    val (w1, w2) = (top.getAs[String]("w1"), top.getAs[String]("w2"))
    val bigrams = Tables(spark, sf, "documents").collect()
      .map(_.getAs[String]("text").split(" "))
      .filter(_.length >= 2)
      .flatMap(ts => ts.zip(ts.tail))
    val cxy = bigrams.count(p => p._1 == w1 && p._2 == w2).toDouble
    val c1 = bigrams.count(_._1 == w1).toDouble
    val c2 = bigrams.count(_._2 == w2).toDouble
    val pmi = math.floor(math.log(cxy * bigrams.length / (c1 * c2)) * 1e6 + 0.5) / 1e6
    assert(top.getAs[Long]("cnt").toDouble == cxy)
    assert(math.abs(top.getAs[Double]("pmi") - pmi) < 1e-9,
      s"pmi ${top.getAs[Double]("pmi")} vs recomputed $pmi")
    // PMI is sorted descending with a (w1, w2) tiebreak
    val ps = rows.map(_.getAs[Double]("pmi"))
    assert(ps.zip(ps.tail).forall { case (a, b) => a >= b })
  }

  test("q150 curation: stage counts reconcile; near stage agrees with q83") {
    val rows = SparkEntry.queries("q150_curation_pipeline")(spark, sf).collect()
    assert(rows.nonEmpty)
    // every document lands in exactly one bucket
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("n_drop_exact") + r.getAs[Long]("n_drop_near") +
        r.getAs[Long]("n_drop_quality") + r.getAs[Long]("n_kept"))
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables(spark, sf, "documents").count())
    assert(rows.map(_.getAs[Long]("kept_tokens")).sum > 0)
    // with no exact dups in this corpus, the near stage must drop exactly
    // the distinct HIGHER ids of q83's Hamming-≤3 pair set
    if (rows.map(_.getAs[Long]("n_drop_exact")).sum == 0) {
      val pairsHi = SparkEntry.queries("q83_dedup_simhash_pairs")(spark, sf)
        .select("ib").distinct().count()
      assert(rows.map(_.getAs[Long]("n_drop_near")).sum == pairsHi)
    }
  }

  test("q144 LOCF backfill: non-gap rows keep their value, gaps take the prior one") {
    val rows = SparkEntry.queries("q144_ts_backfill")(spark, sf).collect()
    val raw = Tables.events(spark, sf)
      .selectExpr("event_id", "user_id", "ts_us", "event_type", "value")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toMap
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    // reference LOCF computed in-memory per user
    val filled = rows.map(r => r.getLong(0) ->
      (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    raw.toSeq.groupBy(_._2._1).foreach { case (_, evs) =>
      var last: Option[Double] = None
      evs.sortBy(e => (e._2._2, e._1)).foreach { case (id, (_, _, typ, v)) =>
        if (typ != "view") last = Some(v)
        assert(filled(id) == last.map(r6),
          s"event $id: got ${filled(id)}, want ${last.map(r6)}")
      }
    }
  }

  test("q151 lattice: top node holds everyone; optimal = minimal satisfying height") {
    val rows = SparkEntry.queries("q151_anon_lattice")(spark, sf).collect()
    assert(rows.length == 18) // 3 × 3 × 2 lattice
    val top = rows.find(r => r.getAs[Int]("lvl_nation") == 2 &&
      r.getAs[Int]("lvl_bal") == 2 && r.getAs[Int]("lvl_seg") == 1).get
    assert(top.getAs[Long]("n_cells") == 1L)
    assert(top.getAs[Long]("min_cell") == Tables(spark, sf, "customer").count())
    assert(top.getAs[Boolean]("meets_k"))
    val meetHeights = rows.filter(_.getAs[Boolean]("meets_k"))
      .map(_.getAs[Int]("height"))
    assert(meetHeights.nonEmpty)
    val bestH = meetHeights.min
    rows.foreach { r =>
      val expect = r.getAs[Boolean]("meets_k") && r.getAs[Int]("height") == bestH
      assert(r.getAs[Boolean]("optimal") == expect, s"optimal flag off at $r")
    }
  }

  test("q152 DP histogram: matches the in-memory contribution-bounded mechanism") {
    import java.security.MessageDigest
    def md5hex(s: String) = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    val pairs = Tables.events(spark, sf)
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val clamped = pairs.groupBy(_._1).values.flatMap { ps =>
      ps.sortBy { case (u, t) => (md5hex(s"$u:$t"), t) }.take(2)
    }
    val want = clamped.groupBy(_._2).map { case (t, xs) =>
      val key = t.head.toInt.toLong
      val u = ((key * 2654435761L) % 1000003L + 1L).toDouble / 1000004.0
      val v = u - 0.5
      val s = if (v >= 0) 1.0 else -1.0
      t -> r6(xs.size.toDouble + (-4.0) * s * math.log(1.0 - 2.0 * math.abs(v)))
    }
    val got = SparkEntry.queries("q152_dp_user_histogram")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == want, s"got $got want $want")
  }

  test("q153 kNN: probes only, bounded votes, labels from the label domain") {
    val rows = SparkEntry.queries("q153_knn_classify")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val labels = Tables(spark, sf, "embeddings").select("label").distinct()
      .collect().map(_.getInt(0)).toSet
    rows.foreach { r =>
      assert(r.getLong(0) < 20L)
      assert(labels.contains(r.getAs[Int]("pred_label")))
      val v = r.getAs[Long]("votes")
      assert(v >= 1L && v <= 5L)
    }
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("q154 Benford: counts reconcile with orders; expected shares sum to 1") {
    val rows = SparkEntry.queries("q154_benford_audit")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("digit")).sorted.toSeq == (1L to 9L))
    assert(rows.map(_.getAs[Long]("n_obs")).sum ==
      Tables(spark, sf, "orders").count())
    assert(math.abs(rows.map(_.getAs[Double]("exp_p")).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getAs[Double]("obs_p")).sum - 1.0) < 1e-4)
    rows.foreach(r => assert(r.getAs[Double]("chi2_part") >= 0.0))
  }

  test("q155 EWMA: first row per type equals its value; taps recompute") {
    val rows = SparkEntry.queries("q155_ewma_trend")(spark, sf).collect()
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    val decay = Seq(1.0, 0.8, 0.64, 0.512, 0.4096, 0.32768, 0.262144,
      0.2097152, 0.16777216, 0.134217728, 0.1073741824, 0.08589934592)
    rows.groupBy(_.getString(0)).values.foreach { series =>
      val s = series.sortBy(_.getLong(1))
      assert(s.head.getAs[Double]("ewma") == s.head.getAs[Double]("v"))
      // recompute the FIR at the last point of each series
      val i = s.length - 1
      val taps = (0 until math.min(12, i + 1)).map(k => (decay(k), s(i - k).getAs[Double]("v")))
      val want = r6(taps.map { case (w, v) => w * v }.sum / taps.map(_._1).sum)
      assert(math.abs(s(i).getAs[Double]("ewma") - want) < 2e-6,
        s"${s.head.getString(0)} last ewma ${s(i).getAs[Double]("ewma")} want $want")
    }
  }

  test("q156 MI: cells reconcile with customers; MI nonnegative; PMI recomputes") {
    val rows = SparkEntry.queries("q156_mutual_info")(spark, sf).collect()
    val nTotal = rows.map(_.getAs[Long]("n")).sum
    assert(nTotal == Tables(spark, sf, "customer").count())
    assert(rows.map(_.getAs[Double]("mi_part")).sum >= -1e-6)
    // recompute one cell's PMI from the collected cell frame
    val nx = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getAs[Long]("n")).sum)
    val ny = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getAs[Long]("n")).sum)
    val r = rows.head
    val want = math.floor(math.log(r.getAs[Long]("n").toDouble * nTotal /
      (nx(r.getString(0)).toDouble * ny(r.getString(1)))) * 1e6 + 0.5) / 1e6
    assert(math.abs(r.getAs[Double]("pmi") - want) < 1e-9)
  }

  test("q157 contrastive pairs: positives are q83's pair set; negatives disjoint") {
    val rows = SparkEntry.queries("q157_contrastive_pairs")(spark, sf).collect()
    val (pos, neg) = rows.partition(_.getAs[Int]("label") == 1)
    assert(pos.nonEmpty && neg.nonEmpty)
    pos.foreach(r => assert(r.getAs[Long]("hamming") <= 3L))
    rows.foreach(r => assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    val posSet = pos.map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(posSet.size == pos.length)
    val q83 = SparkEntry.queries("q83_dedup_simhash_pairs")(spark, sf).collect()
      .map(r => (r.getAs[Long]("ia"), r.getAs[Long]("ib"))).toSet
    assert(posSet == q83)
    assert(neg.length <= pos.length) // capped at n_pos (and by the derangement span)
  }

  test("q158 context windows: stride/length law holds; windows recompute for one doc") {
    val rows = SparkEntry.queries("q158_context_windows")(spark, sf).collect()
    val docs = Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    val byDoc = rows.groupBy(_.getLong(0))
    docs.foreach { case (id, ts) =>
      val expect = if (ts.length >= 9) (ts.length - 9) / 4 + 1 else 0
      assert(byDoc.get(id).map(_.length).getOrElse(0) == expect, s"doc $id window count")
    }
    // recompute the densest doc's windows
    val (id, ts) = docs.maxBy(_._2.length)
    byDoc(id).sortBy(_.getInt(1)).zipWithIndex.foreach { case (r, w) =>
      assert(r.getString(2) == ts.slice(w * 4, w * 4 + 8).mkString(" "))
      assert(r.getString(3) == ts(w * 4 + 8))
    }
  }

  test("q160 BPE merges: top pair per language recomputes from the raw corpus") {
    val rows = SparkEntry.queries("q160_bpe_merges")(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to rs.length.toLong))
      assert(rs.length <= 10)
    }
    val corpus = Tables(spark, sf, "documents").select("lang", "text").collect()
    val counts = corpus.flatMap { r =>
      r.getString(1).split(" ").filter(_.length >= 2)
        .flatMap(w => w.sliding(2).map(p => (r.getString(0), p)))
    }.groupBy(identity).view.mapValues(_.length.toLong)
    rows.filter(_.getAs[Long]("rank") == 1L).foreach { r =>
      val lang = r.getString(0)
      val maxCnt = counts.collect { case ((l, _), c) if l == lang => c }.max
      assert(r.getAs[Long]("cnt") == counts((lang, r.getString(2))),
        s"$lang top pair count mismatch")
      assert(r.getAs[Long]("cnt") == maxCnt, s"$lang rank-1 is not the max count")
    }
  }

  test("q161 anatomy: groups partition customers; ≤1 record per segment per group") {
    val rows = SparkEntry.queries("q161_anon_anatomy")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_records")).sum ==
      Tables(spark, sf, "customer").count())
    rows.foreach { r =>
      // anatomy invariant: every group holds at most one record per
      // sensitive value, so l == |group|
      assert(r.getAs[Long]("l_div") == r.getAs[Long]("n_records"))
      assert(r.getAs[Boolean]("meets_l3") == (r.getAs[Long]("l_div") >= 3))
      assert(r.getAs[Long]("n_nations") <= r.getAs[Long]("n_records"))
    }
    // group ids are the dense 1..maxRank range
    val ids = rows.map(_.getAs[Long]("group_id")).sorted
    assert(ids.toSeq == (1L to ids.length.toLong))
  }

  test("q162 FD audit: key FD has zero violations; rates recompute") {
    val rows = SparkEntry.queries("q162_fd_audit")(spark, sf).collect()
    assert(rows.length == 4)
    val byFd = rows.map(r => r.getString(0) -> r).toMap
    val keyFd = byFd("o_orderkey->o_orderpriority")
    assert(keyFd.getAs[Long]("n_violating") == 0L)
    assert(keyFd.getAs[Long]("n_groups") == Tables(spark, sf, "orders").count())
    rows.foreach { r =>
      val want = math.floor(r.getAs[Long]("n_violating").toDouble /
        r.getAs[Long]("n_groups") * 1e6 + 0.5) / 1e6
      assert(r.getAs[Double]("violation_rate") == want)
      assert(r.getAs[Long]("n_violating") <= r.getAs[Long]("n_groups"))
    }
  }

  test("q163 seasonal profile: cells reconcile with events; index recomputes") {
    val rows = SparkEntry.queries("q163_ts_seasonal")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.events(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("hod") >= 0L && r.getAs[Long]("hod") < 24L)
      // seasonal index ≈ mean_v / type_mean (both r6-quantized separately,
      // so allow the quantization slack)
      val approx = r.getAs[Double]("mean_v") / r.getAs[Double]("type_mean")
      assert(math.abs(r.getAs[Double]("seasonal_index") - approx) < 1e-4)
    }
  }

  test("q164 boilerplate: every doc reported; token arithmetic holds") {
    val rows = SparkEntry.queries("q164_boilerplate_segments")(spark, sf).collect()
    val nDocs = Tables(spark, sf, "documents").count()
    assert(rows.length.toLong == nDocs)
    rows.foreach { r =>
      val (nt, ns, nb) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_segments"), r.getAs[Long]("n_boiler"))
      assert(ns == nt / 8, s"doc ${r.getLong(0)}: $ns segments for $nt tokens")
      assert(nb <= ns)
      assert(r.getAs[Long]("cleaned_tokens") == nt - 8 * nb)
    }
  }

  test("q165 kappa: agrees with a direct recompute from q64's per-doc output") {
    val pred = SparkEntry.queries("q64_text_langid")(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val n = pred.length.toDouble
    val po = pred.count(p => p._1 == p._2) / n
    val nt = pred.groupBy(_._1).view.mapValues(_.size)
    val np = pred.groupBy(_._2).view.mapValues(_.size)
    val pe = nt.map { case (c, t) => t.toDouble * np.getOrElse(c, 0) }.sum / (n * n)
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    val row = SparkEntry.queries("q165_langid_kappa")(spark, sf).head()
    assert(row.getAs[Long]("n_docs").toDouble == n)
    assert(row.getAs[Double]("po") == r6(po))
    assert(row.getAs[Double]("pe") == r6(pe))
    assert(row.getAs[Double]("kappa") == r6((po - pe) / (1.0 - pe)))
  }

  test("q166 profile: counts match the table; scans prune to one column each") {
    val df = SparkEntry.queries("q166_column_profile")(spark, sf)
    val rows = df.collect()
    assert(rows.length == 5)
    val cust = Tables(spark, sf, "customer")
    val n = cust.count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_nonnull") + r.getAs[Long]("n_null") == n)
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_nonnull"))
    }
    val segs = rows.find(_.getString(0) == "c_mktsegment").get
    assert(segs.getAs[Long]("n_distinct") ==
      cust.select("c_mktsegment").distinct().count())
    // every scan in the plan reads exactly one column (profiler pruning)
    val scans = "ReadSchema: struct<[^>]*>".r
      .findAllIn(df.queryExecution.executedPlan.toString).toList
    assert(scans.nonEmpty && scans.forall(s => !s.contains(",")),
      s"multi-column profile scan: $scans")
  }

  test("q167 BPE apply: rank-1 merge from q160; token arithmetic recomputes") {
    val rows = SparkEntry.queries("q167_bpe_apply")(spark, sf).collect()
    val top = SparkEntry.queries("q160_bpe_merges")(spark, sf).collect()
      .filter(_.getAs[Long]("rank") == 1L)
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(rows.length == top.size)
    val vocab = Tables(spark, sf, "documents").select("lang", "text").collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.length >= 2).map((r.getString(0), _)))
    rows.foreach { r =>
      val (lang, pair) = (r.getString(0), r.getString(1))
      assert(top(lang) == pair)
      val words = vocab.filter(_._1 == lang).map(_._2)
      def occ(w: String) = (w.length - w.replace(pair, "").length) / 2
      assert(r.getAs[Long]("tokens_before") == words.map(_.length.toLong).sum)
      assert(r.getAs[Long]("tokens_after") ==
        words.map(w => (w.length - occ(w)).toLong).sum)
      assert(r.getAs[Long]("words_affected") == words.count(occ(_) > 0).toLong)
      assert(r.getAs[Double]("compression") <= 1.0)
    }
  }

  test("q168 dataset card: volumes reconcile; shares sum to 1") {
    val rows = SparkEntry.queries("q168_dataset_card")(spark, sf).collect()
    val docs = Tables(spark, sf, "documents")
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    assert(math.abs(rows.map(_.getAs[Double]("share_docs")).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getAs[Double]("share_tokens")).sum - 1.0) < 1e-4)
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_tokens") > 0)
      // quality is bounded by its formula: 0.001·chars + 0.5·uniq − stop
      assert(r.getAs[Double]("avg_quality") > -1.0 &&
        r.getAs[Double]("avg_quality") < 2.0)
    }
  }

  test("q169 k-fold: exact balance within every stratum; totals reconcile") {
    val rows = SparkEntry.queries("q169_stratified_kfold")(spark, sf).collect()
    val byLang = rows.groupBy(_.getString(0))
    val langTotals = Tables(spark, sf, "documents").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet == langTotals.keySet)
    byLang.foreach { case (lang, rs) =>
      assert(rs.map(_.getAs[Long]("n_docs")).sum == langTotals(lang))
      assert(rs.map(_.getAs[Long]("fold")).sorted.toSeq == (0L until math.min(5, langTotals(lang))))
      val sizes = rs.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1, s"$lang folds unbalanced: ${sizes.toSeq}")
    }
  }

  test("q170 graph jaccard: top pair recomputes from raw part sets") {
    val rows = SparkEntry.queries("q170_graph_jaccard")(spark, sf).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val parts = Tables(spark, sf, "lineitem").select("l_suppkey", "l_partkey")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { r =>
      val (sa, sb) = (r.getAs[Long]("sa"), r.getAs[Long]("sb"))
      assert(sa < sb)
      val (pa, pb) = (parts(sa), parts(sb))
      assert(r.getAs[Long]("da") == pa.size.toLong)
      assert(r.getAs[Long]("db") == pb.size.toLong)
      // shared counts only cap-surviving parts, so it's ≤ the raw overlap
      assert(r.getAs[Long]("shared") <= (pa & pb).size.toLong)
      assert(r.getAs[Double]("jaccard") > 0.0 && r.getAs[Double]("jaccard") <= 1.0)
    }
    // descending by jaccard with (sa, sb) tiebreak
    val js = rows.map(_.getAs[Double]("jaccard"))
    assert(js.zip(js.tail).forall { case (a, b) => a >= b })
  }

  test("q171 sequence mining: transitions recompute from in-memory sequences") {
    val rows = SparkEntry.queries("q171_seq_mining")(spark, sf).collect()
    assert(rows.nonEmpty)
    val seqs = Tables.events(spark, sf)
      .selectExpr("user_id", "ts_us", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._2, e._3)).map(_._4).toSeq)
    val trans = seqs.toSeq.flatMap { case (u, s) => s.zip(s.tail).map((u, _)) }
    val byPair = trans.groupBy(_._2)
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getAs[Long]("n_users") == byPair(key).map(_._1).distinct.size.toLong)
      assert(r.getAs[Long]("n_occ") == byPair(key).size.toLong)
      assert(r.getAs[Long]("n_users") >= 2L)
    }
    // support-pruned pairs really are below threshold
    val reported = rows.map(r => (r.getString(0), r.getString(1))).toSet
    byPair.foreach { case (k, v) =>
      if (!reported(k)) assert(v.map(_._1).distinct.size < 2)
    }
  }

  test("q172 CUSUM: changepoint is the argmax of the recomputed deviation series") {
    val rows = SparkEntry.queries("q172_changepoint_cusum")(spark, sf).collect()
    // recompute per type from raw events via exact BigDecimal arithmetic
    val raw = Tables.events(spark, sf)
      .selectExpr("event_type", "ts_us DIV 86400000000 AS day", "CAST(value AS DECIMAL(18,4)) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
    raw.groupBy(_._1).foreach { case (et, evs) =>
      val byDay = evs.groupBy(_._2).view.mapValues(_.map(e => BigDecimal(e._3)).sum)
        .toSeq.sortBy(_._1)
      val mu = byDay.map(_._2).sum.toDouble / byDay.length
      var s = BigDecimal(0)
      val cus = byDay.zipWithIndex.map { case ((day, v), i) =>
        s += v; (day, s.toDouble - (i + 1) * mu)
      }
      val best = cus.minBy { case (day, cu) => (-math.abs(cu), day) }
      val got = rows.find(_.getString(0) == et).get
      assert(got.getAs[Long]("change_day") == best._1, s"$et day")
      assert(got.getAs[Long]("n_days") == byDay.length.toLong)
      assert(math.abs(got.getAs[Double]("cusum") -
        math.floor(best._2 * 1e6 + 0.5) / 1e6) < 1e-9, s"$et cusum")
      assert(got.getString(4) == (if (best._2 >= 0) "up" else "down"))
    }
  }

  test("q173 Zipf fit: slope negative; head extraction is TakeOrdered, not a global sort") {
    val df = SparkEntry.queries("q173_zipf_fit")(spark, sf)
    val row = df.head()
    assert(row.getAs[Long]("n_tokens_fit") > 0)
    assert(row.getAs[Double]("zipf_slope") < 0.0) // frequency decays with rank
    assert(row.getAs[Double]("intercept") > 0.0)
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("q174 IQR outliers: quartiles and fences recompute from collected balances") {
    val rows = SparkEntry.queries("q174_iqr_outliers")(spark, sf).collect()
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    val bySeg = Tables(spark, sf, "customer").select("c_mktsegment", "c_acctbal")
      .collect().map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    assert(rows.length == bySeg.size)
    rows.foreach { r =>
      val vals = bySeg(r.getString(0)).map(_._2).sorted
      // Spark percentile semantics: pos = p·(n−1), linear interpolation
      def pct(p: Double): Double = {
        val pos = p * (vals.length - 1)
        val (l, h) = (math.floor(pos).toInt, math.ceil(pos).toInt)
        if (l == h) vals(l) else vals(l) + (pos - l) * (vals(h) - vals(l))
      }
      val (q1, q3) = (r6(pct(0.25)), r6(pct(0.75)))
      assert(r.getAs[Double]("q1") == q1 && r.getAs[Double]("q3") == q3,
        s"${r.getString(0)} quartiles")
      val (lo, hi) = (q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))
      assert(r.getAs[Long]("n_outliers") ==
        vals.count(v => v < lo || v > hi).toLong, s"${r.getString(0)} outliers")
      assert(r.getAs[Long]("n") == vals.length.toLong)
    }
  }

  test("q175 decile lift: populations near-equal; rates reconcile with base") {
    val rows = SparkEntry.queries("q175_decile_lift")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("decile")).sorted.toSeq == (1L to 10L))
    val n = Tables(spark, sf, "customer").count()
    assert(rows.map(_.getAs[Long]("n")).sum == n)
    // equi-depth up to ties: no decile more than 2× the ideal population
    rows.foreach(r => assert(r.getAs[Long]("n") <= 2 * n / 10 + 1))
    val conv = rows.map(_.getAs[Long]("n_converted")).sum
    val base = rows.head.getAs[Double]("base_rate")
    assert(base == math.floor(conv.toDouble / n * 1e6 + 0.5) / 1e6)
    rows.foreach { r =>
      val rate = r.getAs[Double]("conv_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Double]("lift") ==
        math.floor(rate / base * 1e6 + 0.5) / 1e6)
    }
  }

  test("q176 linear attribution: touch counts recompute; consistent with q145") {
    val rows = SparkEntry.queries("q176_attribution_linear")(spark, sf).collect()
    val evs = Tables.events(spark, sf)
      .selectExpr("event_id", "user_id", "ts_us", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val purchases = evs.filter(_._4 == "purchase")
    assert(rows.length == purchases.length)
    val clicksByUser = evs.filter(_._4 == "click").groupBy(_._2)
    rows.foreach { r =>
      val (id, u, t) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val want = clicksByUser.getOrElse(u, Array.empty)
        .count(c => c._3 >= t - 3600000000L && c._3 <= t).toLong // closed [t-1h, t]: RANGE PRECEDING is inclusive
      assert(r.getAs[Long]("n_touches") == want, s"purchase $id touches")
      assert(r.getAs[Boolean]("organic") == (want == 0))
      if (want > 0)
        assert(r.getAs[Double]("credit_each") ==
          math.floor(1.0 / want * 1e6 + 0.5) / 1e6)
      else assert(r.isNullAt(4))
    }
    // cross-model consistency: a purchase q145 attributes (a click within
    // the hour) must have ≥1 touch here, and an organic one must have 0
    val lastTouch = SparkEntry.queries("q145_attribution_last_touch")(spark, sf)
      .collect().map(r => r.getLong(0) -> !r.isNullAt(3)).toMap
    val touches = rows.map(r => r.getLong(0) -> r.getAs[Long]("n_touches")).toMap
    lastTouch.foreach { case (id, attributed) =>
      // q145's frame is [start, t] ROWS-based vs q176's (t−1h, t] RANGE —
      // attribution implies at least one in-window click in both models
      if (attributed) assert(touches(id) >= 1L, s"purchase $id: q145 attributed, q176 organic")
    }
  }

  test("q177 funnel time: user counts match q86's funnel; medians recompute") {
    val rows = SparkEntry.queries("q177_funnel_time")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet ==
      Set("click->view", "view->purchase", "click->purchase"))
    val funnel = SparkEntry.queries("q86_funnel")(spark, sf).collect()
    def gaps(f: org.apache.spark.sql.Row => Option[Long]): Seq[Long] =
      funnel.flatMap(r => f(r)).toSeq
    def opt(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    // columns: user_id, t_click, t_view, t_purchase
    val cv = gaps(r => opt(r, 2).map(_ - r.getLong(1)))
    val vp = gaps(r => for (p <- opt(r, 3); v <- opt(r, 2)) yield p - v)
    val cp = gaps(r => opt(r, 3).map(_ - r.getLong(1)))
    def pct(vals: Seq[Long], p: Double): Double = {
      val s = vals.sorted.map(_.toDouble)
      val pos = p * (s.length - 1)
      val (l, h) = (math.floor(pos).toInt, math.ceil(pos).toInt)
      val raw = if (l == h || s(l) == s(h)) s(l)
        else (h - pos) * s(l) + (pos - l) * s(h)
      math.floor(raw * 1e6 + 0.5) / 1e6
    }
    for ((step, vals) <- Seq("click->view" -> cv, "view->purchase" -> vp,
        "click->purchase" -> cp)) {
      val r = rows(step)
      assert(r.getAs[Long]("n_users") == vals.length.toLong, s"$step count")
      assert(r.getAs[Double]("median_us") == pct(vals, 0.5), s"$step median")
      assert(r.getAs[Double]("p90_us") == pct(vals, 0.9), s"$step p90")
      assert(vals.forall(_ > 0))
    }
  }

  test("q158/q164: long documents (beyond any fixed oracle explode cap) " +
      "match the length-derived in-memory expectation") {
    // Regression pin for the r7 oracle fix: the pre-fix oracle SQL capped
    // the window/segment explode at range(0, 256) (q158) and
    // range(0, 4096) (q164), silently truncating docs past 1032 / 32768
    // tokens. The fixture's 33k-token document exceeds BOTH old caps, so
    // this test fails on the pre-fix bounds and pins the length-derived
    // ones. The expectation is computed independently in memory with the
    // same stride arithmetic the oracle SQL now encodes.
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_longdoc_").toString
    try {
      // shared 8-token prefix => segment 0 is boilerplate (df = 3 >= 3)
      val prefix = (1 to 8).map(i => s"pre$i")
      val docs = Seq(
        (1L, prefix ++ (9 to 33000).map(i => s"t$i")), // 33000 tokens
        (2L, prefix),                                  // exactly one segment
        (3L, prefix ++ (9 to 20).map(i => s"u$i")))    // 20 tokens
      spark.createDataFrame(docs.map { case (id, ts) =>
        (id, ts.mkString(" "), "en", "synthetic", ts.mkString(" ").length.toLong)
      }).toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$tmp/documents.parquet")

      // q158: context windows, CtxLen 8 / stride 4 / target = next token
      val winRows = SparkEntry.queries("q158_context_windows")(spark, tmp)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("win_id"),
          r.getAs[String]("context"), r.getAs[String]("target")))
      val winExpect = docs.flatMap { case (id, ts) =>
        val n = ts.length
        if (n < 9) Seq.empty
        else (0 to (n - 9) / 4).map { w =>
          (id, w, ts.slice(w * 4, w * 4 + 8).mkString(" "), ts(w * 4 + 8))
        }
      }
      assert(winExpect.exists(_._2 > 4096), "fixture must out-run the old caps")
      assert(winRows.toSeq == winExpect.sortBy(r => (r._1, r._2)),
        s"q158 windows diverge (got ${winRows.length}, want ${winExpect.length})")

      // q164: disjoint 8-token segments, boiler = segment text in >= 3 docs
      val segOf = (ts: Seq[String]) =>
        (0 until ts.length / 8).map(i => ts.slice(i * 8, i * 8 + 8).mkString(" "))
      val segDf = docs.flatMap { case (id, ts) => segOf(ts).distinct.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      val boilRows = SparkEntry.queries("q164_boilerplate_segments")(spark, tmp)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_segments"), r.getAs[Long]("n_boiler"),
          r.getAs[Long]("cleaned_tokens")))
      val boilExpect = docs.map { case (id, ts) =>
        val segs = segOf(ts)
        val nb = segs.count(s => segDf(s) >= 3).toLong
        (id, ts.length.toLong, segs.length.toLong, nb, ts.length - 8L * nb)
      }
      assert(boilExpect.exists(_._3 > 4096), "fixture must out-run the old caps")
      assert(boilRows.toSeq == boilExpect.sortBy(_._1),
        s"q164 segment audit diverges: got ${boilRows.toSeq.take(3)}...")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("q196–q198 eval family agrees with an in-memory scorer") {
    // independent mirror: score every document in memory with the same
    // integer-bin formula, then recompute AUC (tie-corrected rank-sum),
    // calibration deciles, and the tau=500 confusion row.
    val docs = Tables(spark, sf, "documents")
      .select("text", "lang").collect()
      .map { r =>
        val ts = r.getString(0).split(" ", -1)
        val bin = 1000L * ts.distinct.length / ts.length
        (bin, r.getString(1) == "en")
      }
    val p = docs.count(_._2).toLong
    val n = docs.size - p
    // exact tie-corrected AUC: Σ over pos/neg pairs of (score_p > score_n) + ½(=)
    var num2 = 0L // doubled numerator (exact)
    for ((bp, lp) <- docs if lp; (bn, ln) <- docs if !ln)
      num2 += (if (bp > bn) 2L else if (bp == bn) 1L else 0L)
    val aucExpect = num2.toDouble / (2.0 * p * n)
    val roc = SparkEntry.queries("q196_eval_roc_auc")(spark, sf).collect()
    val aucGot = roc.head.getAs[Double]("auc")
    assert(math.abs(aucGot - aucExpect) < 2e-6, s"AUC $aucGot vs $aucExpect")
    // curve sanity: cumulative rates are monotone in descending bin order
    // and end at (1, 1)
    val desc = roc.sortBy(-_.getAs[Long]("bin"))
    val tprs = desc.map(_.getAs[Double]("tpr"))
    val fprs = desc.map(_.getAs[Double]("fpr"))
    assert(tprs.zip(tprs.tail).forall { case (a, b) => a <= b })
    assert(fprs.zip(fprs.tail).forall { case (a, b) => a <= b })
    assert(tprs.last == 1.0 && fprs.last == 1.0)
    // calibration: decile counts partition the corpus; gap is consistent
    val cal = SparkEntry.queries("q197_eval_calibration")(spark, sf).collect()
    assert(cal.map(_.getAs[Long]("n")).sum == docs.size)
    cal.foreach { r =>
      assert(math.abs(r.getAs[Double]("gap") -
        (r.getAs[Double]("mean_pred") - r.getAs[Double]("pos_rate"))) < 3e-6)
    }
    // confusion at tau=500 against the direct count
    val conf = SparkEntry.queries("q198_eval_confusion")(spark, sf)
      .collect().find(_.getAs[Long]("tau") == 500L).get
    val tp = docs.count { case (b, l) => l && b >= 500 }.toLong
    val fp = docs.count { case (b, l) => !l && b >= 500 }.toLong
    assert(conf.getAs[Long]("tp") == tp && conf.getAs[Long]("fp") == fp)
    assert(conf.getAs[Long]("tp") + conf.getAs[Long]("fn") == p)
    assert(conf.getAs[Long]("fp") + conf.getAs[Long]("tn") == n)
  }

  test("q199/q200/q202 interval family agrees with an in-memory sweep") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts_us", "event_type").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("ts_us"), r.getAs[String]("event_type")))
    val usHour = 3600000000L
    val usDay = 86400000000L
    // q199: per (user, day) interval → covered hour buckets
    val covExpect = ev.groupBy(e => (e._1, e._3 / usDay)).toSeq
      .flatMap { case (_, es) =>
        (es.map(_._3).min / usHour) to (es.map(_._3).max / usHour)
      }
      .groupBy(identity).map { case (h, hs) => (h, hs.size.toLong) }
    val covGot = SparkEntry.queries("q199_interval_coverage")(spark, sf)
      .collect().map(r => (r.getAs[Long]("hour_bucket"), r.getAs[Long]("n_active")))
    assert(covGot.toMap == covExpect, "q199 hourly concurrency diverges")
    assert(covGot.map(_._1).toSeq == covGot.map(_._1).toSeq.sorted)
    // q200: interval union per user
    val uniExpect = ev.groupBy(_._1).map { case (u, es) =>
      val iv = es.groupBy(_._4).values
        .map(g => (g.map(_._3).min, g.map(_._3).max)).toSeq.sorted
      // classic merge sweep
      var blocks = List.empty[(Long, Long)]
      for ((s, e) <- iv) blocks match {
        case (bs, be) :: rest if s <= be => blocks = (bs, math.max(be, e)) :: rest
        case _ => blocks = (s, e) :: blocks
      }
      (u, blocks.size.toLong, blocks.map(b => b._2 - b._1).sum)
    }
    val uniGot = SparkEntry.queries("q200_interval_union")(spark, sf)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("n_blocks"), r.getAs[Long]("covered_us")))
    assert(uniGot.toSet == uniExpect.toSet, "q200 interval union diverges")
    // q202: nearest purchase within ±1 h, tie → earlier
    val nearGot = SparkEntry.queries("q202_join_nearest")(spark, sf)
      .collect().map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[java.lang.Long]("match_id")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("gap_us")).map(_.toLong)))
    val purchases = ev.filter(_._4 == "purchase").groupBy(_._1)
    val errors = ev.filter(_._4 == "error")
    assert(nearGot.length == errors.length)
    val errById = errors.map(e => e._2 -> e).toMap
    nearGot.foreach { case (id, m, g) =>
      val (u, _, ts, _) = errById(id)
      val gaps = purchases.getOrElse(u, Array.empty).map(_._3 - ts)
        .filter(d => math.abs(d) <= usHour)
      (m, g) match {
        case (None, None) =>
          assert(gaps.isEmpty, s"error $id unmatched but purchases in range")
        case (Some(mid), Some(gap)) =>
          // the match is a real same-user purchase at exactly that gap,
          // and the gap magnitude is minimal (ID choice among exact-gap
          // ties follows window order — not re-modelled here)
          val pu = purchases(u).find(_._2 == mid).get
          assert(pu._3 - ts == gap)
          assert(math.abs(gap) == gaps.map(math.abs).min,
            s"error $id matched gap $gap, nearer purchase exists")
        case other => fail(s"error $id half-null match $other")
      }
    }
  }

  test("q207 bucketed interval join equals the direct all-pairs overlap") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts_us", "event_type").collect()
      .map(r => (r.getAs[Long](0), r.getAs[Long](1), r.getAs[String](2)))
    val usDay = 86400000000L
    val a = ev.groupBy(e => (e._1, e._2 / usDay))
      .map { case ((u, d), es) => (u, d, es.map(_._2).min, es.map(_._2).max) }
    val b = ev.groupBy(e => (e._1, e._3))
      .map { case ((u, t), es) => (u, t, es.map(_._2).min, es.map(_._2).max) }
    val expect = (for {
      (ua, d, as_, ae) <- a
      (ub, t, bs, be) <- b
      if ua == ub && as_ <= be && bs <= ae
    } yield ((ua, d, t), math.min(ae, be) - math.max(as_, bs))).toMap
    val got = SparkEntry.queries("q207_join_interval_overlap")(spark, sf)
      .collect().map(r => ((r.getAs[Long]("user_id"), r.getAs[Long]("day"),
        r.getAs[String]("event_type")), r.getAs[Long]("overlap_us"))).toMap
    assert(got == expect, s"bucketed join diverges: ${got.size} vs ${expect.size} pairs")
  }

  test("q201 CDC apply: deletes gone, updates applied, inserts untouched") {
    val orders = Tables(spark, sf, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
      .map(r => (r.getAs[Long](0), r.getAs[String](1), r.getAs[Double](2)))
    val got = SparkEntry.queries("q201_cdc_apply")(spark, sf)
      .collect().map(r => (r.getAs[Long]("o_orderkey"),
        (r.getAs[Long]("n_ops"), r.getAs[Long]("last_seq"),
          r.getAs[Double]("final_price")))).toMap
    assert(got.size == orders.count(_._2 != "P"))
    orders.foreach { case (k, st, price) =>
      st match {
        case "P" => assert(!got.contains(k), s"deleted key $k survived")
        case "F" =>
          val (nOps, lastSeq, fp) = got(k)
          assert(nOps == 2L && lastSeq == 2L)
          assert(math.abs(fp - (price + 100.0)) < 1e-6)
        case _ =>
          val (nOps, lastSeq, fp) = got(k)
          assert(nOps == 1L && lastSeq == 1L)
          assert(math.abs(fp - price) < 1e-6)
      }
    }
  }

  test("q203 clustering coefficient consistent with q147 triangles and degrees") {
    val cc = SparkEntry.queries("q203_graph_clustering")(spark, sf).collect()
    val tri = SparkEntry.queries("q147_graph_triangles")(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getAs[Long]("n_triangles")).toMap
    cc.foreach { r =>
      val (node, deg, nt) = (r.getInt(0), r.getAs[Long]("degree"),
        r.getAs[Long]("n_triangles"))
      assert(nt == tri.getOrElse(node, 0L), s"node $node triangle mismatch")
      // a triangle needs two incident edges at the node
      assert(nt <= deg * (deg - 1) / 2)
      if (deg >= 2) {
        val v = r.getAs[Double]("cc")
        assert(v >= 0.0 && v <= 1.0)
        assert(math.abs(v - 2.0 * nt / (deg * (deg - 1.0))) < 2e-6)
      } else assert(r.isNullAt(r.fieldIndex("cc")))
    }
  }

  test("q204 HITS: L1-normalized nonnegative scores; authorities follow in-degree") {
    val rows = SparkEntry.queries("q204_graph_hits")(spark, sf).collect()
    val hubs = rows.map(_.getAs[Double]("hub"))
    val auths = rows.map(_.getAs[Double]("auth"))
    assert(hubs.forall(_ >= 0.0) && auths.forall(_ >= 0.0))
    // each half-step L1-normalizes; r6 rounding leaves ≤ nodes·1e-6 slack
    assert(math.abs(hubs.sum - 1.0) < rows.length * 1e-6)
    assert(math.abs(auths.sum - 1.0) < rows.length * 1e-6)
    // a node with no in-edges must carry zero authority mass
    val ed = operators.GraphOps.nationEdges(spark, sf)
      .filter(org.apache.spark.sql.functions.col("src") =!=
        org.apache.spark.sql.functions.col("dst"))
      .select("src", "dst").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    val hasIn = ed.map(_._2).toSet
    rows.foreach { r =>
      if (!hasIn.contains(r.getInt(0)))
        assert(r.getAs[Double]("auth") == 0.0)
    }
  }

  test("q205 delta-presence: counts partition the public table; bounds honored") {
    val rows = SparkEntry.queries("q205_anon_delta_presence")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_public")).sum ==
      Tables(spark, sf, "customer").count())
    rows.foreach { r =>
      val (np, ns, d) = (r.getAs[Long]("n_public"), r.getAs[Long]("n_sample"),
        r.getAs[Double]("delta"))
      assert(ns <= np)
      assert(d >= 0.0 && d <= 1.0)
      val exact = ns.toDouble / np
      assert(r.getAs[Boolean]("within_bounds") == (exact >= 0.1 && exact <= 0.9))
    }
  }

  test("q206 weighted median matches an in-memory weighted scan") {
    val ow = Tables(spark, sf, "orders").groupBy("o_custkey")
      .count().collect().map(r => r.getAs[Long](0) -> r.getAs[Long](1)).toMap
    val byNation = Tables(spark, sf, "customer")
      .select("c_nationkey", "c_custkey", "c_acctbal").collect()
      .map(r => (r.getInt(0), r.getAs[Long](1), r.getAs[Double](2)))
      .groupBy(_._1)
    val got = SparkEntry.queries("q206_weighted_median")(spark, sf).collect()
    assert(got.length == byNation.size)
    got.foreach { r =>
      val nk = r.getInt(0)
      val members = byNation(nk).sortBy(c => (c._3, c._2))
        .map(c => (c, 1L + ow.getOrElse(c._2, 0L)))
      val tot = members.map(_._2).sum
      var cum = 0L
      val first = members.find { case (_, w) => cum += w; 2 * cum >= tot }.get
      assert(r.getAs[Long]("w_total") == tot)
      assert(r.getAs[Long]("n_cust") == members.length.toLong)
      assert(r.getAs[Double]("median_bal") == first._1._3,
        s"nation $nk weighted median diverges")
    }
  }

  test("q208 k-core: 3 rounds reach the fixpoint; every survivor has deg >= k") {
    val edges = Tables(spark, sf, "lineitem")
      .select(org.apache.spark.sql.functions.col("l_suppkey").as("s"),
        org.apache.spark.sql.functions.col("l_partkey").as("p"))
    def run(rounds: Int) = Graft.kCore(edges, k = 20L, rounds = rounds)
      .collect().map(r => (r.getString(0), r.getAs[Long]("node"),
        r.getAs[Long]("deg"))).toSet
    val r3 = run(3)
    // the query's bounded 3 rounds genuinely converge on this graph —
    // one more round changes nothing (true k-core, not a truncation)
    assert(r3 == run(4), "k-core peel not converged at 3 rounds")
    assert(r3.forall(_._3 >= 20L), "a survivor has degree below k")
    // and the peel actually removed something
    val initial = edges.distinct().count()
    assert(r3.map(t => t._3).sum / 2 < initial,
      "k-core peel removed no edges — fixture degenerated")
  }

  test("q209 text-lines roundtrip is lossless against the original parquet") {
    val got = SparkEntry.queries("q209_scan_text_lines")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val direct = Tables(spark, sf, "documents")
      .groupBy("lang")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("text"))).as("c"),
        org.apache.spark.sql.functions.sum("doc_id").as("i"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == direct, "text roundtrip lost data")
  }

  test("q210 correlation matrix matches an in-memory Pearson computation") {
    val rows = Tables(spark, sf, "lineitem")
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax").collect()
      .map(r => Array(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val names = Array("quantity", "extendedprice", "discount", "tax")
    def pearson(i: Int, j: Int): Double = {
      val n = rows.length.toDouble
      val (xs, ys) = (rows.map(_(i)), rows.map(_(j)))
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val syy = ys.map(a => a * a).sum
      (n * sxy - sx * sy) / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    val got = SparkEntry.queries("q210_corr_matrix")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("r")).toMap
    assert(got.size == 6)
    got.foreach { case ((a, b), r) =>
      val expect = pearson(names.indexOf(a), names.indexOf(b))
      // the float summation ORDER differs (exact decimal vs naive fold),
      // so compare at analytic tolerance, not bit-exactness
      assert(math.abs(r - expect) < 1e-4, s"corr($a,$b): $r vs $expect")
      assert(r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9)
    }
  }

  test("q211 imputation: observed rows untouched, error rows get their user's mean") {
    val ev = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "value").collect()
      .map(r => (r.getAs[Long](0), r.getAs[Long](1), r.getString(2), r.getDouble(3)))
    val got = SparkEntry.queries("q211_impute_group_mean")(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Boolean]("was_imputed"), r.getAs[Double]("value_out"))).toMap
    assert(got.size == ev.length)
    val byUser = ev.filter(_._3 != "error").groupBy(_._2)
      .view.mapValues(es => es.map(_._4).sum / es.length).toMap
    val global = { val o = ev.filter(_._3 != "error"); o.map(_._4).sum / o.length }
    ev.foreach { case (id, u, t, v) =>
      val (imp, out) = got(id)
      if (t == "error") {
        assert(imp, s"event $id should be imputed")
        assert(math.abs(out - byUser.getOrElse(u, global)) < 1e-3,
          s"event $id imputed $out, expected ~${byUser.getOrElse(u, global)}")
      } else assert(!imp && out == v, s"observed event $id was altered")
    }
  }

  test("q212 association rules agree with in-memory basket counts") {
    val baskets = Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getAs[Long](0), r.getAs[Long](1)))
    val byOrder = baskets.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val itemSupp = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairSupp = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byOrder.values.foreach { items =>
      val s = items.toSeq.sorted
      for (i <- s.indices; j <- i + 1 until s.length)
        pairSupp((s(i), s(j))) = pairSupp.getOrElse((s(i), s(j)), 0L) + 1L
    }
    val expect = pairSupp.filter(_._2 >= 3L)
    val got = SparkEntry.queries("q212_assoc_rules")(spark, sf).collect()
    assert(got.length == expect.size,
      s"pair count ${got.length} vs ${expect.size}")
    got.foreach { r =>
      val (pa, pb, s) = (r.getAs[Long]("pa"), r.getAs[Long]("pb"),
        r.getAs[Long]("support"))
      assert(expect((pa, pb)) == s)
      assert(r.getAs[Long]("sa") == itemSupp(pa) && r.getAs[Long]("sb") == itemSupp(pb))
      assert(math.abs(r.getAs[Double]("conf_a_to_b") - s.toDouble / itemSupp(pa)) < 2e-6)
      assert(r.getAs[Double]("lift") > 0.0)
    }
  }

  test("q213 week-over-week joins the calendar, not the row sequence") {
    val rows = SparkEntry.queries("q213_period_over_period")(spark, sf).collect()
    val revByDay = rows.map(r => r.getAs[Long]("day") -> r.getAs[Double]("revenue")).toMap
    rows.foreach { r =>
      val d = r.getAs[Long]("day")
      revByDay.get(d - 7) match {
        case Some(prev) =>
          assert(r.getAs[Double]("revenue_prev") == prev)
          assert(math.abs(r.getAs[Double]("wow_growth") -
            (r.getAs[Double]("revenue") - prev) / prev) < 3e-6)
        case None =>
          assert(r.isNullAt(r.fieldIndex("revenue_prev")),
            s"day $d fabricated a baseline with no day ${d - 7} in the data")
      }
    }
  }

  test("q214 PSI: smoothed probabilities sum to 1, total is the nonneg part-sum") {
    val rows = SparkEntry.queries("q214_psi_drift")(spark, sf).collect()
    val (pr, pc) = (rows.map(_.getAs[Double]("p_ref")).sum,
      rows.map(_.getAs[Double]("p_cur")).sum)
    assert(math.abs(pr - 1.0) < rows.length * 1e-6)
    assert(math.abs(pc - 1.0) < rows.length * 1e-6)
    val tot = rows.head.getAs[Double]("psi_total")
    assert(rows.forall(_.getAs[Double]("psi_total") == tot))
    assert(tot >= 0.0, "PSI is a nonnegative divergence")
    assert(math.abs(tot - rows.map(_.getAs[Double]("psi_part")).sum) < rows.length * 1e-6)
  }

  test("q215 MAD outliers match an in-memory median/MAD computation") {
    val byNation = Tables(spark, sf, "customer")
      .select("c_nationkey", "c_acctbal").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).groupBy(_._1)
    // Spark Percentile interpolation: v[lo] + (pos-lo)*(v[hi]-v[lo])
    def median(xs: Array[Double]): Double = {
      val s = xs.sorted
      val pos = 0.5 * (s.length - 1)
      val lo = pos.toInt
      if (lo == pos) s(lo) else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
    }
    val got = SparkEntry.queries("q215_mad_outliers")(spark, sf).collect()
    assert(got.length == byNation.size)
    got.foreach { r =>
      val nk = r.getInt(0)
      val bals = byNation(nk).map(_._2)
      val med = median(bals)
      val mad = median(bals.map(b => math.abs(b - med)))
      assert(math.abs(r.getAs[Double]("med") - med) < 2e-6, s"nation $nk median")
      assert(math.abs(r.getAs[Double]("mad") - mad) < 2e-6, s"nation $nk MAD")
      val nOut = bals.count(b => math.abs(b - med) > 3.0 * 1.4826 * mad).toLong
      assert(r.getAs[Long]("n_outliers") == nOut, s"nation $nk outlier count")
    }
  }

  test("q216 feature matrix: lags are calendar-true and the range window skips gaps") {
    val rows = SparkEntry.queries("q216_feature_matrix")(spark, sf).collect()
    val vByKey = rows.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day")) ->
      r.getAs[Double]("v_sum")).toMap
    rows.foreach { r =>
      val (u, d) = (r.getAs[Long]("user_id"), r.getAs[Long]("day"))
      // counts partition n_events
      assert(Seq("n_click", "n_view", "n_purchase", "n_error", "n_signup")
        .map(r.getAs[Long]).sum == r.getAs[Long]("n_events"))
      // lag columns equal the calendar row's v_sum, or NULL when absent
      for ((k, cn) <- Seq(1 -> "v_lag1", 7 -> "v_lag7")) {
        vByKey.get((u, d - k)) match {
          case Some(v) => assert(r.getAs[Double](cn) == v, s"($u,$d) $cn")
          case None => assert(r.isNullAt(r.fieldIndex(cn)), s"($u,$d) $cn fabricated")
        }
      }
      // the rolling mean averages exactly the calendar days d-7..d-1
      val window = (1 to 7).flatMap(k => vByKey.get((u, d - k)))
      assert(r.getAs[Long]("n_roll7") == window.length.toLong)
      if (window.nonEmpty)
        assert(math.abs(r.getAs[Double]("v_roll7_mean") -
          window.sum / window.length) < 1e-3, s"($u,$d) rolling mean")
      else assert(r.isNullAt(r.fieldIndex("v_roll7_mean")))
      assert(r.getAs[Long]("dow") == (d + 4) % 7)
    }
  }

  test("q217 lateness audit matches an in-memory arrival sweep") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts_us").collect()
      .map(r => (r.getAs[Long](0), r.getAs[Long](1), r.getAs[Long](2)))
    val got = SparkEntry.queries("q217_lateness_audit")(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    ev.groupBy(_._1).foreach { case (u, es) =>
      val inArrival = es.sortBy(_._2)
      var hwm = Long.MinValue
      val lates = inArrival.map { case (_, _, ts) =>
        val l = if (hwm == Long.MinValue) 0L else math.max(hwm - ts, 0L)
        hwm = math.max(hwm, ts); l
      }
      val r = got(u)
      assert(r.getAs[Long]("n_events") == es.length.toLong)
      assert(r.getAs[Long]("n_late") == lates.count(_ > 0L).toLong)
      assert(r.getAs[Long]("max_late_us") == lates.max)
      assert(r.getAs[Long]("n_dropped_10m") == lates.count(_ > 600000000L).toLong)
      // p95 = smallest value whose running rank reaches 95% of n
      val sorted = lates.sorted
      val idx = sorted.indices.find(i => (i + 1) * 100L >= sorted.length * 95L).get
      assert(r.getAs[Long]("p95_late_us") == sorted(idx), s"user $u p95")
    }
  }

  test("q218 JSONL export roundtrip is lossless including text payloads") {
    val got = SparkEntry.queries("q218_export_jsonl")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val fn = org.apache.spark.sql.functions
    val direct = Tables(spark, sf, "documents")
      .groupBy("lang", "source")
      .agg(fn.count(fn.lit(1)), fn.sum("n_chars"),
        fn.sum(fn.length(fn.col("text"))), fn.sum("doc_id"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == direct, "JSONL roundtrip lost or altered rows")
  }

  test("q219 SPRT trajectory matches an in-memory accumulation") {
    val rows = SparkEntry.queries("q219_sprt_sequential")(spark, sf).collect()
    val lnUp = math.log(1.25)
    val lnDn = math.log(0.9375)
    val bound = math.log(19.0)
    rows.groupBy(_.getAs[Long]("arm")).foreach { case (_, byArm) =>
      var cum = 0.0
      byArm.sortBy(_.getAs[Long]("day")).foreach { r =>
        val (t, s) = (r.getAs[Long]("n_trials"), r.getAs[Long]("n_succ"))
        assert(s <= t)
        // mirror the query's per-day r6 rounding before accumulating
        cum += math.floor((s * lnUp + (t - s) * lnDn) * 1e6 + 0.5) / 1e6
        assert(math.abs(r.getAs[Double]("cum_llr") - cum) < 1e-5,
          s"arm/day ${r.getAs[Long]("arm")}/${r.getAs[Long]("day")}")
        val expect = if (cum >= bound) "accept_h1"
          else if (cum <= -bound) "accept_h0" else "continue"
        assert(r.getAs[String]("decision") == expect)
      }
    }
  }

  test("q220 conformal calibration: splits partition, coverage near the 0.9 target") {
    val rows = SparkEntry.queries("q220_eval_conformal")(spark, sf).collect()
    val total = rows.map(r => r.getAs[Long]("n_train") + r.getAs[Long]("n_cal") +
      r.getAs[Long]("n_test")).sum
    assert(total == Tables(spark, sf, "customer").count())
    val qhat = rows.head.getAs[Double]("qhat")
    assert(qhat > 0.0)
    assert(rows.forall(_.getAs[Double]("qhat") == qhat), "qhat is global")
    // marginal coverage guarantee: overall coverage ≈ 0.9 (finite-sample
    // slack for ~375 test rows)
    val nTest = rows.map(_.getAs[Long]("n_test")).sum
    val covered = rows.map(r =>
      r.getAs[Double]("coverage") * r.getAs[Long]("n_test")).sum
    val overall = covered / nTest
    assert(overall > 0.82 && overall < 0.98, s"overall coverage $overall")
  }

  test("q222 inclusion deps: true FKs hold, the negative control measures short") {
    val rows = SparkEntry.queries("q222_inclusion_deps")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_child"),
        r.getAs[Long]("n_contained"), r.getAs[Double]("containment"),
        r.getAs[Boolean]("holds"))).toMap
    assert(rows.size == 5)
    Seq("customer.c_nationkey->nation.n_nationkey",
      "lineitem.l_orderkey->orders.o_orderkey",
      "lineitem.l_suppkey->supplier.s_suppkey",
      "orders.o_custkey->customer.c_custkey").foreach { fk =>
      val (nc, ni, frac, holds) = rows(fk)
      assert(holds && nc == ni && frac == 1.0, s"$fk should hold: $nc/$ni")
    }
    val (nc, ni, frac, holds) = rows("events.user_id->supplier.s_suppkey")
    assert(!holds && ni < nc, "negative control unexpectedly holds")
    assert(frac > 0.0 && frac < 1.0)
  }

  test("q223 write compaction: file census honors the writer contract") {
    val rows = SparkEntry.queries("q223_write_compaction")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_rows")).sum ==
      Tables(spark, sf, "documents").count())
    rows.foreach { r =>
      val (n, files, mx) = (r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_files"), r.getAs[Long]("max_file_rows"))
      assert(mx <= 100L, s"${r.getString(0)}: file over the record cap")
      assert(files == (n + 99) / 100, s"${r.getString(0)}: wrong file count")
    }
  }

  test("q224 try family absorbs runtime errors into NULL per contract") {
    val rows = SparkEntry.queries("q224_scalar_try_safe")(spark, sf).collect()
      .map(r => r.getInt(0) -> r).toMap
    rows.foreach { case (k, r) =>
      assert(r.isNullAt(r.fieldIndex("safe_div")) == (k == 20), s"div key $k")
      assert(r.isNullAt(r.fieldIndex("safe_cast")) == (k % 3 == 0), s"cast key $k")
      assert(r.isNullAt(r.fieldIndex("safe_add")) == (k != 0), s"add key $k")
      assert(r.isNullAt(r.fieldIndex("safe_elem")) == (1 + k % 5 > 3), s"elem key $k")
      if (k % 3 != 0) assert(r.getAs[Int]("safe_cast") == k)
      if (1 + k % 5 <= 3) assert(r.getAs[Int]("safe_elem") == 10 * (1 + k % 5))
    }
  }

  test("q225 grid spatial join finds exactly the brute-force neighbor pairs") {
    def hex3(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      def d(c: Char) = "0123456789abcdef".indexOf(c).toLong
      (d(h(0)) * 256 + d(h(1)) * 16 + d(h(2))) % 1000
    }
    val pts = Tables(spark, sf, "customer").select("c_custkey").collect()
      .map(_.getLong(0))
      .map(id => (id, hex3(s"px:$id"), hex3(s"py:$id")))
    val expect = (for {
      (a, xa, ya) <- pts; (b, xb, yb) <- pts
      if a < b
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= 25
    } yield ((a, b), d2)).toMap
    val got = SparkEntry.queries("q225_join_spatial_grid")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Long]("d2"))).toMap
    assert(got == expect,
      s"grid join diverges from brute force: ${got.size} vs ${expect.size} pairs")
  }

  test("q226 recursive CTE reproduces the in-memory ancestor chains") {
    val keys = Tables(spark, sf, "nation").select("n_nationkey")
      .collect().map(_.getInt(0).toLong).filter(_ > 0)
    val expect = keys.flatMap { n =>
      val chain = scala.collection.mutable.ListBuffer[(Long, Long, Long)]()
      var anc = n / 2
      var d = 1L
      chain += ((n, anc, d))
      while (anc > 0) { anc /= 2; d += 1; chain += ((n, anc, d)) }
      chain
    }.toSet
    val got = SparkEntry.queries("q226_recursive_cte")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect, s"ancestor chains diverge: ${got.size} vs ${expect.size}")
  }

  test("q227 streaks match an in-memory gaps-and-islands sweep") {
    val usDay = 86400000000L
    val byUser = Tables.events(spark, sf).select("user_id", "ts_us").collect()
      .map(r => (r.getAs[Long](0), r.getAs[Long](1) / usDay))
      .distinct.groupBy(_._1)
    val got = SparkEntry.queries("q227_user_streaks")(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(got.size == byUser.size)
    byUser.foreach { case (u, ds) =>
      val days = ds.map(_._2).distinct.sorted
      val runs = days.foldLeft(List.empty[(Long, Long)]) { // (start, len)
        case ((s, l) :: rest, d) if d == s + l => (s, l + 1) :: rest
        case (acc, d) => (d, 1L) :: acc
      }.reverse
      val longest = runs.maxBy(r => (r._2, -r._1))
      val r = got(u)
      assert(r.getAs[Long]("n_active_days") == days.length.toLong)
      assert(r.getAs[Long]("n_streaks") == runs.length.toLong)
      assert(r.getAs[Long]("longest_streak") == longest._2, s"user $u longest")
      assert(r.getAs[Long]("longest_start_day") == longest._1, s"user $u start")
    }
  }

  test("q228 multiclass eval is consistent with the q64 predictions") {
    val preds = SparkEntry.queries("q64_text_langid")(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2))) // (true, pred)
    val got = SparkEntry.queries("q228_eval_multiclass")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val classes = (preds.map(_._1) ++ preds.map(_._2)).distinct
    assert(got.keySet == classes.toSet)
    classes.foreach { c =>
      val r = got(c)
      val nTrue = preds.count(_._1 == c).toLong
      val nPred = preds.count(_._2 == c).toLong
      val tp = preds.count(p => p._1 == c && p._2 == c).toLong
      assert(r.getAs[Long]("n_true") == nTrue && r.getAs[Long]("n_pred") == nPred &&
        r.getAs[Long]("tp") == tp, s"class $c counts")
      if (nPred > 0)
        assert(math.abs(r.getAs[Double]("precision") - tp.toDouble / nPred) < 2e-6)
    }
    val acc = preds.count(p => p._1 == p._2).toDouble / preds.length
    assert(math.abs(got.values.head.getAs[Double]("accuracy") - acc) < 2e-6)
  }

  test("q229 bitmap distinct agrees with countDistinct everywhere") {
    val rows = SparkEntry.queries("q229_agg_bitmap_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("agree"),
        s"${r.getString(0)}: bitmap ${r.getAs[Long](1)} != direct ${r.getAs[Long](2)}")
      assert(r.getAs[Long]("n_distinct_bitmap") > 0)
    }
  }

  test("q230 rollup navigation: monthly answers from the cube equal the raw recompute") {
    val rows = SparkEntry.queries("q230_agg_rollup_navigation")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("equal"),
        s"month ${r.getString(0)}: rollup ${r.getAs[Double]("rev_rollup")} != " +
          s"raw ${r.getAs[Double]("rev_raw")}")
    }
    // months partition the order-date domain
    assert(rows.map(_.getAs[Long]("n_days")).sum ==
      Tables(spark, sf, "orders")
        .select(org.apache.spark.sql.functions.col("o_orderdate").cast("date"))
        .distinct().count())
  }

  test("q231 codec roundtrips are lossless and identical across codecs") {
    val rows = SparkEntry.queries("q231_scan_codecs")(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("gzip", "snappy", "zstd"))
    val sigs = rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).distinct
    assert(sigs.length == 1, s"codec roundtrips diverge: ${sigs.toSeq}")
    assert(sigs.head._1 == Tables(spark, sf, "nation").count())
  }

  test("q237 bootstrap: Poisson(1) weights are unbiased, replicate spread brackets the mean") {
    val rows = SparkEntry.queries("q237_stats_bootstrap")(spark, sf).collect()
    assert(rows.length == 32)
    val orders = Tables(spark, sf, "orders")
    val n = orders.count()
    val trueMean = orders.agg(org.apache.spark.sql.functions.avg("o_totalprice"))
      .head().getDouble(0)
    // E[Poisson(1)] = 1, Var = 1 ⇒ n_eff ~ n ± √n; allow 4σ per
    // replicate (P(any of 32 exceeding) < 0.2% — a miss means broken
    // thresholds, not luck). A constant relative tolerance would be σ-
    // mis-scaled across SFs (5% is 6σ at 15k rows but only 1.9σ at 1.5k).
    val tol = 4.0 * math.sqrt(n.toDouble)
    rows.foreach { r =>
      val nEff = r.getAs[Long]("n_eff")
      assert(math.abs(nEff - n) <= tol, s"rep ${r.getLong(0)}: n_eff $nEff vs n $n (tol $tol)")
    }
    // the replicate means are draws of the sampling distribution of the
    // mean — 32 of them bracket the true mean essentially surely
    val means = rows.map(_.getAs[Double]("mean_total"))
    assert(means.min <= trueMean && trueMean <= means.max,
      s"true mean $trueMean outside replicate range [${means.min}, ${means.max}]")
    // and they actually VARY (a constant column means the hash draw broke)
    assert(means.distinct.length > 16)
  }

  test("q341 Spearman: matches an in-memory tie-averaged rank recomputation") {
    val row = SparkEntry.queries("q341_stats_spearman")(spark, sf).head()
    val docs = Tables(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("n_chars"),
        org.apache.spark.sql.functions.expr(
          "cast(size(array_distinct(split(text, ' '))) as bigint)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def avgRanks(vs: Array[Long]): Map[Long, Double] = {
      // t tied values at v share rank cum(v) − t + (t+1)/2
      val counts = vs.groupBy(identity).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
      var cum = 0L
      counts.map { case (v, t) =>
        cum += t; v -> (cum - t + (t + 1) / 2.0)
      }.toMap
    }
    val rx = avgRanks(docs.map(_._1)); val ry = avgRanks(docs.map(_._2))
    val pairs = docs.map { case (x, y) => (rx(x), ry(y)) }
    val n = pairs.length.toDouble
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val rho = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(row.getAs[Long]("n") == pairs.length)
    assert(math.abs(row.getAs[Double]("rho") - rho) < 1e-5,
      s"query rho ${row.getAs[Double]("rho")} vs recomputed $rho")
    // ranks correlate positively by construction (longer docs, more
    // distinct tokens) but ties keep it off the degenerate 1.0
    assert(rho > 0.5 && rho < 1.0)
  }

  test("q342 BH-FDR: ln_p matches a Welch+A&S recomputation; step-up rule holds") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q342_stats_fdr_bh")(spark, sf).collect()
    val bals = Tables(spark, sf, "customer")
      .select(col("c_nationkey").cast("long"), col("c_acctbal"))
      .collect().map(r => (r.getLong(0), BigDecimal(r.getDouble(1)).setScale(4)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nt = bals.values.map(_.length).sum
    val st = bals.values.flatten.sum
    val sst = bals.values.flatten.map(b => b * b).sum
    def lnP(k: Long): Double = {
      val g = bals(k)
      val (n1, s1, ss1) = (g.length.toDouble, g.sum, g.map(b => b * b).sum)
      val (n2, s2, ss2) = (nt - n1, (st - s1).toDouble, (sst - ss1).toDouble)
      val v1 = (ss1.toDouble - s1.toDouble * s1.toDouble / n1) / (n1 - 1)
      val v2 = (ss2 - s2 * s2 / n2) / (n2 - 1)
      val z = (s1.toDouble / n1 - s2 / n2) / math.sqrt(v1 / n1 + v2 / n2)
      val az = math.abs(z)
      val t = 1.0 / (1.0 + 0.2316419 * az)
      val h = t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 +
        t * (-1.821255978 + t * 1.330274429))))
      math.log(2.0) - az * az / 2.0 - 0.5 * math.log(2 * math.Pi) + math.log(h)
    }
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("ln_p") - lnP(r.getLong(0))) < 1e-5,
        s"nation ${r.getLong(0)} ln_p off")
    }
    // p_rank orders ln_p ascending; step-up: rejected iff rank <= k*,
    // k* = max rank with ln_p <= ln(rank * alpha / m)
    val byRank = rows.sortBy(_.getAs[Long]("p_rank"))
    assert(byRank.map(_.getAs[Double]("ln_p")).sliding(2)
      .forall(w => w.length < 2 || w(0) <= w(1)))
    val m = rows.length
    val kstar = byRank.filter(r => r.getAs[Double]("ln_p") <=
        math.floor(math.log(r.getAs[Long]("p_rank") * 0.05 / m) * 1e6 + 0.5) / 1e6)
      .map(_.getAs[Long]("p_rank")).sorted.lastOption.getOrElse(0L)
    byRank.foreach { r =>
      assert(r.getAs[Boolean]("rejected") == (r.getAs[Long]("p_rank") <= kstar))
    }
    // and the A&S tail is a real probability: ln_p <= ln(1) = 0
    rows.foreach(r => assert(r.getAs[Double]("ln_p") <= 1e-9))
  }

  test("q343 isotonic: minimax fit equals sequential pool-adjacent-violators") {
    val rows = SparkEntry.queries("q343_eval_isotonic")(spark, sf).collect()
      .sortBy(_.getLong(0))
    // classic sequential PAV over the same (n, raw_rate) decile blocks
    case class Block(w: Double, sum: Double) { def mean: Double = sum / w }
    var stack = List.empty[Block]
    rows.foreach { r =>
      var b = Block(r.getAs[Long]("n").toDouble,
        r.getAs[Double]("raw_rate") * r.getAs[Long]("n"))
      while (stack.nonEmpty && stack.head.mean >= b.mean) {
        b = Block(stack.head.w + b.w, stack.head.sum + b.sum)
        stack = stack.tail
      }
      stack = b :: stack
    }
    val pav = stack.reverse.flatMap(b => Seq.fill(math.round(b.w).toInt)(b.mean))
    // expand per-decile (blocks carry doc counts; re-walk by decile)
    var expected = List.empty[Double]
    var rem = stack.reverse
    var acc = 0.0
    rows.foreach { r =>
      expected :+= rem.head.mean
      acc += r.getAs[Long]("n")
      if (acc >= rem.head.w - 1e-9) { rem = rem.tail; acc = 0.0 }
    }
    rows.zip(expected).foreach { case (r, e) =>
      assert(math.abs(r.getAs[Double]("iso_rate") - e) < 2e-6,
        s"decile ${r.getLong(0)}: minimax ${r.getAs[Double]("iso_rate")} vs PAV $e")
    }
    // and the fit is monotone non-decreasing
    val iso = rows.map(_.getAs[Double]("iso_rate"))
    assert(iso.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    assert(pav.length.toLong == rows.map(_.getAs[Long]("n")).sum)
  }

  test("q344 quantile normalization matches an in-memory type-1 quantile recomputation") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q344_quantile_normalize")(spark, sf).collect()
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.length == docs.length)
    val bySource = docs.groupBy(_._2).view.mapValues(_.map(_._3).sorted).toMap
    // q(s,g) = min v with cum(v)*20 >= g*n  ==  sorted(ceil(g*n/20) - 1)
    def srcQ(s: String, g: Long): Long = {
      val vs = bySource(s); val n = vs.length.toLong
      vs(((g * n + 19) / 20 - 1).toInt)
    }
    val ref = (1L to 20L).map(g => g -> {
      val qs = bySource.keys.toSeq.map(s => srcQ(s, g))
      math.floor(qs.sum.toDouble / qs.length * 1e6 + 0.5) / 1e6
    }).toMap
    rows.foreach { r =>
      val (s, v) = (r.getString(1), r.getLong(2))
      val vs = bySource(s); val n = vs.length.toLong
      val cum = vs.count(_ <= v).toLong // max rank of the tie group
      val g = (cum * 20 + n - 1) / n
      assert(r.getLong(3) == g, s"doc ${r.getLong(0)}: cell ${r.getLong(3)} vs $g")
      assert(r.getAs[Double]("ref_len") == ref(g),
        s"doc ${r.getLong(0)}: ref ${r.getAs[Double]("ref_len")} vs ${ref(g)}")
    }
    // the map is monotone within every source
    rows.groupBy(_.getString(1)).values.foreach { srcRows =>
      val byLen = srcRows.sortBy(_.getLong(2))
      assert(byLen.map(_.getLong(3)).sliding(2)
        .forall(w => w.length < 2 || w(0) <= w(1)))
      assert(byLen.map(_.getAs[Double]("ref_len")).sliding(2)
        .forall(w => w.length < 2 || w(0) <= w(1)))
    }
  }

  test("q345 Kendall tau-b equals a naive O(n^2) pair walk on the binned signals") {
    import org.apache.spark.sql.functions.col
    val row = SparkEntry.queries("q345_stats_kendall_tau")(spark, sf).head()
    val pts = Tables(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.expr("n_chars div 40"),
        org.apache.spark.sql.functions.expr(
          "cast(size(array_distinct(split(text, ' '))) div 16 as bigint)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var (c, d, tx, ty) = (0L, 0L, 0L, 0L)
    for (i <- pts.indices; k <- (i + 1) until pts.length) {
      val ((xa, ya), (xb, yb)) = (pts(i), pts(k))
      if (xa == xb) tx += 1
      if (ya == yb) ty += 1
      if (xa != xb && ya != yb) {
        if ((xa < xb) == (ya < yb)) c += 1 else d += 1
      }
    }
    val n = pts.length.toLong
    assert(row.getAs[Long]("n") == n)
    assert(row.getAs[Long]("n_pairs") == n * (n - 1) / 2)
    assert(row.getAs[Long]("concordant") == c, s"C ${row.getAs[Long]("concordant")} vs $c")
    assert(row.getAs[Long]("discordant") == d, s"D ${row.getAs[Long]("discordant")} vs $d")
    assert(row.getAs[Long]("ties_x") == tx)
    assert(row.getAs[Long]("ties_y") == ty)
    val n0 = n.toDouble * (n - 1) / 2.0
    val tau = (c - d).toDouble / math.sqrt((n0 - tx) * (n0 - ty))
    assert(math.abs(row.getAs[Double]("tau_b") - tau) < 1e-6)
    assert(tau > 0.0) // length and distinct-token buckets agree in order
  }

  test("q346 Good-Turing: r* and missing mass match an in-memory bigram count-of-counts") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q346_good_turing")(spark, sf).collect()
      .sortBy(_.getLong(0))
    val bigrams = Tables(spark, sf, "documents").select(col("text")).collect()
      .map(_.getString(0).split(" ", -1))
      .filter(_.length >= 2)
      .flatMap(ts => ts.sliding(2).map(p => p(0) + " " + p(1)))
    val typeCounts = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nr = typeCounts.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nTokens = bigrams.length.toLong
    assert(rows.nonEmpty, "count-of-counts zone r<=10 must be populated")
    rows.foreach { row =>
      val r = row.getLong(0)
      assert(row.getAs[Long]("n_r") == nr(r))
      nr.get(r + 1) match {
        case Some(nNext) =>
          val rs = (r + 1.0) * nNext / nr(r)
          assert(math.abs(row.getAs[Double]("r_star") - rs) < 1e-6)
          assert(math.abs(row.getAs[Double]("p_gt") - rs / nTokens) < 1e-6)
        case None =>
          assert(row.isNullAt(row.fieldIndex("r_star")))
          assert(row.isNullAt(row.fieldIndex("p_gt")))
      }
      assert(math.abs(row.getAs[Double]("p0_missing") -
        nr.getOrElse(1L, 0L).toDouble / nTokens) < 1e-6)
    }
    // GT discounts singletons: r* < r at r = 1 on a sparse joint space
    rows.find(_.getLong(0) == 1L)
      .foreach(r1 => assert(r1.getAs[Double]("r_star") < 1.0))
  }

  test("q347 Mann-Kendall matches a naive in-memory S/variance recomputation") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q347_ts_mann_kendall")(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        org.apache.spark.sql.functions.expr("ts_us DIV 86400000000").as("t"))
      .agg(org.apache.spark.sql.functions.sum(
        col("value").cast("decimal(18,4)")).cast("decimal(18,4)").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(x => BigDecimal(x._3))).toMap
    rows.foreach { r =>
      val vs = daily(r.getString(0))
      var s = 0L
      for (i <- vs.indices; j <- (i + 1) until vs.length)
        s += vs(j).compare(vs(i)).sign
      val n = vs.length.toLong
      val tieTerm = vs.groupBy(identity).values
        .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
      val varS = (n * (n - 1) * (2 * n + 5) - tieTerm).toDouble / 18.0
      val z =
        if (s > 0) (s - 1.0) / math.sqrt(varS)
        else if (s < 0) (s + 1.0) / math.sqrt(varS)
        else 0.0
      assert(r.getAs[Long]("n_days") == n)
      assert(r.getAs[Long]("s_stat") == s, s"${r.getString(0)}: S off")
      assert(math.abs(r.getAs[Double]("var_s") - varS) < 1e-5)
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-5)
      val expected = if (z > 1.959964) "increasing"
        else if (z < -1.959964) "decreasing" else "none"
      assert(r.getAs[String]("trend") == expected)
    }
  }

  test("q348 negative sampling: weights are c^0.75, thresholds partition 2^16 by mass") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q348_negative_sampling")(spark, sf).collect()
      .sortBy(_.getString(0))
    val counts = Tables(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(col("text"), " ")).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length == counts.size)
    rows.foreach { r =>
      val c = counts(r.getString(0))
      assert(r.getAs[Long]("c") == c)
      val w = math.floor(math.sqrt(c * math.sqrt(c.toDouble)) * 1e6 + 0.5) / 1e6
      assert(r.getAs[Double]("w") == w, s"${r.getString(0)}: weight off")
    }
    // thresholds: strictly increasing in token order, last = 2^16, and
    // each bucket width tracks the token's probability within rounding
    val thr = rows.map(_.getAs[Long]("cum_threshold"))
    assert(thr.last == 65536L)
    assert(thr.sliding(2).forall(w => w.length < 2 || w(0) < w(1)))
    val totalW = rows.map(_.getAs[Double]("w")).sum
    rows.zipWithIndex.foreach { case (r, i) =>
      val width = thr(i) - (if (i == 0) 0L else thr(i - 1))
      val expect = r.getAs[Double]("w") / totalW * 65536.0
      assert(math.abs(width - expect) <= 2.0,
        s"${r.getString(0)}: bucket width $width vs $expect")
    }
    // probabilities are a distribution
    val pSum = rows.map(_.getAs[Double]("p_neg")).sum
    assert(math.abs(pSum - 1.0) < 1e-4)
  }

  test("q349 Cramer-von Mises matches an in-memory tie-weighted ECDF recomputation") {
    import org.apache.spark.sql.functions.col
    val row = SparkEntry.queries("q349_stats_cvm")(spark, sf).head()
    val cust = Tables(spark, sf, "customer")
      .select(col("c_acctbal"), col("c_mktsegment")).collect()
      .map(r => (r.getDouble(0), r.getString(1) == "BUILDING"))
    val n1 = cust.count(_._2).toLong
    val n2 = cust.length - n1
    val values = cust.map(_._1).distinct.sorted
    var (c1, c2) = (0L, 0L)
    var s = 0.0
    values.foreach { v =>
      val g1 = cust.count(p => p._1 == v && p._2).toLong
      val g2 = cust.count(p => p._1 == v && !p._2).toLong
      c1 += g1; c2 += g2
      val gap = c1.toDouble / n1 - c2.toDouble / n2
      s += math.floor((g1 + g2) * gap * gap * 1e6 + 0.5) / 1e6
    }
    val t = n1.toDouble * n2 / ((n1.toDouble + n2) * (n1.toDouble + n2)) * s
    assert(row.getAs[Long]("n1") == n1)
    assert(row.getAs[Long]("n2") == n2)
    assert(math.abs(row.getAs[Double]("cvm_t") - t) < 1e-5,
      s"cvm ${row.getAs[Double]("cvm_t")} vs $t")
    assert(t >= 0.0)
  }

  test("q350 token entropy matches an in-memory Shannon recomputation; evenness in [0,1]") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q350_text_entropy")(spark, sf).collect()
    val texts = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val toks = texts(r.getLong(0)).split(" ", -1)
      val counts = toks.groupBy(identity).values.map(_.length.toLong).toSeq
      val n = toks.length.toDouble
      assert(r.getAs[Long]("n_tokens") == toks.length.toLong)
      assert(r.getAs[Long]("n_types") == counts.length.toLong)
      val sclnc = counts.map(c =>
        math.floor(c * math.log(c.toDouble) * 1e6 + 0.5) / 1e6).sum
      val h = math.log(n) - sclnc / n
      assert(math.abs(r.getAs[Double]("entropy") - h) < 1e-5,
        s"doc ${r.getLong(0)}: H ${r.getAs[Double]("entropy")} vs $h")
      // identity cross-check: H equals -sum p ln p within fp tolerance
      val hDirect = -counts.map(c => c / n * math.log(c / n)).sum
      assert(math.abs(h - hDirect) < 1e-4)
      if (counts.length > 1) {
        val norm = r.getAs[Double]("entropy_norm")
        assert(norm >= -1e-9 && norm <= 1.0 + 1e-9)
      } else assert(r.isNullAt(r.fieldIndex("entropy_norm")))
    }
  }

  test("q351 experiment health: SRM chi2 and covariate SMDs match a naive recompute") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q351_ab_health")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 4)
    val perUser = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("ev"),
        org.apache.spark.sql.functions.sum(col("value").cast("decimal(18,4)"))
          .cast("double").as("vl"))
      .collect().map(r => (r.getLong(0) % 2, r.getLong(1).toDouble, r.getDouble(2)))
    val (a, b) = perUser.partition(_._1 == 0L)
    val (n0, n1) = (a.length.toDouble, b.length.toDouble)
    val srm = rows("srm")
    assert(srm.getAs[Long]("n_a") == a.length && srm.getAs[Long]("n_b") == b.length)
    assert(math.abs(srm.getAs[Double]("stat") -
      (n0 - n1) * (n0 - n1) / (n0 + n1)) < 1e-6)
    def smd(x0: Array[Double], x1: Array[Double]): Double = {
      def mv(x: Array[Double]) = {
        val m = x.sum / x.length
        (m, x.map(v => (v - m) * (v - m)).sum / (x.length - 1))
      }
      val ((m0, v0), (m1, v1)) = (mv(x0), mv(x1))
      math.abs(m0 - m1) / math.sqrt((v0 + v1) / 2)
    }
    assert(math.abs(rows("balance_ev").getAs[Double]("stat") -
      smd(a.map(_._2), b.map(_._2))) < 1e-4)
    assert(math.abs(rows("balance_vl").getAs[Double]("stat") -
      smd(a.map(_._3), b.map(_._3))) < 1e-4)
    // the distinct-type covariate is constant on this dense corpus:
    // zero variance in both arms -> NULL stat and flag, never a crash
    val ty = rows("balance_ty")
    assert(ty.isNullAt(ty.fieldIndex("stat")) && ty.isNullAt(ty.fieldIndex("flagged")))
    assert(ty.getAs[Double]("mean_a") == ty.getAs[Double]("mean_b"))
  }

  test("q352 CUPED: theta, adjusted diff and variance identities match a recompute") {
    import org.apache.spark.sql.functions.col
    val r = SparkEntry.queries("q352_ab_cuped")(spark, sf).head()
    val ud = Tables.events(spark, sf)
      .select(col("user_id"), org.apache.spark.sql.functions.expr(
        "ts_us div 86400000000").as("day"),
        col("value").cast("decimal(18,4)").as("v"))
      .collect().map(x => (x.getLong(0), x.getLong(1), BigDecimal(x.getDecimal(2))))
    val split = (ud.map(_._2).min + ud.map(_._2).max + 1) / 2
    val xy = ud.groupBy(_._1).map { case (u, rows) =>
      (u % 2,
        rows.filter(_._2 < split).map(_._3).sum.toDouble,
        rows.filter(_._2 >= split).map(_._3).sum.toDouble)
    }.toArray
    val n = xy.length.toDouble
    val (mx, my) = (xy.map(_._2).sum / n, xy.map(_._3).sum / n)
    val varx = xy.map(p => p._2 * p._2).sum / n - mx * mx
    val vary = xy.map(p => p._3 * p._3).sum / n - my * my
    val cov = xy.map(p => p._2 * p._3).sum / n - mx * my
    val theta = cov / varx
    val (a, b) = xy.partition(_._1 == 0L)
    val diffRaw = b.map(_._3).sum / b.length - a.map(_._3).sum / a.length
    val diffX = b.map(_._2).sum / b.length - a.map(_._2).sum / a.length
    assert(r.getAs[Long]("n_a") == a.length && r.getAs[Long]("n_b") == b.length)
    assert(math.abs(r.getAs[Double]("theta") - theta) < 1e-4)
    assert(math.abs(r.getAs[Double]("diff_raw") - diffRaw) < 1e-3)
    assert(math.abs(r.getAs[Double]("diff_cuped") - (diffRaw - theta * diffX)) < 1e-3)
    assert(math.abs(r.getAs[Double]("var_cuped") -
      (vary - cov * cov / varx)) < math.abs(vary) * 1e-6 + 1e-3)
    // CUPED never increases variance, and the reduction equals rho^2
    assert(r.getAs[Double]("var_cuped") <= r.getAs[Double]("var_y") + 1e-9)
    assert(math.abs(r.getAs[Double]("var_reduction") -
      cov * cov / (varx * vary)) < 1e-4)
  }

  test("q353 ratio delta-method: per-arm SE and diff z match a per-user recompute") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q353_ab_ratio_delta")(spark, sf).collect()
      .sortBy(_.getInt(0))
    assert(rows.length == 2)
    val perUser = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions
          .when(col("event_type") === "click", 1L).otherwise(0L)).as("c"),
        org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions
          .when(col("event_type") === "view", 1L).otherwise(0L)).as("v"))
      .collect().map(r => (r.getLong(0) % 2, r.getLong(1).toDouble, r.getLong(2).toDouble))
    def armStats(a: Long): (Double, Double) = {
      val g = perUser.filter(_._1 == a)
      val n = g.length.toDouble
      val (sc, sv) = (g.map(_._2).sum, g.map(_._3).sum)
      val r = sc / sv
      val (mc, mv) = (sc / n, sv / n)
      val scc = g.map(p => (p._2 - mc) * (p._2 - mc)).sum / (n - 1)
      val scv = g.map(p => (p._2 - mc) * (p._3 - mv)).sum / (n - 1)
      val svv = g.map(p => (p._3 - mv) * (p._3 - mv)).sum / (n - 1)
      (r, (scc - 2 * r * scv + r * r * svv) / (n * mv * mv))
    }
    val (r0, v0) = armStats(0); val (r1, v1) = armStats(1)
    val expected = Seq((r0, v0), (r1, v1))
    rows.zip(expected).foreach { case (row, (r, v)) =>
      assert(math.abs(row.getAs[Double]("ratio") - r) < 1e-5)
      assert(math.abs(row.getAs[Double]("se") - math.sqrt(v)) < 1e-5)
      assert(row.getAs[Double]("ci_lo") < r && r < row.getAs[Double]("ci_hi"))
      assert(math.abs(row.getAs[Double]("diff_z") -
        (r1 - r0) / math.sqrt(v0 + v1)) < 1e-4)
    }
    assert(rows(0).getAs[Long]("clicks") ==
      perUser.filter(_._1 == 0).map(_._2).sum.toLong)
  }

  test("q354 chunking: count law, coverage, 8-token overlap, content hashes") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q354_rag_chunking")(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap
    val texts = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.keySet == texts.keySet)
    texts.foreach { case (id, text) =>
      val ts = text.split(" ", -1)
      val n = ts.length
      val expectChunks = if (n <= 32) 1 else (n - 32 + 23) / 24 + 1
      val chunks = rows(id)
      assert(chunks.length == expectChunks, s"doc $id: ${chunks.length} vs $expectChunks")
      chunks.foreach { c =>
        val start = c.getAs[Long]("start_tok").toInt
        val len = c.getAs[Long]("n_tokens").toInt
        assert(len == math.min(32, n - start))
        assert(c.getAs[String]("chunk_md5") ==
          md5hex(ts.slice(start, start + len).mkString(" ")))
      }
      // the last chunk reaches the end of the document
      val last = chunks.last
      assert(last.getAs[Long]("start_tok") + last.getAs[Long]("n_tokens") == n.toLong)
      // consecutive full chunks overlap by exactly 32 - 24 = 8 tokens
      chunks.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_tok") - a.getAs[Long]("start_tok") == 24L)
        case _ =>
      }
    }
  }

  test("q355 jackknife: leave-one-out estimates and SE match an in-memory recompute") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q355_stats_jackknife")(spark, sf).collect()
      .sortBy(_.getLong(0))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val hexIdx = "0123456789abcdef"
    val orders = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice").cast("decimal(18,4)"))
      .collect().map { r =>
        val h = md5hex(r.getLong(0).toString)
        val b = (hexIdx.indexOf(h(0)) * 16 + hexIdx.indexOf(h(1))) % 32
        (b.toLong, BigDecimal(r.getDecimal(1)))
      }
    val byBucket = orders.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(rows.length == byBucket.size)
    val (nTot, sTot) = (orders.length.toLong, orders.map(_._2).sum)
    val loos = rows.map { r =>
      val vals = byBucket(r.getLong(0))
      assert(r.getAs[Long]("n_b") == vals.length.toLong)
      val expect = (sTot - vals.sum).toDouble / (nTot - vals.length)
      assert(math.abs(r.getAs[Double]("theta_loo") - expect) < 1e-4)
      r.getAs[Double]("theta_loo")
    }
    val bar = loos.sum / loos.length
    val se = math.sqrt((loos.length - 1.0) / loos.length *
      loos.map(t => (t - bar) * (t - bar)).sum)
    assert(math.abs(rows.head.getAs[Double]("jk_se") - se) < 1e-3)
    assert(math.abs(rows.head.getAs[Double]("mean_total") -
      sTot.toDouble / nTot) < 1e-4)
    // the jackknife SE of a mean tracks sd/sqrt(n) within an order of magnitude
    assert(se > 0.0)
  }

  test("q356 post-stratification: weighted diff, SE and weights match a recompute") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q356_ab_poststrat")(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    val ud = Tables.events(spark, sf)
      .select(col("user_id"), org.apache.spark.sql.functions.expr(
        "ts_us div 86400000000").as("day"),
        col("value").cast("decimal(18,4)").as("v"))
      .collect().map(x => (x.getLong(0), x.getLong(1), BigDecimal(x.getDecimal(2))))
    val split = (ud.map(_._2).min + ud.map(_._2).max + 1) / 2
    val users = ud.groupBy(_._1).map { case (u, es) =>
      val pre = es.count(_._2 < split).toLong
      (math.min(pre / 16, 3L), u % 2,
        es.filter(_._2 >= split).map(_._3).sum.toDouble)
    }.toArray
    val n = users.length.toDouble
    // weights sum to 1 and stratum populations match
    assert(math.abs(rows.map(_.getAs[Double]("w")).sum - 1.0) < 1e-4)
    var (adj, vsum) = (0.0, 0.0)
    rows.foreach { r =>
      val s = r.getLong(0)
      val g0 = users.filter(u => u._1 == s && u._2 == 0L).map(_._3)
      val g1 = users.filter(u => u._1 == s && u._2 == 1L).map(_._3)
      assert(r.getAs[Long]("n_a") == g0.length && r.getAs[Long]("n_b") == g1.length)
      val w = (g0.length + g1.length) / n
      def mv(x: Array[Double]) = {
        val m = x.sum / x.length
        (m, x.map(v => (v - m) * (v - m)).sum / (x.length - 1))
      }
      val ((m0, v0), (m1, v1)) = (mv(g0), mv(g1))
      assert(math.abs(r.getAs[Double]("mean_a") - m0) < 1e-3)
      assert(math.abs(r.getAs[Double]("mean_b") - m1) < 1e-3)
      adj += w * (m1 - m0)
      vsum += w * w * (v1 / g1.length + v0 / g0.length)
    }
    assert(math.abs(rows.head.getAs[Double]("diff_adjusted") - adj) < 1e-2)
    assert(math.abs(rows.head.getAs[Double]("se_adjusted") - math.sqrt(vsum)) < 1e-2)
    // raw diff equals the unstratified means difference
    val (a, b) = users.partition(_._2 == 0L)
    assert(math.abs(rows.head.getAs[Double]("diff_raw") -
      (b.map(_._3).sum / b.length - a.map(_._3).sum / a.length)) < 1e-3)
  }

  test("q358 MDE table: values match the closed form and scale as 1/sqrt(k)") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q358_ab_power_mde")(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 8L, 16L))
    val ys = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.sum(
        col("value").cast("decimal(18,4)")).cast("double").as("y"))
      .collect().map(_.getDouble(1))
    val n = ys.length.toDouble
    val mean = ys.sum / n
    val variance = ys.map(y => (y - mean) * (y - mean)).sum / (n - 1)
    rows.foreach { r =>
      val nArm = (ys.length * r.getLong(0)) / 2
      assert(r.getAs[Long]("n_per_arm") == nArm)
      val mde = 2.801585 * math.sqrt(2.0 * variance / nArm)
      assert(math.abs(r.getAs[Double]("mde_abs") - mde) < 1e-2,
        s"k=${r.getLong(0)}: ${r.getAs[Double]("mde_abs")} vs $mde")
      assert(math.abs(r.getAs[Double]("mde_rel") - mde / mean) < 1e-4)
    }
    // more traffic, smaller MDE — and 1/sqrt(n_arm) scaling holds exactly
    // in terms of the EMITTED per-arm sizes (integer div makes k-ratios
    // inexact when the population is odd)
    val mdes = rows.map(r => (r.getAs[Long]("n_per_arm"), r.getAs[Double]("mde_abs")))
    assert(mdes.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) > w(1)))
    mdes.sliding(2).foreach {
      case Array((na, ma), (nb, mb)) =>
        assert(math.abs(mb / ma - math.sqrt(na.toDouble / nb)) < 1e-4)
      case _ =>
    }
  }

  test("q359 QTE: per-arm quantiles match a type-7 interpolated recompute") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q359_ab_quantile_effect")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("p25", "p50", "p75", "p90"))
    val users = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.sum(
        col("value").cast("decimal(18,4)")).cast("double").as("y"))
      .collect().map(r => (r.getLong(0) % 2, r.getDouble(1)))
    def qcont(xs: Array[Double], p: Double): Double = {
      val s = xs.sorted
      val h = (s.length - 1) * p
      val lo = h.toInt
      if (lo + 1 >= s.length) s(lo)
      else s(lo) + (h - lo) * (s(lo + 1) - s(lo))
    }
    val (a, b) = users.partition(_._1 == 0L)
    Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p90" -> 0.9).foreach {
      case (n, p) =>
        val r = rows(n)
        val (ea, eb) = (qcont(a.map(_._2), p), qcont(b.map(_._2), p))
        assert(math.abs(r.getAs[Double]("value_a") - ea) < 1e-4, s"$n arm a")
        assert(math.abs(r.getAs[Double]("value_b") - eb) < 1e-4, s"$n arm b")
        assert(math.abs(r.getAs[Double]("qte") - (eb - ea)) < 1e-3)
    }
    // quantiles are monotone within each arm
    val va = Seq("p25", "p50", "p75", "p90").map(n => rows(n).getAs[Double]("value_a"))
    assert(va.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
  }

  test("q360 Gini: Lorenz-trapezoid result equals the mean-absolute-difference form") {
    import org.apache.spark.sql.functions.col
    val r = SparkEntry.queries("q360_stats_gini")(spark, sf).head()
    val ys = Tables(spark, sf, "orders")
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.sum(
        col("o_totalprice").cast("decimal(18,4)")).cast("double").as("y"))
      .collect().map(_.getDouble(1))
    assert(r.getAs[Long]("n_customers") == ys.length.toLong)
    // the independent definition: G = sum |yi - yj| / (2 n^2 mu)
    val n = ys.length
    var mad = 0.0
    for (i <- 0 until n; j <- 0 until n) mad += math.abs(ys(i) - ys(j))
    val gini = mad / (2.0 * n * n * (ys.sum / n))
    assert(math.abs(r.getAs[Double]("gini") - gini) < 1e-4,
      s"gini ${r.getAs[Double]("gini")} vs MAD-form $gini")
    assert(gini > 0.0 && gini < 1.0)
  }

  test("q361 all-but-the-top: Pythagorean norms, share in (0,1), consistent with q293") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q361_embedding_abtt")(spark, sf).collect()
    assert(rows.length == Tables(spark, sf, "embeddings").count())
    rows.foreach { r =>
      val (p, nc, nabt) = (r.getAs[Double]("proj"),
        r.getAs[Double]("norm_centered"), r.getAs[Double]("norm_abt"))
      // removal never grows a vector, and the Pythagorean identity holds
      assert(nabt <= nc + 1e-9)
      assert(math.abs(nabt * nabt + p * p - nc * nc) < 1e-3,
        s"vec ${r.get(0)}: ||c'||^2 + p^2 != ||c||^2")
      assert(math.abs(p) <= nc + 1e-9) // |projection| bounded by the norm
    }
    val share = rows.head.getAs[Double]("top_pc_share")
    assert(share > 0.0 && share < 1.0)
    // share equals sum p^2 / sum ||c||^2 over the emitted rows
    val num = rows.map(r => math.pow(r.getAs[Double]("proj"), 2)).sum
    val den = rows.map(r => math.pow(r.getAs[Double]("norm_centered"), 2)).sum
    assert(math.abs(share - num / den) < 1e-3)
    // and it is consistent with q293's eigenvalue: share ~= lambda * n / total
    val pca = SparkEntry.queries("q293_embedding_pca")(spark, sf).collect()
    val lambda = pca.head.getAs[Double]("eigenvalue")
    assert(math.abs(share - lambda * rows.length / den) < 0.02)
  }

  test("q362 Gaussian DP: sigma calibration, md5 Irwin-Hall noise, healthy dispersion") {
    val rows = SparkEntry.queries("q362_anon_dp_gaussian")(spark, sf).collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val hexIdx = "0123456789abcdef"
    val sigma = math.sqrt(2.0 * math.log(1250000.0))
    val zs = rows.map { r =>
      val (nk, seg, tn) = (r.get(0).toString, r.getString(1), r.getAs[Long]("true_n"))
      assert(math.abs(r.getAs[Double]("sigma") - sigma) < 1e-5)
      val z = (1 to 12).map { i =>
        val h = md5hex(s"gauss:$nk:$seg:$i")
        (hexIdx.indexOf(h(0)) * 4096 + hexIdx.indexOf(h(1)) * 256 +
          hexIdx.indexOf(h(2)) * 16 + hexIdx.indexOf(h(3))).toDouble / 65536.0
      }.sum - 6.0
      assert(math.abs(r.getAs[Double]("noisy_n") - (tn + sigma * z)) < 1e-4,
        s"cell ($nk,$seg)")
      z
    }
    // Irwin-Hall draws behave like standard normals: mean near 0, unit-ish
    // variance, and they actually VARY across cells (the q127-grid AP bug
    // this operator's scaladoc documents showed max|z| 1.2)
    val m = zs.sum / zs.length
    val v = zs.map(z => (z - m) * (z - m)).sum / (zs.length - 1)
    assert(math.abs(m) < 0.5, s"mean z $m")
    assert(v > 0.5 && v < 2.0, s"var z $v")
    assert(zs.map(math.abs).max > 1.5, "noise suspiciously concentrated")
  }

  test("q363 Hill estimator matches an in-memory top-k recompute at each k") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q363_stats_hill_tail")(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(25L, 50L, 100L))
    val xs = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice").cast("double"))
      .collect().map(r => (r.getDouble(1), r.getLong(0)))
      .sortBy(p => (-p._1, p._2)).map(_._1)
    rows.foreach { r =>
      val k = r.getLong(0).toInt
      val xk = xs(k) // the (k+1)-th largest
      assert(math.abs(r.getAs[Double]("x_threshold") - xk) < 1e-4)
      val slog = xs.take(k)
        .map(x => math.floor(math.log(x / xk) * 1e6 + 0.5) / 1e6).sum
      assert(math.abs(r.getAs[Double]("alpha") - k / slog) < 1e-3,
        s"k=$k: ${r.getAs[Double]("alpha")} vs ${k / slog}")
      assert(r.getAs[Double]("alpha") > 0.0)
    }
  }

  test("q364 budget allocation: weights, epochs, caps and freed total recompute") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q364_mixture_budget")(spark, sf).collect()
    val tokens = Tables(spark, sf, "documents")
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions
        .size(org.apache.spark.sql.functions.split(col("text"), " "))
        .cast("bigint")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length == tokens.size)
    val tt = tokens.values.sum.toDouble
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val pa = tokens.view.mapValues(t => r6(math.pow(r6(t / tt), 0.3))).toMap
    val z = pa.values.map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    var freed = 0.0
    rows.foreach { r =>
      val s = r.getString(0)
      val q = r6(pa(s) / z)
      assert(r.getAs[Double]("q") == q, s"$s weight")
      val alloc = r6(q * 4.0 * tt)
      assert(math.abs(r.getAs[Double]("alloc") - alloc) < 1e-6)
      val epochs = r6(alloc / tokens(s))
      assert(math.abs(r.getAs[Double]("epochs") - epochs) < 1e-6)
      assert(r.getAs[Boolean]("capped") == (epochs > 4.0))
      val eff = r6(math.min(epochs, 4.0) * tokens(s))
      assert(math.abs(r.getAs[Double]("effective_tokens") - eff) < 1e-6)
      freed += r6(math.max(alloc - eff, 0.0))
    }
    assert(math.abs(rows.head.getAs[Double]("freed_budget") - freed) < 1e-3)
    // the allocation spends the whole budget (before capping)
    assert(math.abs(rows.map(_.getAs[Double]("alloc")).sum - 4.0 * tt) < 1.0)
    // a capped source exists iff some source is freed budget
    assert(rows.exists(_.getAs[Boolean]("capped")) == (freed > 0.0))
  }

  test("q365 cluster-robust: both analyses match in-memory recomputes; deff consistent") {
    import org.apache.spark.sql.functions.col
    val r = SparkEntry.queries("q365_ab_cluster_robust")(spark, sf).head()
    val cust = Tables(spark, sf, "customer")
      .select(col("c_nationkey").cast("long"), col("c_acctbal"))
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    val byCluster = cust.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def mv(x: Seq[Double]) = {
      val m = x.sum / x.length
      (m, x.map(v => (v - m) * (v - m)).sum / (x.length - 1))
    }
    // naive user-level analysis
    val (u0, u1) = cust.partition(_._1 % 2 == 0)
    val ((m0, v0), (m1, v1)) = (mv(u0.map(_._2).toSeq), mv(u1.map(_._2).toSeq))
    val seN = math.sqrt(v0 / u0.length + v1 / u1.length)
    assert(r.getAs[Long]("n_users_a") == u0.length)
    assert(math.abs(r.getAs[Double]("diff_naive") - (m1 - m0)) < 0.05)
    assert(math.abs(r.getAs[Double]("se_naive") - seN) < 0.05)
    // cluster-level analysis over r6-pinned cluster means
    val means = byCluster.view.mapValues(x =>
      math.floor(x.sum / x.length * 1e6 + 0.5) / 1e6).toMap
    val (c0, c1) = means.toSeq.partition(_._1 % 2 == 0)
    val ((cm0, cv0), (cm1, cv1)) = (mv(c0.map(_._2)), mv(c1.map(_._2)))
    val seC = math.sqrt(cv0 / c0.length + cv1 / c1.length)
    assert(r.getAs[Long]("n_clusters_a") == c0.length)
    assert(math.abs(r.getAs[Double]("diff_cluster") - (cm1 - cm0)) < 0.05)
    assert(math.abs(r.getAs[Double]("se_cluster") - seC) < 0.05)
    assert(math.abs(r.getAs[Double]("z_cluster") - (cm1 - cm0) / seC) < 1e-3)
    assert(math.abs(r.getAs[Double]("deff") - seC * seC / (seN * seN)) < 1e-3)
    assert(r.getAs[Double]("deff") > 0.0)
  }

  test("q366 ICC: ANOVA recompute; implied deff consistent with q365's measured deff") {
    import org.apache.spark.sql.functions.col
    val r = SparkEntry.queries("q366_ab_icc")(spark, sf).head()
    val cust = Tables(spark, sf, "customer")
      .select(col("c_nationkey").cast("long"), col("c_acctbal"))
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    val groups = cust.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val (k, n) = (groups.size.toDouble, cust.length.toDouble)
    val grand = cust.map(_._2).sum / n
    val ssb = groups.values.map { g =>
      val m = g.sum / g.length; g.length * (m - grand) * (m - grand)
    }.sum
    val ssw = groups.values.map { g =>
      val m = g.sum / g.length; g.map(x => (x - m) * (x - m)).sum
    }.sum
    val msb = ssb / (k - 1); val msw = ssw / (n - k)
    val m0 = (n - groups.values.map(g => g.length.toDouble * g.length).sum / n) / (k - 1)
    val icc = (msb - msw) / (msb + (m0 - 1) * msw)
    assert(r.getAs[Long]("n_clusters") == groups.size)
    assert(math.abs(r.getAs[Double]("m0") - m0) < 1e-3)
    assert(math.abs(r.getAs[Double]("ms_between") - msb) < math.abs(msb) * 1e-4)
    assert(math.abs(r.getAs[Double]("ms_within") - msw) < math.abs(msw) * 1e-4)
    assert(math.abs(r.getAs[Double]("icc") - icc) < 1e-4)
    assert(math.abs(r.getAs[Double]("deff_implied") - (1 + (m0 - 1) * icc)) < 1e-3)
    // cross-operator consistency: the Kish identity ties q366's implied
    // deff to q365's MEASURED one (equal-ish cluster sizes, 2 arms)
    val measured = SparkEntry.queries("q365_ab_cluster_robust")(spark, sf)
      .head().getAs[Double]("deff")
    assert(math.abs(r.getAs[Double]("deff_implied") - measured) < 0.35,
      s"implied ${r.getAs[Double]("deff_implied")} vs measured $measured")
  }

  test("q08/q28 non-empty branch: anti join and EXCEPT prove exact survivors on a synthetic fixture") {
    // VERDICT r14 item 2: on the shipped testdata both queries return 0
    // rows (every customer has an order; every customer nation has a
    // supplier) — correct, but the 0-row oracle match never exercises the
    // SURVIVOR branch. Same query code over a synthetic sfDir whose
    // result is provably non-empty, asserted exactly.
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val dir = java.nio.file.Files.createTempDirectory("graft_gate").toString
    def write(name: String, schema: StructType, rows: Seq[Row]): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    // fixture-schema twins (same names/types as TESTDATA.md)
    write("customer", StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
      (1L to 10L).map(k => Row(k, s"cust$k", (k % 4 + 1).toInt, 100.0 * k,
        if (k % 2 == 0) "BUILDING" else "MACHINERY")))
    write("orders", StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampNTZType),
      StructField("o_orderpriority", StringType))),
      Seq(1L, 2L, 3L).map(k => Row(k * 10, k, "F", 50.0,
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0), "1-URGENT")))
    write("supplier", StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType))),
      Seq(3, 4, 5).map(n => Row(n.toLong, s"supp$n", n, 10.0)))
    // q08 anti join: custkeys 1-3 have orders → survivors are EXACTLY 4..10
    val anti = SparkEntry.queries("q08_join_anti")(spark, dir).collect()
    assert(anti.map(_.getLong(0)).toSeq == (4L to 10L),
      s"anti survivors: ${anti.map(_.getLong(0)).mkString(",")}")
    anti.foreach(r => assert(r.getInt(1) == (r.getLong(0) % 4 + 1).toInt))
    // q28 EXCEPT: customer nations {1,2,3,4} minus supplier nations {3,4,5}
    // → EXACTLY {1,2}, deduped
    val exc = SparkEntry.queries("q28_set_except")(spark, dir).collect()
    assert(exc.map(_.getInt(0)).toSeq == Seq(1, 2),
      s"except survivors: ${exc.map(_.getInt(0)).mkString(",")}")
    // and on the real fixture the result equals an independent driver-side
    // set difference (non-empty at sf0.001; the sf0.01 oracle's standing
    // 0-row result is a property of THAT data, not of the operator)
    val custKeys = Tables(spark, sf, "customer").select("c_custkey")
      .collect().map(_.getLong(0)).toSet
    val orderCust = Tables(spark, sf, "orders").select("o_custkey")
      .collect().map(_.getLong(0)).toSet
    assert(SparkEntry.queries("q08_join_anti")(spark, sf).collect()
      .map(_.getLong(0)).toSet == custKeys -- orderCust)
    val custNations = Tables(spark, sf, "customer").select("c_nationkey")
      .collect().map(_.getInt(0)).toSet
    val suppNations = Tables(spark, sf, "supplier").select("s_nationkey")
      .collect().map(_.getInt(0)).toSet
    assert(SparkEntry.queries("q28_set_except")(spark, sf).collect()
      .map(_.getInt(0)).toSet == custNations -- suppNations)
  }

  test("q159 linkage audit: every customer links at least to itself; risk bounded") {
    val rows = SparkEntry.queries("q159_linkage_attack")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_records")).sum ==
      Tables(spark, sf, "customer").count())
    rows.foreach { r =>
      val (nr, reid, risk) = (r.getAs[Long]("n_records"),
        r.getAs[Long]("n_reidentified"), r.getAs[Double]("avg_risk"))
      assert(reid <= r.getAs[Long]("n_at_risk"))
      assert(r.getAs[Long]("n_at_risk") <= nr)
      assert(risk > 0.0 && risk <= 1.0)
    }
  }
}
