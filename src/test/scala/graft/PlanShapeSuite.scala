package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Asserts q48's tokenizer plan is the DISTRIBUTED two-phase rank: no
  * single-partition Exchange anywhere (the round-2 global
  * `Window.orderBy` funneled every distinct identity through one task —
  * a 100 TB scale-killer since identities grow with the data), while the
  * result still equals the naive global dense_rank. */
class PlanShapeSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sfDir

  /** AQE-aware plan walk that does NOT descend into InMemoryRelation
    * build plans — exactly the "what do downstream operators read" view:
    * a parquet scan under a CorpusPin/cache boundary is the pay-once
    * build (executed at most once), not a downstream rescan. */
  private object Walk
      extends org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
    def nodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] =
      collect(p) { case n => n }
  }

  test("q48 plan has no single-partition exchange; tokens match global dense_rank") {
    val df = SparkEntry.queries("q48_anon_tokenize")(spark, sf)
    val got = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"q48 still plans a single-partition exchange:\n$plan")

    // positive control: the rejected global-window formulation DOES plan
    // one — proving the string probe detects what it should
    val bad = Tables(spark, sf, "customer").select("c_name").distinct()
      .withColumn("token", dense_rank().over(Window.orderBy("c_name")))
    bad.collect()
    assert(bad.queryExecution.executedPlan.toString.contains("Exchange SinglePartition"),
      "control failed: global-window plan no longer shows a single-partition exchange")

    // semantics unchanged: two-phase rank ≡ dense_rank over distinct names
    val naive = Tables(spark, sf, "customer")
      .join(bad.withColumn("token", col("token").cast("bigint")), "c_name")
      .select("c_custkey", "token").orderBy("c_custkey").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      naive.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("DistributedCumSum plan has no single-partition exchange (q263/q266 ECDF path)") {
    // the distribution-test family's scale claim: cumulative counts over
    // the value domain must NOT funnel through one task the way
    // `sum().over(Window.orderBy(v))` does
    val perVal = Tables(spark, sf, "customer")
      .groupBy(col("c_acctbal").as("v"))
      .agg(sum(when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L)).as("n1"))
    val cum = graft.plans.DistributedCumSum.cumulative(perVal, "v", Seq("n1"))
    cum.collect()
    val plan = cum.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"two-phase cumulative still plans a single-partition exchange:\n$plan")

    // positive control: the rejected global-window form DOES plan one
    val bad = perVal.withColumn("cum_n1",
      sum("n1").over(Window.orderBy("v")))
    bad.collect()
    assert(bad.queryExecution.executedPlan.toString.contains("Exchange SinglePartition"),
      "control failed: global-window cumulative no longer shows a single-partition exchange")
  }

  test("q119/q122: window and aggregation share ONE key exchange as documented") {
    // the Scaladoc claims the navigation window and the groupBy reuse a
    // single shuffle because they share the partition key — enforce it:
    // exactly one hashpartitioning exchange on the key columns in the
    // whole plan (plus whatever the final presentation sort plans)
    for (name <- Seq("q119_ts_ohlc", "q122_time_weighted_avg")) {
      val qe = SparkEntry.queries(name)(spark, sf).queryExecution
      qe.toRdd.count()
      // AQE's toString prints Final AND Initial plans — count only the final
      val plan = qe.executedPlan.toString.split("== Initial Plan ==")(0)
      val nKeyExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(nKeyExchanges == 1,
        s"$name: expected exactly 1 hash exchange (window+agg shared), got $nKeyExchanges:\n$plan")
    }
  }

  test("scan family: filters pushed, columns pruned, sources as declared") {
    import org.apache.spark.sql.execution.FormattedMode
    // one assertion loop over EVERY scan-family query (VERDICT r4 item
    // 7): each case lists markers that must (not) appear in the final
    // formatted plan — pushdown reaching the reader, partition/dynamic
    // pruning firing, untouched wide columns absent from ReadSchema,
    // and each declared source format actually scanned.
    val cases: Seq[(String, Seq[String], Seq[String])] = Seq(
      ("q01_scan_project_filter",
        Seq("pushedfilters: [isnotnull(l_shipdate)"), Seq("l_comment", "l_partkey")),
      ("q02_scan_csv_roundtrip", Seq("scan csv"), Nil),
      ("q03_scan_json_lines", Seq("scan json"), Nil),
      ("q69_scan_orc_roundtrip", Seq("scan orc"), Nil),
      ("q184_scan_avro_roundtrip", Seq("scan avro"), Nil),
      ("q70_scan_partitioned_prune", Seq("partitionfilters: [", "o_year"), Nil),
      ("q95_scan_binary_decode", Seq("binaryfile"), Nil),
      ("q97_union_multisource",
        Seq("scan csv", "scan json", "scan parquet"), Nil),
      ("q110_zorder_locality", Nil, Seq("c_comment", "c_phone")),
      ("q114_join_dpp", Seq("dynamicpruning"), Nil))
    for ((name, must, mustNot) <- cases) {
      val qe = SparkEntry.queries(name)(spark, sf).queryExecution
      qe.toRdd.count() // finalize AQE so the formatted plan is the real one
      val plan = qe.explainString(FormattedMode).toLowerCase
      for (m <- must)
        assert(plan.contains(m), s"$name: missing plan marker '$m'\n$plan")
      for (m <- mustNot)
        assert(!plan.contains(m), s"$name: '$m' present — pruning regressed\n$plan")
    }
  }

  test("Tables.events keeps column pruning and filter pushdown through ts_us") {
    // the r9 canonicalization inserts a Project (unix_micros cast / DIV)
    // between every events consumer and the scan; Catalyst must still
    // collapse it so a type-filtered, narrow consumer reads ONLY its
    // columns and the predicate reaches the parquet reader — at 100 TB
    // this is the difference between scanning 3 columns of the hot set
    // and scanning the whole table
    // clean cache first: an earlier query's CorpusPin over the same
    // events projection would otherwise substitute an InMemoryScan here
    // and hide the very FileScan this test inspects
    graft.plans.FrameMemo.sweepOthers(spark)
    val q = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts_us")
      .filter(col("event_type") === "click")
    q.collect()
    val scanLine = q.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("FileScan parquet"))
      .getOrElse(fail("no FileScan in events plan"))
    assert(scanLine.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]"),
      s"event_type predicate not pushed through the ts_us projection:\n$scanLine")
    for (dropped <- Seq("props", "value", "event_id"))
      assert(!scanLine.toLowerCase.contains(s"$dropped:"),
        s"untouched column '$dropped' still read by the scan:\n$scanLine")
  }

  test("quantile family plans carry no unbounded Percentile aggregate") {
    // q19/q136/q137/q139 moved off the builtin `percentile` (whose merge
    // buffer holds every distinct group value) onto BoundedQuantiles'
    // two-pass selection; the executed plans must show NO percentile
    // aggregate anywhere — only ordinary hash aggregates and the
    // bucket-bounded windows
    for (name <- Seq("q19_agg_median", "q136_ab_test",
        "q137_rfm_scoring", "q139_skew_report", "q242_stats_winsorized",
        "q247_daily_quantile_bands")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.toLowerCase.contains("percentile"),
        s"$name still plans a percentile aggregate:\n$plan")
    }
    // positive control: a builtin-percentile plan DOES show the probe string
    val bad = Tables(spark, sf, "orders").agg(expr("percentile(o_totalprice, 0.5)"))
    bad.collect()
    assert(bad.queryExecution.executedPlan.toString.toLowerCase.contains("percentile"),
      "control failed: builtin percentile no longer visible in plan text")
  }

  test("q62 plan is cartesian-free (cell-bound pruning, equi-joins only)") {
    // the r4 all-pairs baseline planned a BroadcastNestedLoopJoin over
    // the full pair space; the cell-bound rewrite must never — candidates
    // flow through broadcast/hash equi-joins on cell ids alone
    val df = SparkEntry.queries("q62_dedup_embedding")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"q62 still plans a cartesian/nested-loop join:\n$plan")

    // positive control: the rejected all-pairs formulation DOES plan one
    graft.functions.VectorExpressions.register(spark)
    val emb = Tables(spark, sf, "embeddings")
    val bad = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
      .join(emb.select(col("vec_id").as("ib"), col("embedding").as("eb")),
        col("ia") < col("ib"))
    bad.count()
    val badPlan = bad.queryExecution.executedPlan.toString
    assert(badPlan.contains("CartesianProduct") || badPlan.contains("BroadcastNestedLoop"),
      "control failed: all-pairs theta join no longer shows a cartesian node")
  }

  test("q151: lattice scoring never rescans the corpus (bounded checkpoint boundary)") {
    // the finest-cell frame is built in ONE eager corpus pass and
    // checkpointed at 18 node rows; the lattice scoring plan must read
    // ONLY that RDD — any parquet scan here would be a second 100 TB pass
    val df = SparkEntry.queries("q151_anon_lattice")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      s"q151 lattice scoring rescans the corpus:\n$plan")
    assert(plan.contains("Scan ExistingRDD"), "expected the checkpointed cell frame")
  }

  test("q159: linkage attack plans hash equi-joins only (range folded into bins)") {
    // the ±500 balance window is pre-exploded into ≤2 overlapping bins so
    // the attacker×published match is a pure equi-join; a range predicate
    // reaching the join would plan BNLJ/cartesian — the 100× killer
    val df = SparkEntry.queries("q159_linkage_attack")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"q159 plans a non-equi join:\n$plan")
  }

  test("no query plans an unbounded cartesian / nested-loop join (VERDICT r9)") {
    // Sweep EVERY registered query's physical plan (AQE off so the static
    // plan is inspectable without executing) and demand that each
    // CartesianProduct / BroadcastNestedLoopJoin node builds on a
    // PROVABLY BOUNDED side: a grand aggregate (keys=[] ⇒ ≤1 row), an
    // explicit limit / TakeOrdered, or a literal LocalTableScan. The few
    // probe-driven exceptions must appear in the allowlist below WITH a
    // runtime or literal bound — anything else is an O(n²) plan waiting
    // for corpus-scale input.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, TakeOrderedAndProjectExec, LocalTableScanExec}
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    // name → why its non-equi join side is bounded anyway
    val allowlisted: Map[String, String] = Map(
      "q11_join_cross_topk" ->
        "probe side runtime-gated at Joins.MaxCrossProbe rows (require())",
      "q90_join_fuzzy_topk" ->
        "probe side literal-bounded (c_custkey <= 10) before the theta join")
    // Structural proof of a bounded build side. Many legitimately-bounded
    // frames in this codebase are localCheckpoint'd (centroids, grand
    // totals, per-class rates), which erases the plan into Scan
    // ExistingRDD — for those, fall back to EXECUTING the build subplan
    // and demanding a constant-small row count at test scale: a corpus
    // frame at sf0.001 is already thousands of rows, so an accidental
    // data-sized BNLJ build still trips the probe.
    def structurallyBounded(side: SparkPlan): Boolean = side.collectFirst {
      case a: BaseAggregateExec if a.groupingExpressions.isEmpty => ()
      case _: CollectLimitExec => ()
      case _: GlobalLimitExec => ()
      case _: TakeOrderedAndProjectExec => ()
      case _: LocalTableScanExec => ()
    }.isDefined
    def bounded(side: SparkPlan): Boolean = structurallyBounded(side) || {
      val n = try side.execute().count() catch { case _: Throwable => Long.MaxValue }
      n <= 1000L
    }
    val wasAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
           if !allowlisted.contains(name)) {
        val plan = fn(spark, sf).queryExecution.executedPlan
        plan.foreach {
          case c: CartesianProductExec =>
            if (!bounded(c.left) && !bounded(c.right))
              offenders += s"$name: CartesianProduct with no bounded side"
          case j: BroadcastNestedLoopJoinExec =>
            val build = j.buildSide match {
              case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
              case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
            }
            // strip the codegen/exchange shell: BroadcastExchange in
            // particular only supports executeBroadcast(), so the runtime
            // row-count fallback must run on its child
            def strip(p: SparkPlan): SparkPlan = p match {
              case i: org.apache.spark.sql.execution.InputAdapter => strip(i.child)
              case w: org.apache.spark.sql.execution.WholeStageCodegenExec => strip(w.child)
              case b: BroadcastExchangeExec => strip(b.child)
              // a reused exchange is as bounded as the exchange it reuses
              // (q192: the broadcast of one LIMIT 1 argmax reuses the
              // other's sort exchange) — judge the referenced subtree
              case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
                strip(r.child)
              case other => other
            }
            val inner = strip(build)
            if (!bounded(inner))
              offenders += s"$name: BNLJ builds on [" +
                inner.collect { case n => n.nodeName }.mkString(" > ") + "]"
          case _ => ()
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", wasAqe)
    assert(offenders.isEmpty,
      s"unbounded non-equi joins planned:\n  ${offenders.mkString("\n  ")}")
  }

  test("crossDotProducts rejects a corpus-sized probe side (VERDICT r9)") {
    // the q11 gate that earns its allowlist entry above: handing the
    // brute-force path more than MaxCrossProbe probe rows must fail fast
    // with a pointer at the index paths, BEFORE any join is planned
    // (embeddings.parquet is a fixed 500 rows at every sf, so a
    // corpus-sized probe is synthesized at 2× the gate)
    val emb = Tables(spark, sf, "embeddings")
    val corpus = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    val big = spark.range(operators.Joins.MaxCrossProbe * 2)
      .select(col("id").as("id_a"), typedLit(Array.fill(4)(0.5f)).as("ea"))
    val e = intercept[IllegalArgumentException](
      operators.Joins.crossDotProducts(big, corpus))
    assert(e.getMessage.contains("q124_ann_hyperplane") &&
      e.getMessage.contains("q63_ann_ivf"),
      s"gate message must point at the index paths, got: ${e.getMessage}")
    // and the bounded probe still works (q11's own shape)
    val ok = operators.Joins.crossDotProducts(
      emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
        .filter(col("id_a") < 3), corpus)
    assert(ok.count() > 0)
  }

  test("q180: dimension join is broadcast; fact rows never shuffle raw (VERDICT r9)") {
    val qe = SparkEntry.queries("q180_stream_enrich")(spark, sf).queryExecution
    qe.toRdd.count()
    val plan = qe.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"),
      s"q180 must broadcast the customer dim:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"q180 must not shuffle the fact side for the dim join:\n$plan")
    // the only hash exchange is the (segment, type)-bounded aggregate's
    val nKeyExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nKeyExchanges == 1,
      s"q180: expected 1 post-aggregate exchange, got $nKeyExchanges:\n$plan")
  }

  test("q181: ingest dedup plans only bounded equi-joins (VERDICT r9)") {
    val qe = SparkEntry.queries("q181_ingest_dedup")(spark, sf).queryExecution
    qe.toRdd.count()
    val plan = qe.executedPlan.toString.split("== Initial Plan ==")(0)
    // exact semi-join on the content hash + banded simhash equi-join on
    // (b, k) — any nested-loop/cartesian here means the batch×index
    // candidate restriction was lost and the plan is O(batch × index)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"q181 must stay equi-join only:\n$plan")
    val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(plan).length
    assert(joins >= 2, s"q181: expected the hash semi-join AND the band join, " +
      s"got $joins equi-joins:\n$plan")
  }

  test("q250: conversion pairing is a user-keyed equi-join, never a nested loop") {
    val qe = SparkEntry.queries("q250_join_stream_stream")(spark, sf).queryExecution
    qe.toRdd.count()
    val plan = qe.executedPlan.toString.split("== Initial Plan ==")(0)
    // the time band must ride as a RESIDUAL condition on the user_id
    // equi-join — a cartesian/nested loop here means the per-user state
    // bound that makes the streaming twin viable was lost in batch too
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"q250 must stay a keyed equi-join:\n$plan")
    assert("(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findFirstIn(plan).isDefined && plan.contains("user_id"),
      s"q250: expected an equi-join keyed on user_id:\n$plan")
  }

  test("r10 additions: scoring never rescans the corpus past the checkpoint boundary") {
    // q186/q188/q189/q190 each collapse the corpus ONCE into an eagerly
    // checkpointed bounded/keyed frame (daily cells, distinct user-item,
    // cohort events, distinct doc-grams); everything downstream must read
    // ONLY that RDD — a parquet scan in the final plan would be a second
    // 100 TB pass (q151's probe, applied to the round-10 family)
    // since r16 these collapse frames are CorpusPin-persisted (lineage
    // kept), so the boundary is an InMemoryTableScan instead of a
    // checkpointed LogicalRDD — the property is the same: downstream
    // operators read ONLY the boundary. Walk does not descend into the
    // cache's build plan, so any FileSourceScan it finds is a real
    // downstream rescan.
    for (q <- Seq("q186_ts_autocorrelation", "q188_anon_km_audit",
        "q189_survival_km", "q190_text_novelty")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val nodes = Walk.nodes(df.queryExecution.executedPlan)
      assert(!nodes.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]),
        s"$q rescans the corpus after its pin boundary:\n" +
          df.queryExecution.executedPlan)
      assert(nodes.exists(n =>
          n.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryTableScanExec] ||
          n.nodeName.contains("ExistingRDD")),
        s"$q: expected the pinned frame boundary in the plan:\n" +
          df.queryExecution.executedPlan)
    }
  }

  test("q185: df-cap rides a broadcast anti-join; q187 scans parquet only for seeds") {
    // q185 shares q61's inverted-index dataflow: the hot-shingle cap must
    // be a broadcast LeftAnti (hot set is tiny by the counting bound),
    // never a shuffled pair-space filter. Since r11 the registered q185
    // reads the FrameMemo-pinned frames (its own plan is Scan
    // ExistingRDD), so probe the identical generic path — the memo build
    // runs exactly this plan once per session.
    val d185 = operators.NearDup.containmentPairsOf(
      Tables(spark, sf, "documents"), tau = 0.5)
    d185.collect()
    val p185 = d185.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin .*LeftAnti".r.findFirstIn(p185).isDefined,
      s"q185 df-cap is not a broadcast anti-join:\n$p185")
    // q187's edge list is built once (checkpointed): no lineitem/orders
    // scan may survive into the final plan — that would repeat the fact
    // join per hop. (The pruned single-column supplier SEED scan being
    // replicated across its consumers is fine: it's a filtered dim
    // projection, not the 100 TB side.)
    val d187 = SparkEntry.queries("q187_graph_khop")(spark, sf)
    d187.collect()
    // the edge list is pinned once (CorpusPin since r16): fact scans may
    // appear only INSIDE the pin's build plan (pay-once), never as a
    // downstream input — Walk sees only downstream scans
    val scans187 = Walk.nodes(d187.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.toString }
    assert(scans187.forall(s => !s.contains("lineitem") && !s.contains("orders")),
      s"q187 rescans the fact side past the edge pin:\n${scans187.mkString("\n")}")
    assert(scans187.exists(_.contains("supplier")),
      s"q187's seed scan went missing:\n${scans187.mkString("\n")}")
  }

  test("q183: pruning and pushdown survive a mergeSchema read (VERDICT r9)") {
    import org.apache.spark.sql.execution.FormattedMode
    // run q183 once so both schema generations exist on disk…
    SparkEntry.queries("q183_scan_schema_merge")(spark, sf).collect()
    // mirror operators.Scans.tmp(): since the per-process suffix landed
    // there, the path carries the writing JVM's pid — the query above ran
    // in THIS jvm, so ProcessHandle.current().pid() is the right suffix
    // (r17: the old pid-less path only passed while a stale pre-suffix
    // fixture dir survived on disk)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_evo_nation_" +
      s"${math.abs(sf.hashCode)}_p${ProcessHandle.current().pid()}"
    // …then prove the evolved directory still scans like a first-class
    // table: the key filter reaches the reader and the untouched evolved
    // column stays out of ReadSchema
    val qe = spark.read.option("mergeSchema", "true").parquet(path)
      .filter(col("n_nationkey") < 5).select("n_name").queryExecution
    qe.toRdd.count()
    val plan = qe.explainString(FormattedMode).toLowerCase
    assert(plan.contains("pushedfilters:") && plan.contains("lessthan(n_nationkey,5)"),
      s"q183 mergeSchema read loses filter pushdown:\n$plan")
    val readSchema = plan.split("readschema:")(1).split("\n")(0)
    assert(!readSchema.contains("n_regionkey"),
      s"q183 mergeSchema read fails to prune the evolved column: $readSchema")
  }

  test("q201 CDC compaction is one aggregation — no window, no join (r10)") {
    // the compaction claim: max(struct) argmax + count in ONE key-shuffle
    // aggregation. A row_number formulation would plan a Window (full
    // per-key buffering); a two-frame formulation would plan a join.
    val qe = SparkEntry.queries("q201_cdc_apply")(spark, sf).queryExecution
    qe.toRdd.count()
    // AdaptiveSparkPlan's toString appends the pre-AQE "Initial Plan" —
    // inspect only the final section or every node double-counts
    val plan = qe.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Window"), s"q201 planned a Window:\n$plan")
    assert(!plan.contains("Join"), s"q201 planned a join:\n$plan")
    val keyExchanges = plan.split("\n").count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(keyExchanges == 1,
      s"q201: expected exactly 1 key shuffle, got $keyExchanges:\n$plan")
  }

  test("q196/q197/q198 eval family: one corpus aggregation each, windows only on the bin frame (r10)") {
    // the score-bin groupBy is the single corpus-collapsing shuffle; any
    // Sort/Window in the plan must sit above the ≤1001-row bin frame.
    // Proxy probe: exactly ONE aggregate pair keyed on the corpus (the
    // bin groupBy); no join back to documents (no second scan of the
    // corpus parquet beyond the checkpoint build).
    for (q <- Seq("q197_eval_calibration", "q198_eval_confusion")) {
      val qe = SparkEntry.queries(q)(spark, sf).queryExecution
      qe.toRdd.count()
      // final-plan section only (see q201 probe comment)
      val plan = qe.executedPlan.toString.split("== Initial Plan ==")(0)
      val scans = plan.split("\n").count(l => l.contains("documents.parquet"))
      assert(scans == 1, s"$q scans the corpus $scans times:\n$plan")
    }
    // q196 checkpoints the bin frame then fans out: the corpus scan sits
    // BEFORE the checkpoint, so the executed plan shows no parquet scan
    val qe196 = SparkEntry.queries("q196_eval_roc_auc")(spark, sf).queryExecution
    qe196.toRdd.count()
    assert(!qe196.executedPlan.toString.contains("documents.parquet"),
      "q196 must read the corpus only inside the checkpointed bin build")
  }

  test("q206 weighted median: sort windows, never a percentile buffer (r10)") {
    // R7: the builtin exact percentile's unbounded buffer is banned; the
    // weighted median must be running-sum windows over the keyed sort.
    val qe = SparkEntry.queries("q206_weighted_median")(spark, sf).queryExecution
    qe.toRdd.count()
    val plan = qe.executedPlan.toString
    assert(!plan.toLowerCase.contains("percentile"),
      s"q206 planned a percentile aggregate:\n$plan")
    assert(plan.contains("Window"), s"q206 lost its window formulation:\n$plan")
  }

  test("q207 interval-overlap join stays equi-keyed (bucketed, no range join) (r10)") {
    val qe = SparkEntry.queries("q207_join_interval_overlap")(spark, sf).queryExecution
    qe.toRdd.count()
    val plan = qe.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"q207 planned a non-equi join:\n$plan")
    assert(plan.contains("Join"), s"q207 lost its join:\n$plan")
  }

  test("q221 plans the NATIVE as-of exec: no Window, co-partitioned merge (r10)") {
    val qe = SparkEntry.queries("q221_join_asof_native")(spark, sf).queryExecution
    qe.toRdd.count()
    val plan = qe.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("AsOfJoin ["), s"native exec not planned:\n$plan")
    assert(!plan.contains("Window"),
      s"q221 must go through the merge exec, not the window formulation:\n$plan")
    assert("hashpartitioning".r.findAllIn(plan.toLowerCase).size >= 2,
      s"as-of children not co-partitioned:\n$plan")
  }

  test("q124: signature stage is shuffle-free (signatures computed pre-exchange)") {
    // all exchanges in the q124 plan must sit ABOVE the localCheckpoint
    // boundary (band join / rerank); the 16-dot signature projection
    // itself is narrow. Probes the PRODUCTION sig builder
    // (NearDup.hyperplaneSigFrame) — not a copy that could drift.
    graft.functions.VectorExpressions.register(spark)
    val sigs = operators.NearDup.hyperplaneSigFrame(Tables(spark, sf, "embeddings"))
    sigs.collect()
    val plan = sigs.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"signature projection must be narrow (no Exchange):\n$plan")
  }

  test("q314 answers from the persisted index: no signature recompute in the plan (r11)") {
    // first invocation builds the bucketed (b, k) layout; the SECOND must
    // plan as scans of the index table + rerank only — any shiftright
    // (band-key derivation from a recomputed sig) in the final plan means
    // the layout isn't actually being served from
    SparkEntry.queries("q314_ann_index_layout")(spark, sf).collect()
    val qe = SparkEntry.queries("q314_ann_index_layout")(spark, sf).queryExecution
    qe.toRdd.count()
    val plan = qe.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("graft_ann_idx"),
      s"q314 must scan the persisted index table:\n$plan")
    assert(!plan.contains("shiftright"),
      s"q314 recomputes band keys instead of reading the index:\n$plan")
  }

  test("q325 incremental index maintenance: delta-only hashing, base served from the layout (r12)") {
    // first invocation builds the base layout; the SECOND must plan as
    // (index scan ANTI-JOIN tombstones) UNION (delta hashing) — the base
    // corpus is never re-hashed: exactly ONE graft_dot-bearing projection
    // (the delta side) and the persisted index table in the scan set
    SparkEntry.queries("q325_ann_index_upsert")(spark, sf).collect()
    val qe = SparkEntry.queries("q325_ann_index_upsert")(spark, sf).queryExecution
    qe.toRdd.count()
    val plan = qe.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("graft_ann_idx") && plan.contains("_base"),
      s"q325 must serve the base side from the persisted index layout:\n$plan")
    // the 32-dot signature projection appears exactly once (delta side);
    // a second one would mean the base corpus is being re-hashed
    val sigProjects = plan.split("\n").count(l => l.contains("graft_dot"))
    assert(sigProjects == 1,
      s"q325 must hash ONLY the delta (found $sigProjects sig projections):\n$plan")
    // the delete is an anti-join, not a rebuild-with-filter
    assert(plan.toLowerCase.contains("leftanti"),
      s"q325 deletes must anti-join the tombstone feed:\n$plan")
  }

  test("q232 BM25: top-k is a TakeOrdered, stats/df broadcast, one tf exchange") {
    val qe = SparkEntry.queries("q232_text_bm25")(spark, sf).queryExecution
    qe.toRdd.count()
    val plan = qe.executedPlan.toString.split("== Initial Plan ==")(0)
    // the top-20 must be a distributed TakeOrdered — a global Sort over
    // scored docs is the 100× killer the Scaladoc rules out
    assert(plan.contains("TakeOrderedAndProject"),
      s"q232 must plan a TakeOrdered for its top-k:\n$plan")
    // (N, avgdl) and the per-term df join both broadcast (never shuffle
    // the corpus side); the only hash exchanges are the (doc,term) tf
    // count and the per-doc score sum
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"q232 stats/df must broadcast:\n$plan")
    // downstream-only view (Walk): the pinned toks/tf cache-build plans
    // render inline in the plan STRING and carry their own exchanges —
    // those run once at the pin boundary, not per downstream consumer
    val nodes = Walk.nodes(qe.executedPlan)
    assert(!nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      s"q232 must not shuffle-join the corpus:\n$plan")
    val nKeyExchanges = nodes.count {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => true
      case _ => false }
    assert(nKeyExchanges <= 3,
      s"q232: expected tf + df + score exchanges at most, got $nKeyExchanges:\n$plan")
  }

  test("q234 bloom: mask broadcasts once; fact filter sits under the exact join") {
    val qe = SparkEntry.queries("q234_join_bloom_prefilter")(spark, sf).queryExecution
    qe.toRdd.count()
    val plan = qe.executedPlan.toString.split("== Initial Plan ==")(0)
    // the 1-row mask arrives via a broadcast nested-loop (crossJoin of a
    // single row); the membership test must appear as a Filter BELOW the
    // exact join — textual order in the tree printout: the bit-arithmetic
    // filter line is indented deeper than (printed after) the final join
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"q234 must broadcast the mask row:\n$plan")
    val joinAt = plan.indexOf("Join")
    val filterAt = plan.indexOf("shiftright")
    assert(filterAt > joinAt && joinAt >= 0,
      s"q234: bloom bit-filter must sit under (after) the join in the tree:\n$plan")
    // and no unbounded cartesian anywhere beyond that 1-row mask ship
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length == 1,
      s"q234: exactly one (1-row) BNLJ expected:\n$plan")
  }
}
