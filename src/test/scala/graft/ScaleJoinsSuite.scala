package graft

import graft.plans.ScaleJoins
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB join techniques actually executing: salted skew join
  * producing identical results to the plain join, and bucketed tables
  * joining with no shuffle exchange (SURVEY.md §7.5). */
class ScaleJoinsSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sfDir

  test("saltedJoin result == plain join result on a skewed key") {
    import spark.implicits._
    // heavily skewed left side: 90% of rows share one key
    val left = spark.range(0, 2000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val right = Seq((7L, "hot"), (0L, "a"), (10L, "b"), (20L, "c"))
      .toDF("rk", "name")
    val plain = left.join(right, col("k") === col("rk"))
      .select("k", "payload", "name").collect().toSet
    val salted = ScaleJoins.saltedJoin(left, right, col("k"), col("rk"), 8)
      .select("k", "payload", "name").collect().toSet
    assert(salted == plain)
    assert(plain.nonEmpty)

    // r15 review: a MAP-typed payload must not break the salt (hash()
    // rejects MapType since Spark 3) — salting skips unhashable columns
    val leftM = left.withColumn("props", map(lit("a"), col("payload")))
    val saltedM = ScaleJoins.saltedJoin(leftM, right, col("k"), col("rk"), 8)
      .select("k", "payload", "name").collect().toSet
    assert(saltedM == plain, "map-typed payload changed the salted join result")
  }

  private def countShuffles(plan: SparkPlan): Int = {
    val p = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    p.collect { case _: ShuffleExchangeExec => 1 }.sum
  }

  test("bucketed tables join without a shuffle exchange") {
    // the in-memory catalog is fresh each JVM but the warehouse dir
    // persists — drop and clear stale locations from earlier runs
    for (t <- Seq("orders_bkt", "customer_bkt")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        new java.io.File(sys.props("java.io.tmpdir"), "graft_warehouse"), t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Tables(spark, sf, "orders").write.mode("overwrite")
      .bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt")
    Tables(spark, sf, "customer").write.mode("overwrite")
      .bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bkt")
    val joined = spark.table("orders_bkt")
      .join(spark.table("customer_bkt"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
    joined.collect() // execute so AQE finalizes the plan
    val shuffles = countShuffles(joined.queryExecution.executedPlan)
    // the join itself is shuffle-free: only the final 1-key aggregation
    // exchanges data (bucketed scan satisfies the join's distribution)
    assert(shuffles <= 1, s"expected bucketed join without join-shuffles, got $shuffles\n" +
      joined.queryExecution.executedPlan.toString)
    // and the result matches the plain-parquet join
    val expected = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("AQE splits the skewed partition of a q05-style fact join") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // SURVEY §7.5's skew recipe, executing: a fact side where 90% of rows
    // share one key must trigger AQE's OptimizeSkewedJoin (thresholds
    // scaled down to test size), and the salted fallback must agree
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // the skewed partition carries one highly-compressible key — shuffle
      // bytes land far below production defaults, so scale the detection
      // thresholds down with the data
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val left = spark.range(0, 200000)
        .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 1000).as("k"),
          concat(lit("x"), col("id").cast("string"), lit("padpadpadpadpadpad")).as("payload"))
      val right = spark.range(0, 1000).select(col("id").as("rk"),
        concat(lit("dim"), col("id").cast("string")).as("name"))
      // payload flows THROUGH the join so the skewed partition has real
      // row weight (an agg-only output would prune it at the scan)
      val joined = left.join(right, col("k") === col("rk"))
        .groupBy("name").agg(count(lit(1)).as("cnt"), max(length(col("payload"))).as("w"))
      joined.collect() // execute so AQE finalizes the plan
      // QueryStageExec nodes are leaves — descend into their plans
      def allNodes(p: SparkPlan): Seq[SparkPlan] = {
        val inner = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case other => other.children
        }
        p +: inner.flatMap(allNodes)
      }
      val smjs = allNodes(joined.queryExecution.executedPlan)
        .collect { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, "expected a sort-merge join:\n" +
        joined.queryExecution.executedPlan.toString)
      assert(smjs.exists(_.isSkewJoin), "AQE did not mark the join skew-split:\n" +
        joined.queryExecution.executedPlan.toString)
      // and the explicit salted fallback computes identical rows
      val plain = left.join(right, col("k") === col("rk"))
        .select("k", "payload", "name").collect().toSet
      val salted = ScaleJoins.saltedJoin(left, right, col("k"), col("rk"), 8)
        .select("k", "payload", "name").collect().toSet
      assert(salted == plain && plain.nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("Zipf-skewed fact: AQE skew-split engages and salted join agrees") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // VERDICT r4 item 5: the single-hot-key synthetic above proves the
    // mechanism; real corpora skew as power laws. Draw keys from a
    // Pareto/Zipf tail (P[key ≥ x] ≈ x^-0.8, deterministic Knuth-hash
    // grid, ~40% of rows on the hottest key, a long tail over ~10^4
    // cold keys) and prove the SAME production paths hold: the plain
    // shuffle join is AQE-skew-split in the final adaptive plan, and
    // ScaleJoins.saltedJoin (q89's operator) returns identical rows.
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // u ∈ (0,1) from the q127 grid; key = ⌈u^(-1/0.8)⌉ capped at the
      // dim domain — a textbook inverse-CDF Pareto draw
      val left = spark.range(0, 300000)
        .select(least(ceil(pow(
          (col("id") * lit(2654435761L) % lit(1000003L) + lit(1L)) / lit(1000004.0),
          lit(-1.25))), lit(20000L)).as("k"),
          concat(lit("x"), col("id").cast("string"), lit("padpadpadpadpadpad")).as("payload"))
      val right = spark.range(1, 20001).select(col("id").as("rk"),
        concat(lit("dim"), col("id").cast("string")).as("name"))
      // sanity: the draw really is skewed — hottest key ≥ 30% of rows
      val top = left.groupBy("k").count().orderBy(col("count").desc).limit(1).collect()(0)
      assert(top.getLong(1) > 90000L, s"Zipf draw not skewed enough: $top")
      val joined = left.join(right, col("k") === col("rk"))
        .groupBy("name").agg(count(lit(1)).as("cnt"), max(length(col("payload"))).as("w"))
      joined.collect()
      def allNodes(p: SparkPlan): Seq[SparkPlan] = {
        val inner = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case other => other.children
        }
        p +: inner.flatMap(allNodes)
      }
      val smjs = allNodes(joined.queryExecution.executedPlan)
        .collect { case j: SortMergeJoinExec => j }
      assert(smjs.exists(_.isSkewJoin),
        "AQE did not skew-split the Zipf-skewed join:\n" +
          joined.queryExecution.executedPlan.toString)
      val plain = left.join(right, col("k") === col("rk"))
        .select("k", "payload", "name").collect().toSet
      val salted = ScaleJoins.saltedJoin(left, right, col("k"), col("rk"), 16)
        .select("k", "payload", "name").collect().toSet
      assert(salted == plain && plain.nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q114 runs with a dynamic-partition-pruning filter on the fact scan") {
    val df = SparkEntry.queries("q114_join_dpp")(spark, sf)
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1996L, 1997L, 1998L))
    // the year predicate exists nowhere as a literal — it must arrive at
    // the scan as a runtime partition filter from the broadcast dim
    assert(df.queryExecution.executedPlan.toString.toLowerCase
      .contains("dynamicpruning"),
      "expected dynamicpruningexpression in the fact scan:\n" +
        df.queryExecution.executedPlan.toString)
  }

  test("runtime bloom filter prunes the application side of a selective fact join") {
    // SURVEY §7.5: Spark's runtime row-level filtering — a selective dim
    // filter materializes as a bloom filter applied on the fact side
    // BEFORE its shuffle. Production thresholds (10 GB application-side
    // scan) are scaled to test data; assert the rewrite fires and the
    // result is filter-invariant.
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // shuffle join: bloom's target shape
      val fact = Tables(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
      val dim = Tables(spark, sf, "orders")
        .filter(col("o_totalprice") > 300000) // selective creation side
        .select("o_orderkey")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      assert(joined.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("might_contain"),
        "expected a bloom-filter might_contain on the fact side:\n" +
          joined.queryExecution.optimizedPlan.toString)
      val n = joined.count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      assert(n == fact.join(dim, col("l_orderkey") === col("o_orderkey")).count(),
        "bloom filter must not change the result")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q88's sfDir-tagged catalog names let two scale factors interleave") {
    val q88 = SparkEntry.queries("q88_join_bucketed")
    def expected(sfDir: String) = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        Tables.r6(sum(Tables.dec(col("o_totalprice"))).cast("double")).as("revenue"))
      .orderBy("c_mktsegment").collect().toSeq
    val sfA = TestSpark.sfDir
    val sfB = "/root/testdata/sf0.01"
    val expA = expected(sfA)
    val expB = expected(sfB)
    // interleaved invocations: A, B, then A again — with untagged catalog
    // names the B run would clobber A's tables and the second A run would
    // silently aggregate B's data
    assert(q88(spark, sfA).collect().toSeq == expA)
    assert(q88(spark, sfB).collect().toSeq == expB)
    assert(q88(spark, sfA).collect().toSeq == expA)
    assert(expA != expB, "test needs distinguishable scale factors")
  }

  test("bloomPrefilter: no false negatives, real pruning, measured FPR") {
    val cust = Tables(spark, sf, "customer").filter(col("c_mktsegment") === "BUILDING")
    val orders = Tables(spark, sf, "orders")
    val dimKeys = cust.select("c_custkey")
    val kept = ScaleJoins.bloomPrefilter(orders, col("o_custkey"), dimKeys)
      .select("o_orderkey", "o_custkey").collect()
    val matchKeys = dimKeys.collect().map(_.getLong(0)).toSet
    val total = orders.count()
    // (a) exact superset of the true matches — a single dropped matching
    // row would be a silent wrong JOIN result downstream
    val trueMatches = orders.filter(col("o_custkey").isInCollection(matchKeys)).count()
    assert(kept.count(r => matchKeys(r.getLong(1))) == trueMatches)
    // (b) the mask actually prunes: the segment is ~1/5 of customers, so
    // the pass-through must be way under the full fact table
    assert(kept.length < total * 0.5,
      s"bloom kept ${kept.length} of $total — no real pruning")
    // (c) false-positive rate: non-matching keepers over non-matching
    // total, against the (1-e^(-kn/m))^k budget with generous headroom
    val fp = kept.count(r => !matchKeys(r.getLong(1))).toDouble
    val fpr = fp / (total - trueMatches).toDouble
    val n = matchKeys.size.toDouble
    val budget = math.pow(1.0 - math.exp(-5.0 * n / 65536.0), 5.0)
    assert(fpr <= budget * 4 + 1e-6, s"FPR $fpr exceeds 4x analytic budget $budget")
    // (d) filtered-then-joined == plain join (the q234 oracle restated
    // on the row level, not just the aggregate)
    val viaBloom = ScaleJoins.bloomPrefilter(orders, col("o_custkey"), dimKeys)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val plain = orders.join(cust, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(viaBloom == plain)
  }

  test("graft_dot is installable via SparkSessionExtensions") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    // note: getOrCreate may return the shared session (extensions already
    // applied only on fresh sessions) — register explicitly as fallback,
    // then assert the function resolves and computes correctly
    graft.functions.VectorExpressions.register(s2)
    val r = s2.sql(
      "SELECT graft_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT)))").collect()(0).getDouble(0)
    assert(r == 4.0)
  }
}
