package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite

/** The 100× memory question, demonstrated instead of argued from plan
  * shape (VERDICT r12 item 4): at sf0.1 everything fits in RAM, so this
  * suite FORCES every buffered operator onto its spill path — window,
  * sort-merge-join and cartesian buffers spill after 64 rows, hash
  * aggregation falls back to sort-based after 2 partitions×64 keys, and
  * the shuffle runs at 2 partitions so per-partition state is maximal —
  * and asserts the heaviest queries (the r12 plan-audit set plus the r14
  * heavy tier) still complete AND return byte-identical results. Spill metrics
  * from the task listener prove the constrained paths actually engaged
  * (a run that never spills proves nothing).
  *
  * This is the local-mode proxy for an executor whose partition no
  * longer fits: Spark's buffered operators degrade to external
  * sort/merge rather than OOM, and the results are unchanged because
  * every spill path is a sort-preserving external algorithm. Measured
  * behavior is recorded in SCALING.md (round 13).
  */
class SpillSuite extends AnyFunSuite {
  private lazy val base = TestSpark.spark
  private val sf = TestSpark.sfDir

  private val heavy = Seq(
    "q261_anon_km_suppress", "q297_learning_curve", "q170_graph_jaccard",
    "q267_ts_theil_sen", "q240_entity_resolution",
    // r14 heavy tier (VERDICT r14 item 5): the IVF-PQ ADC search, the
    // full-matrix quantile normalization, the ABtT anisotropy pass (the
    // round's slowest addition, shares the PCA core), and the
    // Anderson–Darling ECDF machinery
    "q339_ann_ivf_pq", "q344_quantile_normalize",
    "q361_embedding_abtt", "q357_stats_anderson_darling")

  test("9 heaviest queries: identical results under forced spill paths, spills observed") {
    // baseline on the shared session (normal confs)
    val expected = heavy.map { n =>
      n -> SparkEntry.queries(n)(base, sf).collect().map(_.toString).toSeq
    }.toMap

    // fresh session → fresh FrameMemo/conf scope; the shared context's
    // other sessions keep their settings
    val spark = base.newSession()
    val spilled = new java.util.concurrent.atomic.AtomicLong()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          spilled.addAndGet(t.taskMetrics.memoryBytesSpilled + t.taskMetrics.diskBytesSpilled)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      // buffered-operator spill thresholds: hold ≤64 rows in memory, then
      // take the external-spill path (the behavior a too-big partition
      // triggers via memory pressure on a real executor)
      Seq("spark.sql.windowExec.buffer.in.memory.threshold",
        "spark.sql.windowExec.buffer.spill.threshold",
        "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold",
        "spark.sql.sortMergeJoinExec.buffer.spill.threshold",
        "spark.sql.cartesianProductExec.buffer.spill.threshold",
        "spark.sql.sessionWindow.buffer.in.memory.threshold",
        "spark.sql.sessionWindow.buffer.spill.threshold")
        .foreach(spark.conf.set(_, "64"))
      // hash aggregation: force the sort-based fallback after 64 keys
      // (the documented behavior when the hash map can't grow)
      spark.conf.set("spark.sql.TungstenAggregate.testFallbackStartsAt", "2,64")
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "64")

      heavy.foreach { n =>
        val got = SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq
        assert(got == expected(n),
          s"$n: results diverged under forced spilling (${got.size} vs ${expected(n).size} rows)")
      }
      assert(spilled.get() > 0L,
        "no operator reported spill bytes — the constrained paths never engaged, " +
          "so this run demonstrates nothing about memory-bounded execution")
      info(s"total spill across the ${heavy.size} queries: ${spilled.get() / 1024} KiB")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
