package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The FrameMemo unpersist-safety contract (plans/FrameMemo.scala),
  * tested directly: the registry is the new r11 mechanism every dedup/
  * minhash/classifier query rides, and its sharp edge is a HOST that
  * sweeps persistent RDDs out from under a cached handle — the contract
  * says that must cost a rebuild, never correctness. */
class FrameMemoSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def sweepAll(): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))

  test("second lookup returns the SAME pinned handle; no second build") {
    import spark.implicits._
    var builds = 0
    def build = { builds += 1; Seq((1L, "a"), (2L, "b")).toDF("k", "v") }
    plans.FrameMemo.clear(spark)
    val a = plans.FrameMemo.shared(spark, "memo_test_reuse", "sfX")(build)
    val b = plans.FrameMemo.shared(spark, "memo_test_reuse", "sfX")(build)
    assert(builds == 1, "second lookup must not rebuild")
    assert(a eq b, "cache hit must return the identical handle")
    assert(b.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    plans.FrameMemo.clear(spark)
  }

  test("keys are (tag, sfDir)-scoped: different sfDir builds its own frame") {
    import spark.implicits._
    plans.FrameMemo.clear(spark)
    val a = plans.FrameMemo.shared(spark, "memo_test_key", "sfA")(
      Seq(1L).toDF("k"))
    val b = plans.FrameMemo.shared(spark, "memo_test_key", "sfB")(
      Seq(2L).toDF("k"))
    assert(a.collect().head.getLong(0) == 1L)
    assert(b.collect().head.getLong(0) == 2L)
    plans.FrameMemo.clear(spark)
  }

  test("a hostile full sweep forces a REBUILD, not a broken handle (contract rule 2)") {
    import spark.implicits._
    var builds = 0
    def build = { builds += 1; Seq((10L, 1L), (20L, 2L)).toDF("k", "n") }
    plans.FrameMemo.clear(spark)
    plans.FrameMemo.shared(spark, "memo_test_sweep", "sfX")(build).collect()
    sweepAll() // a host ignoring ownedIds — the contract's failure mode
    val after = plans.FrameMemo.shared(spark, "memo_test_sweep", "sfX")(build)
    assert(builds == 2, "swept entry must rebuild on next lookup")
    assert(after.agg(sum("n")).collect().head.getLong(0) == 3L,
      "rebuilt frame must answer correctly")
    plans.FrameMemo.clear(spark)
  }

  test("ownedIds covers the pinned RDDs and clear() releases them") {
    import spark.implicits._
    plans.FrameMemo.clear(spark)
    val before = plans.FrameMemo.ownedIds(spark)
    plans.FrameMemo.shared(spark, "memo_test_own", "sfX")(
      Seq(1L, 2L, 3L).toDF("k")).collect()
    val owned = plans.FrameMemo.ownedIds(spark) -- before
    assert(owned.nonEmpty, "a built entry must own at least one RDD id")
    assert(owned.forall(spark.sparkContext.getPersistentRDDs.contains),
      "owned ids must be live persistent RDDs")
    plans.FrameMemo.clear(spark)
    assert(owned.forall(id => !spark.sparkContext.getPersistentRDDs.contains(id)),
      "clear() must unpersist every owned RDD")
  }

  test("a CorpusPin inside a memo build is memo-owned: sweepOthers never invalidates it") {
    import spark.implicits._
    // r16 regression guard: pairsFromSigs pins its band frame INSIDE the
    // minhash_pairs memo build. If that pin registered for releaseAll,
    // every host sweep would unpersist a memo-pinned RDD and silently
    // force a rebuild per query — the memo's whole point lost.
    var builds = 0
    def build = {
      builds += 1
      Seq((1L, "x"), (2L, "y")).toDF("k", "v")
        .transform(plans.CorpusPin.pin)
        .select(col("k"), upper(col("v")).as("v"))
    }
    plans.FrameMemo.clear(spark)
    plans.FrameMemo.shared(spark, "memo_test_pin", "sfX")(build).collect()
    plans.FrameMemo.sweepOthers(spark) // the real host sweep, twice
    plans.FrameMemo.sweepOthers(spark)
    plans.FrameMemo.shared(spark, "memo_test_pin", "sfX")(build).collect()
    assert(builds == 1,
      "the host sweep must not invalidate a memo entry whose build pinned")
    plans.FrameMemo.clear(spark)
  }

  test("reentrant memo builds keep pin classification (depth counter, ADVICE r16)") {
    import spark.implicits._
    // the old single boolean inBuild was reset by the INNER build's
    // finally while the OUTER build was still running — a pin issued
    // after the inner build returned registered for releaseAll, so each
    // host sweep unpersisted a memo-pinned RDD and invalidated the outer
    // entry on every query. The per-thread depth keeps the flag true for
    // the whole outer build.
    var outerBuilds = 0
    def outer = {
      outerBuilds += 1
      val inner = plans.FrameMemo.shared(spark, "memo_test_inner", "sfX")(
        Seq((1L, "i")).toDF("k", "vi"))
      Seq((1L, "o"), (2L, "o2")).toDF("k", "vo")
        .transform(plans.CorpusPin.pin) // AFTER the inner build returned
        .join(inner, Seq("k"), "left_outer")
    }
    plans.FrameMemo.clear(spark)
    plans.FrameMemo.shared(spark, "memo_test_outer", "sfX")(outer).collect()
    plans.FrameMemo.sweepOthers(spark) // the real host sweep, twice
    plans.FrameMemo.sweepOthers(spark)
    val again = plans.FrameMemo.shared(spark, "memo_test_outer", "sfX")(outer)
    assert(again.count() == 2)
    assert(outerBuilds == 1,
      "a pin after a nested inner build must stay memo-owned — the sweep invalidated the outer entry")
    plans.FrameMemo.clear(spark)
  }

  test("a pin from ANOTHER THREAD during a memo build is host-owned, not memo-owned") {
    import spark.implicits._
    // per-THREAD depth (ADVICE r16): a concurrent session thread pinning
    // while some memo build runs must be classified by ITS OWN state —
    // the old global boolean marked it memo-owned, so it was never
    // registered and leaked past every releaseAll.
    plans.FrameMemo.clear(spark)
    plans.CorpusPin.releaseAll(spark)
    val buildStarted = new java.util.concurrent.CountDownLatch(1)
    val pinDone = new java.util.concurrent.CountDownLatch(1)
    @volatile var other: org.apache.spark.sql.DataFrame = null
    val t = new Thread(() => {
      buildStarted.await()
      other = Seq((9L, "t")).toDF("k", "v").transform(plans.CorpusPin.pin)
      pinDone.countDown()
    })
    t.start()
    plans.FrameMemo.shared(spark, "memo_test_xthread", "sfX") {
      buildStarted.countDown()
      assert(pinDone.await(30, java.util.concurrent.TimeUnit.SECONDS))
      Seq(1L).toDF("k")
    }.collect()
    t.join()
    assert(other.storageLevel.useDisk, "the cross-thread pin should be persisted")
    plans.CorpusPin.releaseAll(spark)
    assert(other.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "a cross-thread pin during a build must be releasable (host-owned), not leak as memo-owned")
    plans.FrameMemo.clear(spark)
  }

  test("durable pin tier: conf-gated reliable checkpoint, same rows, one-leaf plan") {
    import spark.implicits._
    // VERDICT r16 item 4: with spark.graft.pin.durableDir set, pin()
    // upgrades to an eager reliable checkpoint — consumers read a flat
    // LogicalRDD leaf (no lineage replanning, survives executor loss);
    // unset, the recomputable persist tier is untouched.
    val dir = java.nio.file.Files.createTempDirectory("graft_durable_test")
    spark.conf.set(plans.CorpusPin.DurableDirKey, dir.toString)
    try {
      val pinned = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
        .transform(plans.CorpusPin.pin)
      assert(pinned.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
      assert(pinned.queryExecution.optimizedPlan.toString.contains("LogicalRDD"),
        s"durable pin must be a one-leaf LogicalRDD scan:\n${pinned.queryExecution.optimizedPlan}")
      assert(pinned.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
        "durable pins must not register a CacheManager entry")
      // checkpoint files actually landed in the configured dir
      def fileCount(d: java.io.File): Int =
        Option(d.listFiles).getOrElse(Array.empty)
          .map(f => if (f.isDirectory) fileCount(f) else 1).sum
      assert(fileCount(dir.toFile) > 0, "no checkpoint files written to the durable dir")
      // joins of the pinned frame to itself read the files, not the lineage
      val self = pinned.join(pinned.toDF("k", "v2"), "k")
      assert(self.count() == 3L)
    } finally {
      spark.conf.unset(plans.CorpusPin.DurableDirKey)
      import scala.sys.process._
      Seq("rm", "-rf", dir.toString).!
    }
    // conf unset again: the default tier persists with lineage
    val lazyPin = Seq((9L, "z")).toDF("k", "v").transform(plans.CorpusPin.pin)
    assert(lazyPin.storageLevel.useDisk, "default tier must persist MEMORY_AND_DISK")
    plans.CorpusPin.releaseAll(spark)
  }

  test("multi-probe candidates are a SUPERSET of exact-bucket candidates (q124 family)") {
    // the multiProbe ring includes XOR 0 (the exact key), so every
    // exact-bucket collision must survive the retune — losing one would
    // mean the recall fix silently changed candidate semantics
    val sf = TestSpark.sfDir
    functions.VectorExpressions.register(spark)
    val sigs = operators.NearDup.hyperplaneSigFrame(
      Tables(spark, sf, "embeddings")).localCheckpoint(true)
    val banded = sigs.select(col("vec_id"), col("sig"),
        explode(sequence(lit(0), lit(7))).as("b"))
      .select(col("vec_id"), col("b"),
        expr("shiftright(sig, cast(b * 4 as int)) & 15").as("k"))
    def pairs(probe: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      probe.select(col("vec_id").as("id_p"), col("b"), col("k"))
        .join(banded.select(col("vec_id").as("id_c"), col("b"), col("k")),
          Seq("b", "k"))
        .filter(col("id_p") =!= col("id_c"))
        .select("id_p", "id_c").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val probeSide = banded.filter(col("vec_id") < 10)
    val exact = pairs(probeSide)
    val multi = pairs(operators.NearDup.multiProbe(probeSide))
    assert(exact.subsetOf(multi),
      s"multi-probe lost exact-bucket pairs: ${(exact -- multi).take(5)}")
    assert(multi.size > exact.size,
      "flip-1 ring should add candidates on this corpus")
  }
}
