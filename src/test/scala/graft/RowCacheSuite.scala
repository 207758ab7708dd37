package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The CorpusPin cache path under graft.plans.RowCacheSerializer (the
  * session's `spark.sql.cache.serializer`, mirrored by TestSpark):
  * raw UnsafeRow images must round-trip every house type, serve pruned
  * reads through an UnsafeProjection, and feed both sides of a
  * self-join — the three shapes every pinned frame exercises. */
class RowCacheSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def base = {
    import spark.implicits._
    (0L until 500L).map { i =>
      (i,
        if (i % 7 == 0) null else s"text_$i",
        s"lang${i % 3}",
        Array.tabulate(4)(d => (i + d).toFloat),
        BigDecimal(i).setScale(4))
    }.toDF("id", "txt", "lang", "vec", "d")
  }

  test("pinned frame round-trips strings/nulls/float-arrays/decimals exactly") {
    assert(spark.conf.get("spark.sql.cache.serializer") ==
      "graft.plans.RowCacheSerializer")
    val expect = base.collect().map(_.toString).sorted.toSeq
    val pinned = base.transform(graft.plans.CorpusPin.pin)
    try {
      val got = pinned.collect().map(_.toString).sorted.toSeq
      assert(got == expect)
      // the read really went through the cache, not a recompute
      assert(pinned.queryExecution.executedPlan.toString.contains("InMemory"),
        "pinned read must be served by the cache")
    } finally graft.plans.FrameMemo.sweepOthers(spark)
  }

  test("a pinned handle SURVIVES hostile block loss — the recomputability contract") {
    // the r16 conversion's entire point: an eager localCheckpoint is
    // unrecoverable once its blocks are gone (executor loss at fleet
    // scale, or a host sweep), while a CorpusPin keeps lineage. Simulate
    // the loss with the real host sweep and re-read the SAME handle.
    val pinned = base.transform(graft.plans.CorpusPin.pin)
    val before = pinned.count()
    graft.plans.FrameMemo.sweepOthers(spark) // blocks + cache entry gone
    val after = pinned.count() // must REBUILD from lineage, not throw
    assert(after == before, s"recompute after block loss returned $after, want $before")
    // contrast: the checkpointed form of the same frame is NOT
    // recomputable — its truncated-lineage re-read throws once swept
    val ckpt = base.localCheckpoint(true)
    assert(ckpt.count() == before)
    graft.plans.FrameMemo.sweepOthers(spark)
    val died = try { ckpt.count(); false } catch { case _: Throwable => true }
    assert(died, "a swept localCheckpoint should be unrecoverable — if this " +
      "starts passing, Spark changed semantics and the pin rationale needs a re-read")
    graft.plans.FrameMemo.sweepOthers(spark)
  }

  test("pruned reads and self-joins through the row cache match uncached") {
    val pinned = base.transform(graft.plans.CorpusPin.pin)
    try {
      val prunedGot = pinned.groupBy("lang").agg(sum("d").as("s"))
        .collect().map(_.toString).sorted.toSeq
      val prunedExp = base.groupBy("lang").agg(sum("d").as("s"))
        .collect().map(_.toString).sorted.toSeq
      assert(prunedGot == prunedExp)
      val j = pinned.select(col("id").as("a"), col("lang"))
        .join(pinned.select(col("id").as("b"), col("lang")), "lang").count()
      // 3 langs; ids split round-robin: sum of group sizes squared
      val exp = (0 until 3).map { g =>
        val n = (0 until 500).count(_ % 3 == g).toLong; n * n }.sum
      assert(j == exp, s"self-join through the cache returned $j, want $exp")
    } finally graft.plans.FrameMemo.sweepOthers(spark)
  }
}
