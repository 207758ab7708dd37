package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Correctness bounds for the no-oracle sketch queries (q111–q113):
  * estimates vs exact answers on sf0.001, plus the merge identities that
  * justify the sketch-per-shard pattern at scale. */
class SketchSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sfDir

  private def within(est: Double, exact: Double, tol: Double): Boolean =
    math.abs(est - exact) <= tol * math.max(exact, 1.0)

  test("q111 HLL: daily + merged-global estimates within 5% of exact") {
    val rows = SparkEntry.queries("q111_agg_sketch_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf)
      .withColumn("day", expr("ts_us DIV 86400000000"))
    val exactGlobal = ev.select("user_id").distinct().count().toDouble
    val exactDaily = ev.groupBy("day").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1).toDouble).toMap
    rows.foreach { r =>
      assert(within(r.getAs[Long]("daily_users").toDouble, exactDaily(r.getAs[Long]("day")), 0.05))
      assert(within(r.getAs[Long]("global_users").toDouble, exactGlobal, 0.05))
    }
    // merge identity: union of daily sketches == one whole-table sketch
    val whole = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .head().getLong(0)
    assert(rows.head.getAs[Long]("global_users") == whole,
      "merged daily sketches must equal the whole-corpus sketch exactly")
  }

  test("q112 KLL: quantiles are ordered and rank-accurate per language") {
    val rows = SparkEntry.queries("q112_agg_sketch_quantile")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables(spark, sf, "documents").select("lang", "n_chars")
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sorted }
    rows.foreach { r =>
      val xs = docs(r.getAs[String]("lang"))
      val (p50, p90, p99) = (r.getAs[Long]("p50"), r.getAs[Long]("p90"), r.getAs[Long]("p99"))
      assert(p50 <= p90 && p90 <= p99)
      // KLL default-k rank error is ~1.7%; allow 5%: the returned value's
      // true rank must sit near its nominal rank
      def rankOf(v: Long) = xs.count(_ <= v).toDouble / xs.length
      assert(math.abs(rankOf(p50) - 0.5) <= 0.05, s"p50 rank ${rankOf(p50)}")
      assert(math.abs(rankOf(p90) - 0.9) <= 0.05, s"p90 rank ${rankOf(p90)}")
      assert(rankOf(p99) >= 0.94)
    }
  }

  test("q113 Theta: union/intersection estimates match exact set algebra") {
    val row = SparkEntry.queries("q113_agg_sketch_overlap")(spark, sf).head()
    val ev = Tables.events(spark, sf)
    def users(t: String) = ev.filter(col("event_type") === t)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val (c, p) = (users("click"), users("purchase"))
    assert(within(row.getAs[Long]("users_either").toDouble, (c union p).size.toDouble, 0.05))
    assert(within(row.getAs[Long]("users_both").toDouble, (c intersect p).size.toDouble, 0.05))
  }

  test("q123 Misra–Gries: estimates honor the f−n/(k+1) ≤ est ≤ f guarantee") {
    val out = SparkEntry.queries("q123_agg_heavy_hitters")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    val exact = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val k = 256L
    val err = n / (k + 1) // max total undercount across partial summaries
    // (a) no overcount, (b) undercount bounded by n/(k+1)
    out.foreach { case (w, est) =>
      val f = exact.getOrElse(w, 0L)
      assert(est <= f, s"$w: est $est overcounts exact $f")
      assert(f - est <= err, s"$w: undercount ${f - est} > bound $err")
    }
    // (c) completeness: every word frequent enough that its estimate
    // cannot fall below the output threshold must be present
    val thresh = n.toDouble / (k + 1)
    exact.foreach { case (w, f) =>
      if (f - err > thresh)
        assert(out.contains(w), s"guaranteed-heavy word '$w' (f=$f) missing")
    }
    // (d) reproducible across runs (merge-order independence by design)
    val again = SparkEntry.queries("q123_agg_heavy_hitters")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == out)
  }

  test("q233 Count-Min: one-sided bounds per probe + bit-exact merge identity") {
    val rows = SparkEntry.queries("q233_agg_sketch_countmin")(spark, sf).collect()
    assert(rows.nonEmpty)
    val words = Tables(spark, sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val exact = words.groupBy("word").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = rows.head.getAs[Long]("n_words")
    assert(n == exact.values.sum)
    val width = operators.SketchOps.CmWidth
    rows.foreach { r =>
      val (w, est) = (r.getString(0), r.getAs[Long]("est"))
      val f = exact.getOrElse(w, 0L)
      // CM's deterministic guarantee: never an undercount. The overcount
      // bound est ≤ f + εN holds w.h.p.; 4·N/width is loose vs ε = e/width
      // and deterministic for these fixed seeds + data.
      assert(est >= f, s"$w: est $est undercounts exact $f")
      assert(est - f <= 4L * n / width, s"$w: overcount ${est - f} > 4N/w")
    }
    // merge identity: sketches of two disjoint halves, merged, must be
    // BIT-IDENTICAL to the whole-corpus sketch (integer cells, exact
    // element-wise sum — the sketch-per-shard pattern at 100 TB)
    val cm = udaf(new functions.CountMin(4, width))
    def sketchOf(df: org.apache.spark.sql.DataFrame): Array[Long] =
      df.agg(cm(col("word"))).head().getSeq[Long](0).toArray
    val whole = sketchOf(words)
    val lo = sketchOf(words.filter(col("doc_id") % 2 === 0))
    val hi = sketchOf(words.filter(col("doc_id") % 2 === 1))
    val merged = lo.zip(hi).map { case (a, b) => a + b }
    assert(java.util.Arrays.equals(whole, merged),
      "merged half-sketches must equal the whole-corpus sketch cell-for-cell")
  }
}
