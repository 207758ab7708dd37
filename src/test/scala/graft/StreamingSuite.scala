package graft

import graft.streaming.{Event, StreamOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** True Structured Streaming semantics (SURVEY.md §2.8/§5.5): watermarked
  * tumbling windows, late-row dropping, stateful dedup, and custom
  * sessionization — on the incremental engine via MemoryStream. */
class StreamingSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def runBatches[T](stream: MemoryStream[Event], df: org.apache.spark.sql.DataFrame,
      sink: String, batches: Seq[Seq[Event]]): Array[org.apache.spark.sql.Row] = {
    val q = df.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(sink).collect()
  }

  test("tumbling window counts match the batch equivalent; late rows drop") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Event]
    val out = StreamOps.tumblingHourly(stream.toDF())
    // batch 1: events in hour 0 and hour 1; batch 2: watermark-advancer in
    // hour 3 plus a LATE row back in hour 0 that must be dropped
    val b1 = Seq(
      Event(1, ts(5), 1, "click", 1.0), Event(2, ts(20), 1, "click", 2.0),
      Event(3, ts(70), 2, "view", 3.0))
    val b2 = Seq(Event(4, ts(200), 1, "click", 4.0))
    val late = Seq(Event(5, ts(6), 1, "click", 99.0))
    val q = out.writeStream.format("memory").queryName("tumb")
      .outputMode("append").start()
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable() // watermark → 200min−10min
      stream.addData(late); q.processAllAvailable() // dropped
      stream.addData(Seq(Event(6, ts(400), 9, "view", 0.0))) // close hour 3
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("tumb").collect()
      .map(r => (r.getStruct(0).getTimestamp(0).toString, r.getString(1), r.getLong(2)))
    // hour-0 click window: exactly the 2 on-time events; late row absent
    assert(rows.contains(("2024-01-01 00:00:00.0", "click", 2L)), rows.mkString(", "))
    assert(rows.contains(("2024-01-01 01:00:00.0", "view", 1L)))
  }

  test("stream-static enrichment joins the dim and aggregates per closed window") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Event]
    // tiny static dimension: users 1,2 → segments A,B; user 3 unmatched
    val dim = Seq((1L, "SEG_A"), (2L, "SEG_B"))
      .toDF("c_custkey", "c_mktsegment")
    val rows = runBatches(stream, StreamOps.enrichStatic(stream.toDF(), dim), "enrich",
      Seq(
        Seq(Event(1, ts(5), 1, "click", 1.0), Event(2, ts(20), 1, "click", 2.0),
          Event(3, ts(30), 2, "view", 3.0), Event(4, ts(40), 3, "view", 4.0)),
        // watermark-advancers: close hour 0, then the advancer's own hour
        Seq(Event(5, ts(200), 1, "click", 0.0)),
        Seq(Event(6, ts(400), 2, "view", 0.0))))
    val got = rows.map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSet
    // hour-0 enriched counts: user 1 (SEG_A) 2 clicks, user 2 (SEG_B) 1
    // view; user 3 has no dim row — inner join drops it
    assert(got.contains(("SEG_A", "click", 2L)), rows.mkString(", "))
    assert(got.contains(("SEG_B", "view", 1L)))
    assert(!got.exists(_._3 == 4L), "unmatched user leaked through the inner join")
  }

  test("stateful dedup keeps first occurrence within watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Event]
    val rows = runBatches(stream, StreamOps.dedupWithinWatermark(stream.toDF()), "dedup",
      Seq(
        Seq(Event(1, ts(1), 1, "click", 1.0), Event(1, ts(1), 1, "click", 1.0)),
        Seq(Event(1, ts(2), 1, "click", 7.0), Event(2, ts(3), 1, "view", 2.0))))
    assert(rows.map(_.getAs[Long]("event_id")).sorted.toSeq == Seq(1L, 2L))
  }

  test("dropDuplicatesWithinWatermark: dup inside horizon drops, re-emission after eviction passes") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Event]
    val rows = runBatches(stream, StreamOps.dedupTtl(stream.toDF()), "dedup_ttl",
      Seq(
        // key (1,1) first seen at minute 1
        Seq(Event(1, ts(1), 1, "click", 1.0)),
        // duplicate inside the 10-minute horizon → dropped
        Seq(Event(1, ts(2), 1, "click", 2.0)),
        // unrelated event advances the watermark to 200−10=190, which
        // passes key (1,1)'s expiry (ts 1 + 10) → its state is evicted
        Seq(Event(100, ts(200), 2, "view", 3.0)),
        // re-emission of the SAME key after eviction → KEPT; this is the
        // TTL semantics plain dropDuplicates cannot express (it would
        // still hold the key and drop this row)
        Seq(Event(1, ts(210), 1, "click", 4.0))))
    val got = rows.map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("value")))
      .sortBy(_._2)
    assert(got.toSeq == Seq((1L, 1.0), (100L, 3.0), (1L, 4.0)),
      s"TTL dedup semantics diverged: ${got.toSeq}")
  }

  test("native session_window: stream ≡ batch, RocksDB state, watermark evicts closed sessions") {
    // VERDICT r12 item 6: the missing streaming twin of q94's batch
    // sessionization — Spark's NATIVE session_window aggregation on the
    // incremental engine, proven three ways: (1) append-mode output
    // equals the batch session_window over the same on-time events,
    // (2) a late row beyond the watermark joins no session, (3) the
    // RocksDB provider holds the session state and EVICTS it when the
    // watermark closes the session (numRowsRemoved > 0).
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[Event]
      val q = StreamOps.sessionWindows(stream.toDF()).writeStream
        .format("memory").queryName("sess_native").outputMode("append").start()
      val onTime = Seq(
        // user 1: minutes 0/10/20 merge into ONE session [0, 50); user 2
        // a singleton [5, 35)
        Seq(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(10), 1, "click", 1.0),
          Event(3, ts(20), 1, "view", 1.0), Event(4, ts(5), 2, "click", 1.0)),
        // user 1 again at minute 100: a SECOND session; also advances the
        // watermark to 90, closing (and evicting) both hour-0 sessions
        Seq(Event(5, ts(100), 1, "click", 1.0)),
        // far-future advancer closes the minute-100 session too; a final
        // advancer then closes ITS session so every session but the very
        // last is emitted by append mode
        Seq(Event(7, ts(400), 9, "view", 1.0)),
        Seq(Event(8, ts(600), 9, "view", 1.0)))
      try {
        onTime.take(2).foreach { b => stream.addData(b); q.processAllAvailable() }
        // LATE row: minute 12 is far behind the watermark (90) — must
        // join no session and resurrect none
        stream.addData(Seq(Event(6, ts(12), 1, "click", 99.0))); q.processAllAvailable()
        onTime.drop(2).foreach { b => stream.addData(b); q.processAllAvailable() }
        assert(q.recentProgress.exists(_.stateOperators.exists(_.numRowsRemoved > 0)),
          "watermark never evicted closed session state")
      } finally q.stop()
      def keyOf(r: org.apache.spark.sql.Row) =
        (r.getStruct(0).getTimestamp(0).toString, r.getStruct(0).getTimestamp(1).toString,
          r.getLong(1), r.getLong(2))
      val streamed = spark.table("sess_native").collect().map(keyOf).toSet
      // batch reference: the SAME native session_window over the on-time
      // events (the late row was dropped by the stream), bounded by the
      // final watermark (600 − 10): append mode can only have emitted
      // sessions the watermark already closed
      val batch = StreamOps.sessionWindows(onTime.flatten.toDF())
        .filter(col("session_window.end") <= ts(590))
        .collect().map(keyOf).toSet
      assert(streamed == batch,
        s"stream/batch session sets diverge:\n stream=$streamed\n batch=$batch")
      // shape sanity: user 1 has exactly two sessions, [0,50) and [100,130)
      assert(streamed.count(_._3 == 1L) == 2)
      assert(streamed.contains(("2024-01-01 00:00:00.0", "2024-01-01 00:50:00.0", 1L, 3L)))
      assert(streamed.contains(("2024-01-01 01:40:00.0", "2024-01-01 02:10:00.0", 1L, 1L)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stateful pipelines green under the RocksDB state store provider") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    implicit val sq = spark.sqlContext
    // SURVEY §7.5 names the RocksDB provider for high-cardinality session
    // state (off-heap state, incremental snapshots). Semantics must be
    // identical to the default HDFS-backed provider: re-run the stateful
    // dedup and custom-sessionize pipelines under it and assert the same
    // results — plus proof from the query progress metrics that RocksDB
    // actually engaged (not a silently ignored conf).
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val s1 = MemoryStream[Event]
      val q = StreamOps.dedupWithinWatermark(s1.toDF()).writeStream
        .format("memory").queryName("rdb_dedup").outputMode("append").start()
      try {
        s1.addData(Seq(Event(1, ts(1), 1, "click", 1.0), Event(1, ts(1), 1, "click", 1.0)))
        q.processAllAvailable()
        s1.addData(Seq(Event(1, ts(2), 1, "click", 7.0), Event(2, ts(3), 1, "view", 2.0)))
        q.processAllAvailable()
        val sop = q.lastProgress.stateOperators
        assert(sop.nonEmpty &&
          sop(0).customMetrics.keySet.asScala.exists(_.toLowerCase.contains("rocksdb")),
          s"RocksDB provider did not engage: ${sop.map(_.customMetrics.keySet).mkString}")
      } finally q.stop()
      assert(spark.table("rdb_dedup").collect()
        .map(_.getAs[Long]("event_id")).sorted.toSeq == Seq(1L, 2L))

      val s2 = MemoryStream[Event]
      val rows = runBatches(s2, StreamOps.sessionize(s2.toDS()).toDF(), "rdb_sess",
        Seq(
          Seq(Event(1, ts(0), 1, "click", 0), Event(2, ts(10), 1, "click", 0)),
          Seq(Event(3, ts(60), 1, "click", 0)),
          Seq(Event(4, ts(65), 1, "click", 0), Event(5, ts(0), 2, "view", 0))))
      val byId = rows.map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_id")).toMap
      assert(byId(1) == 1 && byId(2) == 1 && byId(3) == 2 && byId(4) == 2 && byId(5) == 1,
        s"sessionize semantics changed under RocksDB: $byId")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming LOCF equals the q144 batch semantics on the same rows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Event]
    // views are the gaps (their value is ignored); state must carry the
    // last real observation ACROSS micro-batches and per user
    val batches = Seq(
      Seq(Event(1, ts(1), 1, "view", 9.0), Event(2, ts(2), 1, "click", 5.0)),
      Seq(Event(3, ts(3), 1, "view", 9.0), Event(4, ts(4), 1, "purchase", 7.5),
        Event(5, ts(1), 2, "view", 1.0)),
      Seq(Event(6, ts(5), 1, "view", 0.0), Event(7, ts(2), 2, "signup", 3.25)))
    val rows = runBatches(stream, StreamOps.locf(stream.toDS()).toDF(), "locf_par", batches)
    val got = rows.map(r => r.getAs[Long]("event_id") ->
      (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // reference: the q144 batch rule applied in-memory over all rows
    val expect = batches.flatten.groupBy(_.user_id).flatMap { case (_, evs) =>
      var last: Option[Double] = None
      evs.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
        if (e.event_type != "view") last = Some(e.value)
        e.event_id -> last
      }
    }.toMap
    assert(got == expect, s"got $got want $expect")
  }

  test("streaming transitions equal the q171 batch semantics on the same rows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Event]
    // the user-1 click→view transition straddles batches 1→2: its first
    // half is batch-1 state, its second half arrives in batch 2
    val batches = Seq(
      Seq(Event(1, ts(1), 1, "click", 0.0), Event(2, ts(2), 1, "click", 0.0)),
      Seq(Event(3, ts(3), 1, "view", 0.0), Event(4, ts(1), 2, "view", 0.0)),
      Seq(Event(5, ts(4), 1, "purchase", 0.0), Event(6, ts(2), 2, "view", 0.0)))
    val rows = runBatches(stream,
      StreamOps.transitions(stream.toDS()).toDF(), "trans_par", batches)
    val got = rows.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    // reference: q171's LEAD rule applied in-memory over all rows
    val expect = batches.flatten.groupBy(_.user_id).toSeq.flatMap { case (u, evs) =>
      val s = evs.sortBy(e => (e.ts.getTime, e.event_id)).map(_.event_type)
      s.zip(s.tail).map { case (a, b) => (u, a, b) }
    }.groupBy(identity).view.mapValues(_.length).toMap
    assert(got == expect, s"got $got want $expect")
    assert(got.contains((1L, "click", "view"))) // the cross-batch transition
  }

  test("streaming linear attribution equals the q176 batch semantics on the same rows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Event]
    // user 1: purchase at minute 65 credits the batch-1 clicks at minutes
    // 5 (exactly 1 h before — closed lower end) and 20, but NOT minute 4
    // (61 min); the minute-70 purchase shares its instant with a click
    // (closed upper end — the same-µs click counts). user 2 is organic.
    val batches = Seq(
      Seq(Event(1, ts(4), 1, "click", 0.0), Event(2, ts(5), 1, "click", 0.0),
        Event(3, ts(20), 1, "click", 0.0)),
      Seq(Event(4, ts(65), 1, "purchase", 10.0), Event(5, ts(10), 2, "purchase", 3.0)),
      Seq(Event(6, ts(70), 1, "click", 0.0), Event(7, ts(70), 1, "purchase", 5.0),
        Event(8, ts(75), 2, "view", 0.0)))
    val rows = runBatches(stream,
      StreamOps.linearAttribution(stream.toDS()).toDF(), "linattr_par", batches)
    val got = rows.map(r => r.getAs[Long]("event_id") ->
      (r.getAs[Long]("n_touches"),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        r.getAs[Boolean]("organic"))).toMap
    // reference: the q176 batch RANGE-frame rule applied in-memory
    val all = batches.flatten
    val expect = all.filter(_.event_type == "purchase").map { p =>
      val t = p.ts.getTime * 1000
      val n = all.count(e => e.user_id == p.user_id && e.event_type == "click" &&
        e.ts.getTime * 1000 >= t - 3600L * 1000000L && e.ts.getTime * 1000 <= t).toLong
      p.event_id -> (n,
        if (n > 0) Some(math.floor(1.0 / n * 1e6 + 0.5) / 1e6) else None,
        n == 0)
    }.toMap
    assert(got == expect, s"got $got want $expect")
    assert(got(4L)._1 == 2L, "cross-batch credit (batch-1 clicks, batch-2 purchase)")
    assert(got(7L)._1 == 2L, "same-instant click must count (closed upper end)")
    assert(got(5L)._3, "user 2 purchase is organic")
  }

  test("custom sessionize assigns ids on 30-minute gaps across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Event]
    val out = StreamOps.sessionize(stream.toDS())
    val rows = runBatches(stream, out.toDF(), "sess",
      Seq(
        Seq(Event(1, ts(0), 1, "click", 0), Event(2, ts(10), 1, "click", 0)),
        Seq(Event(3, ts(60), 1, "click", 0)), // 50-min gap → new session
        Seq(Event(4, ts(65), 1, "click", 0), Event(5, ts(0), 2, "view", 0))))
    val byId = rows.map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_id")).toMap
    assert(byId(1) == 1 && byId(2) == 1, s"$byId")
    assert(byId(3) == 2 && byId(4) == 2, s"$byId")
    assert(byId(5) == 1)
  }

  test("file sink: streaming parquet write with checkpoint, batch readback") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_stream_sink").toFile
    val out = new java.io.File(base, "out").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath
    val stream = MemoryStream[Event]
    val q = stream.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .selectExpr("window.start AS win_start", "event_type", "cnt")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      stream.addData(Seq(
        Event(1, ts(5), 1, "click", 1.0), Event(2, ts(20), 1, "click", 2.0)))
      q.processAllAvailable()
      stream.addData(Seq(Event(3, ts(300), 2, "view", 3.0))) // closes hour 0
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(out)
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
    assert(rows.contains(("2024-01-01 00:00:00.0", "click", 2L)), rows.mkString(", "))
  }

  test("file sink checkpoint RECOVERY: restart resumes offsets and state, no re-emit") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // VERDICT r9 item 4: the sibling test above proves the sink writes;
    // this one proves the checkpoint actually RECOVERS — the query is
    // stopped and a NEW query starts on the same checkpoint, so batch-1
    // offsets must not replay (no duplicate output) and the windowed
    // COUNT state must survive the restart (hour-0 count = both rows,
    // one from each side of the restart... both from batch 1 here, with
    // the window closed only after the restart).
    val base = java.nio.file.Files.createTempDirectory("graft_recover").toFile
    val out = new java.io.File(base, "out").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath
    val stream = MemoryStream[Event]
    def startQuery() = stream.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .selectExpr("window.start AS win_start", "event_type", "cnt")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = startQuery()
    try {
      stream.addData(Seq(
        Event(1, ts(5), 1, "click", 1.0), Event(2, ts(20), 1, "click", 2.0)))
      q1.processAllAvailable() // hour-0 window still open: nothing emitted
    } finally q1.stop()
    assert(!new java.io.File(out).list().exists(_.endsWith(".parquet")) ||
      spark.read.parquet(out).isEmpty, "open window must not have been emitted")
    val q2 = startQuery() // SAME checkpoint — must resume, not reprocess
    try {
      stream.addData(Seq(Event(3, ts(300), 2, "view", 3.0))) // closes hour 0
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = spark.read.parquet(out)
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
    // count 2 ⇒ pre-restart aggregate state recovered; exactly one row for
    // the window ⇒ batch-1 offsets were not replayed into the sink
    assert(rows.count(_._2 == "click") == 1, s"duplicate emit after restart: ${rows.mkString(", ")}")
    assert(rows.contains(("2024-01-01 00:00:00.0", "click", 2L)), rows.mkString(", "))
  }

  test("Trigger.AvailableNow drains what exists, self-terminates, resumes incrementally") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    implicit val sq = spark.sqlContext
    // the batch-ingest trigger (VERDICT r9 item 4): process everything
    // available, then stop — the shape a scheduled ingest job runs. Two
    // invocations over one checkpoint must be incremental (run 2 sees
    // only post-run-1 data) and stateful dedup must hold ACROSS runs.
    val base = java.nio.file.Files.createTempDirectory("graft_availnow").toFile
    val out = new java.io.File(base, "out").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath
    val stream = MemoryStream[Event]
    def runOnce(): Unit = {
      val q = StreamOps.dedupWithinWatermark(stream.toDF())
        .select("event_id", "user_id", "value")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
      assert(!q.isActive)
    }
    stream.addData(Seq(
      Event(1, ts(1), 1, "click", 1.0),
      Event(1, ts(1), 1, "click", 1.0), // in-batch duplicate
      Event(2, ts(2), 2, "view", 2.0)))
    runOnce()
    assert(spark.read.parquet(out).count() == 2, "run 1: dup must be dropped")
    stream.addData(Seq(
      Event(1, ts(3), 1, "click", 9.9), // duplicate of a RUN-1 key: state recovered
      Event(3, ts(4), 3, "click", 3.0)))
    runOnce()
    val got = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("user_id")).toSet
    assert(spark.read.parquet(out).count() == 3,
      "run 2 must add only the genuinely new row (cross-run dedup, no reprocess)")
    assert(got == Set(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("foreachBatch upsert sink: versioned merges, replay is a no-op") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_upsert").toFile
    val table = new java.io.File(base, "table").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath
    val stream = MemoryStream[Event]
    val q = StreamOps.upsertSink(
      stream.toDF().select(col("user_id"), col("event_id"), col("value")),
      table, "user_id", ckpt)
    try {
      // batch 0: users 1,2 — both inserted
      stream.addData(Seq(Event(10, ts(1), 1, "click", 1.0), Event(11, ts(2), 2, "click", 2.0)))
      q.processAllAvailable()
      // batch 1: user 2 updated twice in-batch (last writer 13 wins), user 3 inserted
      stream.addData(Seq(Event(12, ts(3), 2, "click", 9.0),
        Event(13, ts(4), 2, "click", 5.0), Event(14, ts(5), 3, "click", 3.0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = StreamOps.readTable(spark, table).collect()
      .map(r => r.getAs[Long]("user_id") -> (r.getAs[Long]("event_id"), r.getAs[Double]("value")))
      .toMap
    assert(got == Map(1L -> (10L, 1.0), 2L -> (13L, 5.0), 3L -> (14L, 3.0)), got.toString)
    // replaying an already-applied batch id IN THE SINK'S NAMESPACE must
    // not advance the version (the sink scopes its ledger by checkpoint —
    // out-of-band merges join it via checkpointQueryKey)
    val qk = StreamOps.checkpointQueryKey(ckpt)
    val before = java.nio.file.Files.readString(new java.io.File(table, "_latest").toPath).trim
    StreamOps.mergeBatch(
      Seq((2L, 99L, 42.0)).toDF("user_id", "event_id", "value"), table, "user_id", 1L,
      queryKey = qk)
    val after = java.nio.file.Files.readString(new java.io.File(table, "_latest").toPath).trim
    assert(before == after, "replayed batch id must be a no-op")
    assert(StreamOps.readTable(spark, table).filter(col("user_id") === 2L)
      .head().getAs[Double]("value") == 5.0)
    // a NEW batch id with the same rows does apply (at-least-once upstream)
    StreamOps.mergeBatch(
      Seq((2L, 99L, 42.0)).toDF("user_id", "event_id", "value"), table, "user_id", 2L,
      queryKey = qk)
    assert(StreamOps.readTable(spark, table).filter(col("user_id") === 2L)
      .head().getAs[Double]("value") == 42.0)
  }

  test("upsert sink restarted with a FRESH checkpoint still merges (ADVICE r15)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // foreachBatch ids restart at 0 under a new checkpointLocation; with a
    // ledger not scoped by checkpoint, every merge of the restarted stream
    // would silently no-op against the existing tableDir
    val base = java.nio.file.Files.createTempDirectory("graft_upsert_restart").toFile
    val table = new java.io.File(base, "table").getAbsolutePath
    val s1 = MemoryStream[Event]
    val q1 = StreamOps.upsertSink(
      s1.toDF().select(col("user_id"), col("event_id"), col("value")),
      table, "user_id", new java.io.File(base, "ckpt1").getAbsolutePath)
    try {
      s1.addData(Seq(Event(10, ts(1), 1, "click", 1.0)))
      q1.processAllAvailable()
    } finally q1.stop()
    // "operator reconfigured" restart: fresh checkpoint, batch ids from 0
    val s2 = MemoryStream[Event]
    val q2 = StreamOps.upsertSink(
      s2.toDF().select(col("user_id"), col("event_id"), col("value")),
      table, "user_id", new java.io.File(base, "ckpt2").getAbsolutePath)
    try {
      s2.addData(Seq(Event(20, ts(2), 1, "click", 7.0)))
      q2.processAllAvailable()
    } finally q2.stop()
    val v2 = StreamOps.readTable(spark, table).filter(col("user_id") === 1L)
      .head().getAs[Double]("value")
    assert(v2 == 7.0, s"restarted stream's batch 0 was no-op'd (value $v2)")
  }

  test("session_window groups match the q58 batch semantics on same rows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Event]
    val events = Seq(
      Event(1, ts(0), 1, "a", 0), Event(2, ts(10), 1, "a", 0),
      Event(3, ts(60), 1, "a", 0),
      Event(4, ts(5), 2, "a", 0))
    val rows = runBatches(stream, StreamOps.sessionWindows(stream.toDF()), "sw",
      Seq(events, Seq(Event(9, ts(600), 3, "z", 0)))) // advance watermark
    val perUser = rows.groupBy(_.getAs[Long]("user_id"))
      .map { case (u, rs) => u -> rs.length }
    assert(perUser(1L) == 2, s"user 1 sessions: $perUser") // {0,10} and {60}
    assert(perUser(2L) == 1)
  }

  test("q59 batch result equals streaming latestPerMinute on the same rows (§5.5 parity)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val sf = TestSpark.sfDir
    val usPerMinute = 60000000L
    // the REAL events table (10k rows at sf0.001), replayed through the
    // incremental engine: canonical µs event time (Tables.events) →
    // µs-precision Timestamp — same values q59 buckets in batch
    val evRows = Tables.events(spark, sf)
      .selectExpr("event_id", "ts_us", "user_id", "event_type", "value").collect()
    def usToTs(us: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    val events = evRows.map { r =>
      Event(r.getLong(0), usToTs(r.getLong(1)), r.getLong(2), r.getString(3), r.getDouble(4))
    }.toSeq
    // sentinel a day past the data: advances the watermark beyond every
    // real minute window so append mode emits them all; its own window
    // stays open and never reaches the sink (second sentinel batch makes
    // the advanced watermark take effect)
    val maxUs = evRows.map(_.getLong(1)).max
    val sentinel = Event(-1L, usToTs(maxUs + 86400000000L), -1L, "z", 0.0)
    val stream = MemoryStream[Event]
    val rows = runBatches(stream, StreamOps.latestPerMinute(stream.toDF()), "q59s",
      Seq(events, Seq(sentinel), Seq(sentinel.copy(event_id = -2))))
    val streamed = rows.filter(_.getAs[Long]("user_id") >= 0).map { r =>
      val startUs = r.getAs[Timestamp]("minute_start").getTime * 1000L
      (r.getAs[Long]("user_id"), startUs / usPerMinute, r.getAs[Long]("event_id"))
    }.toSet
    val batch = SparkEntry.queries("q59_stream_dedup_late")(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("minute_bucket"),
        r.getAs[Long]("event_id"))).toSet
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(5)}  batch-only: ${(batch -- streamed).take(5)}")
  }

  test("stream-stream interval join attributes purchases to prior-hour clicks") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = StreamOps.clickPurchaseAttribution(clicks.toDF(), purchases.toDF())
    val q = joined.writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try {
      // user 1: click at :05 and :50; purchase at :55 → joins both.
      // user 2: click at :00, purchase at 2h05 → outside the 1h window.
      clicks.addData(Seq(
        Event(11, ts(5), 1, "click", 0), Event(12, ts(50), 1, "click", 0),
        Event(21, ts(0), 2, "click", 0)))
      purchases.addData(Seq(
        Event(101, ts(55), 1, "purchase", 9.5), Event(201, ts(125), 2, "purchase", 1.0)))
      q.processAllAvailable()
      // advance both watermarks so state can be evicted and output flushed
      clicks.addData(Seq(Event(99, ts(600), 9, "click", 0)))
      purchases.addData(Seq(Event(98, ts(600), 9, "purchase", 0)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("attr").collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id")))
    assert(rows.toSet == Set((101L, 11L), (101L, 12L)), rows.mkString(", "))
  }

  test("LEFT OUTER stream-stream join emits organic purchases with NULL click") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = StreamOps.clickPurchaseAttribution(
      clicks.toDF(), purchases.toDF(), joinType = "leftOuter")
    val q = joined.writeStream.format("memory").queryName("attr_outer")
      .outputMode("append").start()
    try {
      // user 1's purchase has a click inside the hour; user 2's click is
      // 2h05 earlier → organic. The NULL row may only flush once the
      // watermark proves no matching click can still arrive.
      clicks.addData(Seq(Event(11, ts(50), 1, "click", 0), Event(21, ts(0), 2, "click", 0)))
      purchases.addData(Seq(
        Event(101, ts(55), 1, "purchase", 9.5), Event(201, ts(125), 2, "purchase", 1.0)))
      q.processAllAvailable()
      clicks.addData(Seq(Event(99, ts(600), 9, "click", 0)))
      purchases.addData(Seq(Event(98, ts(600), 9, "purchase", 0)))
      q.processAllAvailable()
      clicks.addData(Seq(Event(97, ts(1200), 9, "click", 0)))
      purchases.addData(Seq(Event(96, ts(1200), 9, "purchase", 0)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("attr_outer").collect()
      .map(r => (r.getAs[Long]("purchase_id"),
        if (r.isNullAt(r.fieldIndex("click_id"))) None else Some(r.getLong(1))))
    assert(rows.contains((101L, Some(11L))), rows.mkString(", "))
    assert(rows.contains((201L, None)),
      s"organic purchase missing its NULL-click outer row: ${rows.mkString(", ")}")
  }

  test("q250 batch conversion pairs ≡ stream-stream join on the same events") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // deterministic spread: 4 users × 6 clicks + 4 purchases over 4 hours
    val clickEvents = for (u <- 1L to 4L; i <- 0 until 6) yield
      Event(u * 1000 + i, ts(((i * 37 + u * 11) % 240).toInt), u, "click", 0.0)
    val purchaseEvents = for (u <- 1L to 4L; j <- 0 until 4) yield
      Event(u * 1000 + 500 + j, ts(((j * 53 + u * 17) % 240).toInt), u, "purchase", 1.0)

    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = StreamOps.clickPurchaseAttribution(clicks.toDF(), purchases.toDF())
    val q = joined.writeStream.format("memory").queryName("parity250")
      .outputMode("append").start()
    try {
      clicks.addData(clickEvents); purchases.addData(purchaseEvents)
      q.processAllAvailable()
      // sentinels push both watermarks past every real event so every
      // joinable pair is flushed to the append sink
      clicks.addData(Seq(Event(-1, ts(2000), 99, "click", 0.0)))
      purchases.addData(Seq(Event(-2, ts(2000), 99, "purchase", 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("parity250").collect()
      .filter(_.getAs[Long]("user_id") <= 4L)
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("click_id"),
        r.getAs[Long]("purchase_id"))).toSet

    // the q250 operator on the identical rows in batch form
    val ev = (clickEvents ++ purchaseEvents).toDF()
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("ts_us"))
    val batch = operators.TimeSeries.conversionPairsOf(ev, 3600000000L).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("click_id"),
        r.getAs[Long]("purchase_id"))).toSet

    assert(batch.nonEmpty, "degenerate parity fixture: no qualifying pairs")
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(5)}  batch-only: ${(batch -- streamed).take(5)}")
  }

  test("q262 batch abandonment ≡ streaming left-outer absence on the same events (r11)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // 4 users × 6 clicks + 4 purchases over 4 hours — same fixture shape
    // as the q250 parity; some clicks convert, some abandon
    val clickEvents = for (u <- 1L to 4L; i <- 0 until 6) yield
      Event(u * 1000 + i, ts(((i * 37 + u * 11) % 240).toInt), u, "click", 0.0)
    val purchaseEvents = for (u <- 1L to 4L; j <- 0 until 4) yield
      Event(u * 1000 + 500 + j, ts(((j * 53 + u * 17) % 240).toInt), u, "purchase", 1.0)
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = StreamOps.clickAbandonment(clicks.toDF(), purchases.toDF())
    val q = joined.writeStream.format("memory").queryName("abandon262")
      .outputMode("append").start()
    try {
      clicks.addData(clickEvents); purchases.addData(purchaseEvents)
      q.processAllAvailable()
      // sentinels: push both watermarks past every real event so every
      // click's verdict (matched rows or the NULL-purchase row) flushes
      clicks.addData(Seq(Event(-1, ts(2000), 99, "click", 0.0)))
      purchases.addData(Seq(Event(-2, ts(2000), 99, "purchase", 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    // streamed per-click verdict → per-user rollup (converted = any
    // non-NULL purchase row for that click)
    val perClick = spark.table("abandon262").collect()
      .filter(_.getAs[Long]("user_id") <= 4L)
      .groupBy(r => (r.getAs[Long]("user_id"), r.getAs[Long]("click_id")))
      .toSeq // BEFORE the map — mapping the Map to (u, bool) would re-key by u
      .map { case ((u, _), rows) =>
        (u, rows.exists(r => !r.isNullAt(r.fieldIndex("purchase_id")))) }
    val streamed = perClick.groupBy(_._1).map { case (u, vs) =>
      (u, vs.size.toLong, vs.count(_._2).toLong) }.toSet
    // batch q262 core on the identical rows
    val ev = (clickEvents ++ purchaseEvents).filter(_.user_id <= 4L).toDF()
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("ts_us"))
    val batch = operators.TimeSeries.abandonmentOf(ev, 3600000000L).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_clicks"),
        r.getAs[Long]("n_converted"))).toSet
    assert(batch.exists(t => t._2 != t._3),
      "degenerate fixture: every click converted — absence never exercised")
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(5)}  batch-only: ${(batch -- streamed).take(5)}")
  }

  test("event-time timers: idle alert fires once the watermark passes, slides on activity") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val s = MemoryStream[Event]
      val q = StreamOps.idleAlerts(s.toDS(), idleMinutes = 30).toDF().writeStream
        .format("memory").queryName("idle").outputMode("append").start()
      try {
        // user 1 active at :00 and :20 (timer slides to :50); user 2 only
        // at :00 (timer at :30)
        s.addData(Seq(Event(1, ts(0), 1, "click", 0), Event(2, ts(0), 2, "click", 0)))
        q.processAllAvailable()
        s.addData(Seq(Event(3, ts(20), 1, "click", 0)))
        q.processAllAvailable()
        // watermark to :35 (45 − 10 delay): only user 2's :30 timer fires
        s.addData(Seq(Event(90, ts(45), 9, "view", 0)))
        q.processAllAvailable()
        val afterFirst = spark.table("idle").collect().map(_.getLong(0)).toSet
        assert(afterFirst == Set(2L, 9L) || afterFirst == Set(2L),
          s"only user 2 (and possibly 9) may be idle yet: $afterFirst")
        assert(afterFirst.contains(2L), "user 2's un-slid timer must have fired")
        // watermark far forward: user 1's slid timer (:50) now fires too
        s.addData(Seq(Event(91, ts(300), 8, "view", 0)))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("idle").collect()
        .map(r => r.getLong(0) -> r.getAs[Long]("last_seen_ms")).toMap
      assert(got(2L) == ts(0).getTime, s"user 2 last seen at :00, got $got")
      assert(got(1L) == ts(20).getTime,
        s"user 1's alert must reflect the SLID last-seen (:20), got $got")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState running spend keeps per-user state across batches (RocksDB)") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    implicit val sq = spark.sqlContext
    // the new-API operator ONLY supports the RocksDB provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val s = MemoryStream[Event]
      val q = StreamOps.runningSpend(s.toDS()).toDF().writeStream
        .format("memory").queryName("spend").outputMode("append").start()
      try {
        s.addData(Seq(
          Event(1, ts(1), 1, "purchase", 10.0), Event(2, ts(2), 1, "purchase", 5.0),
          Event(3, ts(1), 2, "purchase", 7.0), Event(4, ts(3), 2, "view", 99.0)))
        q.processAllAvailable()
        // batch 2 must RESUME user 1's total from state (15 → 16.5)
        s.addData(Seq(Event(5, ts(9), 1, "purchase", 1.5)))
        q.processAllAvailable()
        val sop = q.lastProgress.stateOperators
        assert(sop.nonEmpty && sop.exists(o =>
          o.operatorName.toLowerCase.contains("transformwithstate")),
          s"transformWithState operator missing: ${sop.map(_.operatorName).mkString}")
      } finally q.stop()
      val got = spark.table("spend").collect()
        .map(r => r.getAs[Long]("event_id") ->
          ((r.getAs[Double]("total_spend"), r.getAs[Long]("n_purchases")))).toMap
      assert(got == Map(
        1L -> ((10.0, 1L)), 2L -> ((15.0, 2L)),
        3L -> ((7.0, 1L)), 5L -> ((16.5, 3L))), got.toString)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming trending items honor the Misra-Gries bounds across batches (RocksDB)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val k = 4
      // a skewed stream on ONE shard: "hot" dominates, long tail churns
      // the summary's decrement path across both batches
      val b1 = Seq.fill(30)("hot") ++ Seq("a", "b", "c", "d", "e", "hot2", "hot2")
      val b2 = Seq.fill(20)("hot") ++ Seq("f", "g", "h", "hot2", "hot2", "hot2")
      val s = MemoryStream[(Long, String)]
      val q = graft.streaming.StreamOps.trendingItems(s.toDS(), k)
        .toDF().writeStream.format("memory").queryName("trend")
        .outputMode("append").start()
      try {
        s.addData(b1.map((0L, _))); q.processAllAvailable()
        s.addData(b2.map((0L, _))); q.processAllAvailable()
      } finally q.stop()
      val last = spark.table("trend").collect().maxBy(_.getAs[Long]("n_items"))
      val n = last.getAs[Long]("n_items")
      val all = b1 ++ b2
      assert(n == all.length)
      val exact = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val est = last.getSeq[String](2).zip(last.getSeq[Long](3)).toMap
      // the arrival-order-independent MG contract: no overcount, total
      // undercount ≤ n/(k+1); the dominant item must therefore survive
      est.foreach { case (w, e) =>
        val f = exact.getOrElse(w, 0L)
        assert(e <= f, s"$w overcounted: $e > $f")
        assert(f - e <= n / (k + 1), s"$w undercount ${f - e} > n/(k+1)")
      }
      assert(est.contains("hot"), "dominant item evicted from the summary")
      assert(est("hot") >= exact("hot") - n / (k + 1))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming Count-Min state equals one batch sketch of all arrivals (RocksDB)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val (depth, width) = (4, 64)
      val b1 = Seq("join", "join", "scan", "row", "join")
      val b2 = Seq("scan", "vector", "join", "row")
      def sharded(xs: Seq[String]) = xs.map(w => (math.abs(w.hashCode % 2).toLong, w))
      val s = MemoryStream[(Long, String)]
      val q = graft.streaming.StreamOps.streamingSketch(s.toDS(), depth, width)
        .toDF().writeStream.format("memory").queryName("cmstream")
        .outputMode("append").start()
      try {
        s.addData(sharded(b1)); q.processAllAvailable()
        s.addData(sharded(b2)); q.processAllAvailable()
      } finally q.stop()
      // LAST snapshot per shard = final state; shard sketches merge by
      // element-wise sum (the SketchSuite identity) into the global one
      val snaps = spark.table("cmstream").collect()
        .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_items"),
          r.getSeq[Long](2).toArray))
      val finalPerShard = snaps.groupBy(_._1).map { case (_, xs) => xs.maxBy(_._2) }
      val merged = finalPerShard.map(_._3)
        .reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
      // one-shot batch sketch over the union of all arrivals
      val cm = new functions.CountMin(depth, width)
      val whole = (b1 ++ b2).foldLeft(cm.zero)(cm.reduce)
      assert(java.util.Arrays.equals(merged, whole),
        "streaming state must be bit-identical to the batch sketch")
      assert(finalPerShard.map(_._2).sum == (b1 ++ b2).length)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("trailing 10-min window: batch RANGE frame ≡ transformWithState stream, watermark evicts (r14)") {
    // VERDICT r14 item 4: q103's trailing RANGE-frame semantics on the
    // real incremental engine — ListState buffer per user, RocksDB
    // provider, watermark-driven eviction, batch≡stream asserted.
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // per-user distinct minutes (RANGE peers can't cross batches);
      // values are multiples of 0.25 so any summation order is exact.
      // Batch 1 reaches minute 25 → watermark 15 → entries below
      // 15−10 = 5 min are evictable when batch 2 processes.
      val b1 = Seq(
        Event(10, ts(0), 1, "click", 0.25), Event(11, ts(3), 1, "view", 1.5),
        Event(12, ts(7), 1, "click", 0.75), Event(13, ts(12), 1, "view", 2.0),
        Event(14, ts(25), 1, "click", 0.5),
        Event(20, ts(2), 2, "click", 4.25), Event(21, ts(9), 2, "view", 1.25))
      val b2 = Seq(
        Event(15, ts(30), 1, "view", 3.25), Event(16, ts(33), 1, "click", 0.25),
        Event(22, ts(31), 2, "click", 2.5))
      val s = MemoryStream[Event]
      val q = StreamOps.trailingWindowStats(s.toDS(), windowMinutes = 10).toDF()
        .writeStream.format("memory").queryName("trail103")
        .outputMode("append").start()
      try {
        s.addData(b1); q.processAllAvailable()
        s.addData(b2); q.processAllAvailable()
        val sop = q.lastProgress.stateOperators
        assert(sop.exists(_.operatorName.toLowerCase.contains("transformwithstate")),
          s"transformWithState missing: ${sop.map(_.operatorName).mkString}")
      } finally q.stop()
      val got = spark.table("trail103").collect()
        .map(r => r.getAs[Long]("event_id") ->
          ((r.getAs[Long]("n_10min"), r.getAs[Double]("sum_10min")))).toMap
      // batch twin: the EXACT q103 frame over the union of both batches
      val batch = (b1 ++ b2).toDF()
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(ts)").as("ts_us"), col("value"))
        .select(col("event_id"),
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy("ts_us")
            .rangeBetween(-600000000L, 0)).as("n_10min"),
          sum("value").over(org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy("ts_us")
            .rangeBetween(-600000000L, 0)).as("sum_10min"))
        .collect()
        .map(r => r.getAs[Long]("event_id") ->
          ((r.getAs[Long]("n_10min"), r.getAs[Double]("sum_10min")))).toMap
      assert(got == batch,
        s"stream≠batch: ${(got.toSet -- batch.toSet).take(5)} vs ${(batch.toSet -- got.toSet).take(5)}")
      // watermark eviction PROVEN from the artifact: when event 16
      // (user 1, minute 33) was processed, entries at minutes 0 and 3
      // (< watermark 15 − window 10 = 5) must be gone from state —
      // buffer holds exactly {7, 12, 25, 30, 33}
      val nBuf = spark.table("trail103").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n_buffered")).toMap
      assert(nBuf(16L) == 5L,
        s"expected 5 buffered after eviction (0,3 gone), got ${nBuf(16L)}")
      // and within batch 1 (watermark still 0) nothing was evicted
      assert(nBuf(14L) == 5L, s"batch-1 buffer must hold all 5: ${nBuf(14L)}")
      // invariant no batch RANGE frame can violate, guarded against the
      // admission/eviction watermark gap (emission reads the
      // PRE-eviction union): every event counts at least itself
      spark.table("trail103").collect().foreach { r =>
        assert(r.getAs[Long]("n_10min") >= 1L,
          s"event ${r.getAs[Long]("event_id")}: trailing window lost its own row")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("sliding distinct: batch q108 core ≡ streamed emit-on-close finals (RocksDB, timers)") {
    // the second half of VERDICT r14 item 4: q108's trailing-6-bucket
    // distinct-user counts as per-window MapState finalized by an
    // event-time timer when the watermark closes the window.
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // users 1-3 active across buckets 0..3 (minutes 0..39), overlapping
      // windows genuinely slide (some windows see 3 users, some 1)
      val real = Seq(
        Event(1, ts(1), 1, "click", 0), Event(2, ts(11), 1, "click", 0),
        Event(3, ts(12), 2, "view", 0), Event(4, ts(25), 2, "click", 0),
        Event(5, ts(31), 3, "view", 0), Event(6, ts(38), 1, "click", 0))
      val s = MemoryStream[Event]
      val q = StreamOps.slidingDistinctStream(s.toDS(),
          bucketMinutes = 10, windowBuckets = 6).toDF()
        .writeStream.format("memory").queryName("slide108")
        .outputMode("append").start()
      try {
        s.addData(real.take(4)); q.processAllAvailable()
        s.addData(real.drop(4)); q.processAllAvailable()
        // sentinel far forward: watermark passes every real window close
        s.addData(Seq(Event(99, ts(3000), 9, "view", 0)))
        q.processAllAvailable()
        val sop = q.lastProgress.stateOperators
        assert(sop.exists(_.operatorName.toLowerCase.contains("transformwithstate")))
      } finally q.stop()
      val maxRealWb = real.map(_.ts.getTime * 1000 / 600000000L).max + 5
      val streamed = spark.table("slide108").collect()
        .map(r => r.getAs[Long]("wb") -> r.getAs[Long]("active"))
        .filter(_._1 <= maxRealWb).toMap
      // batch twin: the exact q108 core over the same real events
      val batch = operators.TimeSeries.slidingDistinctOf(
          real.toDF().select(col("user_id").as("key"),
            expr("unix_micros(ts) DIV 600000000").as("bkt")),
          windowBuckets = 6)
        .collect().map(r => r.getAs[Long]("wb") -> r.getAs[Long]("active")).toMap
      assert(batch.values.toSet.size > 1,
        s"degenerate fixture: every window saw the same count: $batch")
      assert(streamed == batch,
        s"stream-only: ${(streamed.toSet -- batch.toSet).take(5)} " +
          s"batch-only: ${(batch.toSet -- streamed.toSet).take(5)}")
      // emit-on-close means each window appears EXACTLY once
      val wbs = spark.table("slide108").collect().map(_.getAs[Long]("wb"))
      assert(wbs.distinct.length == wbs.length, "a window finalized twice")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
