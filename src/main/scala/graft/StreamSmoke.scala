package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end streaming smoke for the round gate (VERDICT r16 item 7):
  * replays the REAL events table through the trailing-window
  * StatefulProcessor and the idempotent upsert sink — the two streaming
  * paths the suites verify on synthetic MemoryStreams but the driver
  * gate never executed — WITH a mid-stream restart: the stream runs on
  * half the data (split at the median event time so per-user event-time
  * order and same-ts peers are preserved across the restart, per the
  * parity contract in `TrailingWindowProcessor`), the query STOPS, a
  * new query resumes from the same checkpoint over the second half, and
  * the final upsert table must equal the batch q103 RANGE frame over
  * the whole table. Exit 0 + one JSON line on success; nonzero on any
  * divergence.
  *
  * {{{ sbt -batch "runMain graft.StreamSmoke /root/testdata/sf0.01" }}} */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the transformWithState API requires the RocksDB provider
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft_stream_smoke").toFile
    val inDir = new java.io.File(base, "in"); inDir.mkdirs()
    val ckpt = new java.io.File(base, "ckpt").toString
    val outDir = new java.io.File(base, "table").toString

    // Event-shaped rows from the real table (µs-exact timestamps via
    // the Tables.events canonical ts_us), split at the median ts: all
    // rows with ts_us <= cut arrive before the restart, the rest after —
    // same-ts peers can never straddle it.
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .localCheckpoint(true)
    val cut = ev.select(expr("percentile_approx(unix_micros(ts), 0.5, 10000)"))
      .head().getLong(0)
    val nTotal = ev.count()

    def stage(half: org.apache.spark.sql.DataFrame, tag: String): Unit =
      half.coalesce(1).write.parquet(new java.io.File(inDir, tag).toString)

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(ev.schema)
        .option("recursiveFileLookup", "true")
        .parquet(inDir.toString)
        .as[graft.streaming.Event]
      val stats = graft.streaming.StreamOps.trailingWindowStats(stream)
      val q = graft.streaming.StreamOps.upsertSink(
        stats.toDF(), outDir, keyCol = "event_id",
        checkpointDir = ckpt, versionCol = "event_id")
      // AvailableNow semantics via manual drain: process what exists,
      // then stop — the second invocation resumes from the checkpoint
      q.processAllAvailable()
      q.stop()
      q.awaitTermination()
    }

    stage(ev.filter(unix_micros(col("ts")) <= cut), "half1")
    runOnce() // pre-restart
    stage(ev.filter(unix_micros(col("ts")) > cut), "half2")
    runOnce() // RESUMED from the same checkpoint — the restart under test

    // batch twin: the q103 trailing RANGE frame over the whole table
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us").rangeBetween(-600000000L, 0)
    val expect = ev
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .select(col("event_id"), count(lit(1)).over(w).as("n_10min"),
        sum("value").over(w).as("sum_10min"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val got = graft.streaming.StreamOps.readTable(spark, outDir)
      .select("event_id", "n_10min", "sum_10min")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    val missing = expect.keySet -- got.keySet
    val extra = got.keySet -- expect.keySet
    val diverged = expect.collect {
      case (id, (n, s)) if got.get(id).exists { case (gn, gs) =>
        gn != n || math.abs(gs - s) > 1e-9 } => id
    }
    val ok = missing.isEmpty && extra.isEmpty && diverged.isEmpty
    println(s"""{"metric":"stream_smoke","events":$nTotal,"restarts":1,""" +
      s""""missing":${missing.size},"extra":${extra.size},"diverged":${diverged.size},"match":$ok}""")
    if (!ok) {
      System.err.println(s"[smoke] missing=${missing.take(5)} extra=${extra.take(5)} diverged=${diverged.take(5)}")
      spark.stop(); sys.exit(1)
    }
    import scala.sys.process._
    Seq("rm", "-rf", base.toString).!
    spark.stop()
  }
}
