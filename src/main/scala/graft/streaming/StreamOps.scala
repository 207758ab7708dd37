package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.jdk.CollectionConverters._

/** One event on the stream — mirrors the batch `events` table with event
  * time as a proper TimestampType (µs), which is what Structured
  * Streaming's watermark machinery operates on. */
case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** Event-time µs extraction done RIGHT (r15 review): Timestamp.getTime
  * returns MILLISECONDS, so the old `getTime * 1000` zeroed the sub-ms
  * component of µs-precision event times — a trailing window could then
  * include an event the batch `unix_micros` frame excludes (two events
  * 600000000+500 µs apart truncate to exactly the window span). The
  * microsecond remainder lives in getNanos (which also re-contains the
  * ms part getTime already carries — hence the mod). */
object EventMicros {
  def of(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
}

/** Session state for [[StreamOps.sessionize]]. */
case class SessionInfo(sessionId: Long, lastTs: Long)
case class SessionAssignment(user_id: Long, event_id: Long, session_id: Long)

/** Carried observation for [[StreamOps.locf]] (`has=false` until the
  * key's first real observation arrives). */
case class LocfCarry(lastV: Double, has: Boolean)
case class LocfFill(user_id: Long, event_id: Long, v_filled: Option[Double])

/** Last-seen event type for [[StreamOps.transitions]] (empty `lastType`
  * until the key's first event arrives). */
case class TransCarry(lastType: String, has: Boolean)
case class Transition(user_id: Long, step_a: String, step_b: String)

/** Trailing click buffer for [[StreamOps.linearAttribution]]: the click
  * event times (µs) still inside the 1-hour credit window. */
case class ClickWindow(clicksUs: List[Long])
case class LinearCredit(
    user_id: Long,
    event_id: Long,
    ts_us: Long,
    n_touches: Long,
    credit_each: Option[Double],
    organic: Boolean)

/** Running per-user spend for [[StreamOps.runningSpend]]. */
case class SpendState(total: Double, n: Long)
case class SpendUpdate(user_id: Long, event_id: Long, total_spend: Double,
    n_purchases: Long)

/** The Spark-4 `transformWithState` form of keyed running state — the
  * modern replacement for [[StreamOps.sessionize]]'s
  * flatMapGroupsWithState: explicit named state handles
  * (ValueState/ListState/MapState), per-state TTL, and event-time
  * timers, all backed by the RocksDB provider. This processor keeps ONE
  * ValueState[SpendState] per user and emits the cumulative purchase
  * total/count after every purchase event — the canonical running
  * aggregate with per-key state.
  *
  * Determinism: micro-batch input order is not guaranteed, so rows are
  * sorted by (event-time, event_id) before folding (the sessionize
  * convention). Scale: state is one 16-byte struct per user in the
  * RocksDB store; pass a TTLConfig to expire idle users instead of
  * growing forever (NONE here so the suite's totals are exact). */
class SpendProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, Event, SpendUpdate] {
  import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig}
  @transient private var st: org.apache.spark.sql.streaming.ValueState[SpendState] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[SpendState]("spend",
      org.apache.spark.sql.Encoders.product[SpendState], TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[Event],
      tv: TimerValues): Iterator[SpendUpdate] = {
    var cur = if (st.exists()) st.get() else SpendState(0.0, 0L)
    val out = rows.toSeq.sortBy(e => (EventMicros.of(e.ts), e.event_id)).map { e =>
      cur = SpendState(cur.total + e.value, cur.n + 1)
      SpendUpdate(key, e.event_id, cur.total, cur.n)
    }
    st.update(cur)
    out.iterator
  }
}

/** Per-shard sketch snapshot for [[StreamOps.streamingSketch]]. */
case class SketchSnapshot(shard: Long, n_items: Long, cells: Array[Long])

/** [[SketchProcessor]]'s RocksDB state record (top-level: Spark cannot
  * derive an Encoder for a processor-inner class). */
case class CmState(n: Long, cells: Array[Long])

/** Count–Min sketch AS STREAMING STATE — the incremental form of q233:
  * one ValueState[Array[Long]] of depth×width cells per shard, updated
  * with every arriving item, snapshot emitted after each batch. Because
  * CM reduce/merge are exact integer sums (order-insensitive on any
  * merge tree — SketchSuite's identity), the streaming fold over ANY
  * batch arrival order lands on the SAME cells as one batch aggregation
  * of the whole stream — the suite asserts bit-equality against
  * `functions.CountMin` on the union of all batches. That is the
  * mergeable-summary contract doing real work: sketch-in-state-store
  * gives frequency estimates over an unbounded stream in constant
  * memory, restart-safe under RocksDB.
  *
  * Sharding: the caller keys items to shards (hash mod S) so state
  * updates parallelize; shard sketches element-wise-sum into the global
  * one (the same merge the suite proves). */
class SketchProcessor(depth: Int, width: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, String), SketchSnapshot] {
  import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig}
  @transient private var st: org.apache.spark.sql.streaming.ValueState[CmState] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[CmState]("cm",
      org.apache.spark.sql.Encoders.product[CmState], TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
      tv: TimerValues): Iterator[SketchSnapshot] = {
    val cur = if (st.exists()) st.get() else CmState(0L, new Array[Long](depth * width))
    var n = cur.n
    val cells = cur.cells.clone()
    rows.foreach { case (_, v) =>
      if (v != null) {
        val pos = graft.functions.CountMin.positions(v, depth, width)
        var i = 0
        while (i < depth) { cells(i * width + pos(i)) += 1L; i += 1 }
        n += 1L
      }
    }
    st.update(CmState(n, cells))
    Iterator.single(SketchSnapshot(key, n, cells))
  }
}

/** Per-shard heavy-hitter snapshot for [[StreamOps.trendingItems]]. */
case class TrendSnapshot(shard: Long, n_items: Long,
    words: Array[String], estimates: Array[Long])

/** [[TrendProcessor]]'s state record (top-level for Encoder derivation,
  * the CmState convention). */
case class MgState(n: Long, words: Array[String], counts: Array[Long])

/** Misra–Gries heavy hitters AS STREAMING STATE — "trending items"
  * without ever counting the full item universe: one k-bounded summary
  * per shard in RocksDB, folded forward with each batch, snapshot
  * emitted after every batch. Unlike the Count–Min cells
  * ([[SketchProcessor]]), the MG summary's decrement step makes the
  * kept SET depend on arrival order — which is exactly why the suite
  * asserts the one thing arrival order cannot change: the MG error
  * contract f − n/(k+1) ≤ est ≤ f against exact counts of everything
  * that arrived (the telescoping per-fold bound in the
  * [[graft.functions.MisraGries]] class doc applies verbatim to
  * batch-by-batch folding — each fold is just more reduce steps).
  *
  * Scale: state is O(k) per shard regardless of stream length; the
  * trending question ("what is hot NOW") usually composes this with a
  * TTL or windowed restart so old mass ages out — TTLConfig is the
  * knob, NONE here so the suite's bounds are exact. */
class TrendProcessor(k: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, String), TrendSnapshot] {
  import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig}
  @transient private var st: org.apache.spark.sql.streaming.ValueState[MgState] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[MgState]("mg",
      org.apache.spark.sql.Encoders.product[MgState], TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
      tv: TimerValues): Iterator[TrendSnapshot] = {
    val mg = new graft.functions.MisraGries(k)
    val cur = if (st.exists()) st.get() else MgState(0L, Array.empty, Array.empty)
    var n = cur.n
    val summary = scala.collection.mutable.HashMap(cur.words.zip(cur.counts): _*)
    rows.foreach { case (_, v) =>
      if (v != null) { mg.reduce(summary, v); n += 1L }
    }
    val sorted = summary.toSeq.sortBy { case (w, c) => (-c, w) }
    val words = sorted.map(_._1).toArray
    val counts = sorted.map(_._2).toArray
    st.update(MgState(n, words, counts))
    Iterator.single(TrendSnapshot(key, n, words, counts))
  }
}

/** One buffered observation for [[TrailingWindowProcessor]] (top-level
  * for Encoder derivation, the CmState convention). */
case class TrailEntry(ts_us: Long, value: Double)

/** Per-event trailing-window stats for [[StreamOps.trailingWindowStats]].
  * `n_buffered` is the post-eviction state size — the field the suite
  * reads to PROVE watermark eviction from the output artifact alone. */
case class TrailStat(user_id: Long, event_id: Long, ts_us: Long,
    n_10min: Long, sum_10min: Double, n_buffered: Long)

/** The streaming face of q103's trailing RANGE frame (VERDICT r14
  * item 4): per user, every event is annotated with the count and value
  * sum of that user's events in the trailing `windowUs` window
  * [ts − windowUs, ts] — event-time semantics on the incremental
  * engine, where a batch RANGE frame sees the whole partition but a
  * stream must BUFFER exactly the suffix that future rows can still
  * reference. One ListState[TrailEntry] per user holds that suffix;
  * each batch folds its (event-time, event_id)-sorted rows in, emits
  * one TrailStat per input row computed over buffered ∪ batch entries
  * with the same inclusive ts filter as the batch frame, then evicts
  * every entry older than watermark − windowUs — no future event can
  * reference those (on-time events have ts ≥ watermark), so state is
  * bounded by (window span × per-user event rate), not history.
  *
  * Parity contract (StreamingSuite's batch≡stream twin): equal to the
  * batch `Window.rangeBetween(-windowUs, 0)` on the same rows whenever
  * arrival respects the watermark (per-user cross-batch event-time
  * order; same-ts peers delivered in one batch — RANGE peers are the
  * one thing a stream cannot see across batches). */
class TrailingWindowProcessor(windowUs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Event, TrailStat] {
  import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig}
  @transient private var buf: org.apache.spark.sql.streaming.ListState[TrailEntry] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    buf = getHandle.getListState[TrailEntry]("trail",
      org.apache.spark.sql.Encoders.product[TrailEntry], TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[Event],
      tv: TimerValues): Iterator[TrailStat] = {
    val evictBelow = tv.getCurrentWatermarkInMs() * 1000L - windowUs
    val incoming = rows.toSeq.sortBy(e => (EventMicros.of(e.ts), e.event_id))
    // emission reads the PRE-eviction union: the engine admits rows by
    // the PREVIOUS batch's watermark while this batch's eviction uses
    // the CURRENT one, so an admitted row between the two could
    // otherwise be emitted against an already-shrunk buffer — down to
    // n_10min = 0, an output the batch frame can never produce (a
    // trailing window always contains its own row). Such late-admitted
    // rows get best-effort stats over everything still held; on-time
    // rows are unaffected (their window is entirely >= evictBelow).
    val union = (buf.get().toSeq ++ incoming.map(e =>
      TrailEntry(EventMicros.of(e.ts), e.value)))
      .sortBy(_.ts_us) // fixed fold order: deterministic double sums
      .toArray
    val kept = union.count(_.ts_us >= evictBelow) // suffix length (sorted)
    buf.clear()
    if (kept > 0) buf.appendList(union.takeRight(kept))
    // window bounds via two MONOTONE pointers over the sorted union
    // (incoming is ts-sorted, so both bounds only ever advance): a
    // backfill batch costs O(S + B + Σ window) instead of the previous
    // O(B·(S+B)) full-union filter per row (r15 review). Each window's
    // sum is still a fresh ascending-order fold over its slice — the
    // same additions in the same order as the filter form, so
    // determinism and the suite's parity are byte-identical.
    var lo = 0
    var hi = 0
    val out = incoming.map { e =>
      val ts = EventMicros.of(e.ts)
      while (hi < union.length && union(hi).ts_us <= ts) hi += 1
      while (lo < union.length && union(lo).ts_us < ts - windowUs) lo += 1
      var s = 0.0
      var i = lo
      while (i < hi) { s += union(i).value; i += 1 }
      TrailStat(key, e.event_id, ts, (hi - lo).toLong, s, kept.toLong)
    }
    out.iterator
  }
}

/** One exploded window contribution for [[SlidingDistinctProcessor]]
  * (the q108 contribute-then-count discipline: an event at bucket b is
  * a contributor to windows [b, b+W-1]; no window ever rescans). */
case class Contribution(ts: java.sql.Timestamp, user_id: Long, wb: Long)

/** Finalized sliding-distinct window for
  * [[StreamOps.slidingDistinctStream]]. */
case class ActiveWindow(wb: Long, active: Long)

/** q108's sliding-distinct counting on the incremental engine (the
  * second half of VERDICT r14 item 4's "RANGE-frame / sliding-distinct
  * analogs"): distinct active users over the trailing W buckets per
  * window bucket, emitted ON CLOSE. Keyed by window bucket; one
  * MapState[user, unit] per OPEN window holds its distinct set (the
  * q108 contribute-then-count shape — each event feeds its W windows,
  * no window rescans history); ONE event-time timer per window fires
  * when the watermark passes the window's last on-time instant (every
  * contributor to wb has bkt ≤ wb, so ts < (wb+1)·bucket), emits the
  * FINAL count once, and clears the state — append-mode finalization,
  * the same emit-on-close contract as a watermarked windowed agg, but
  * with the distinct set as explicit state.
  *
  * Scale: state = one (user) map entry per active (window, user) pair,
  * bounded by window span × active users, evicted wholesale at close;
  * the ×W contribution fan-out is narrow rows (the batch q108 pays the
  * same explode). */
class SlidingDistinctProcessor(bucketMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Contribution, ActiveWindow] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig}
  @transient private var seen: org.apache.spark.sql.streaming.MapState[Long, Boolean] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getMapState[Long, Boolean]("seen",
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaBoolean, TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[Contribution],
      tv: TimerValues): Iterator[ActiveWindow] = {
    rows.foreach(c => seen.updateValue(c.user_id, true))
    if (!getHandle.listTimers().hasNext)
      getHandle.registerTimer((key + 1) * bucketMs)
    Iterator.empty
  }
  override def handleExpiredTimer(key: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[ActiveWindow] = {
    val n = seen.keys().size.toLong
    seen.clear()
    Iterator.single(ActiveWindow(key, n))
  }
}

/** Idle-user alert for [[StreamOps.idleAlerts]]. */
case class IdleAlert(user_id: Long, last_seen_ms: Long, idle_at_ms: Long)

/** Event-time TIMERS on the transformWithState API: one ValueState
  * (last-seen event time) per user plus one registered timer at
  * last-seen + idle window. New activity slides the timer forward
  * (delete + re-register); when the WATERMARK passes an un-slid timer,
  * [[handleExpiredTimer]] fires exactly once, emits the alert, and
  * clears the state — the inactivity-detection shape (cart
  * abandonment, session close, heartbeat loss) that pure
  * watermarked aggregation cannot express because the OUTPUT row
  * corresponds to the ABSENCE of input.
  *
  * Scale: state = 8 bytes + one timer per active user, both evicted on
  * expiry; the timer queue is watermark-driven, so cost scales with
  * the ACTIVE key set, not history. */
class IdleAlertProcessor(idleMs: Long) extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, Event, IdleAlert] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig}
  @transient private var seen: org.apache.spark.sql.streaming.ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getValueState[Long]("seen",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[Event],
      tv: TimerValues): Iterator[IdleAlert] = {
    val maxTs = rows.map(_.ts.getTime).max
    val last = if (seen.exists()) math.max(seen.get(), maxTs) else maxTs
    seen.update(last)
    getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
    getHandle.registerTimer(last + idleMs)
    Iterator.empty
  }
  override def handleExpiredTimer(key: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[IdleAlert] = {
    val last = seen.get()
    seen.clear()
    Iterator.single(IdleAlert(key, last, info.getExpiryTimeInMs))
  }
}

/** True Structured Streaming operators (SURVEY.md §2.8 "true streaming"):
  * the same tumbling/sliding/session/dedup semantics that q56–q59 prove
  * against the DuckDB oracle in batch, here running on the incremental
  * engine with watermarks and state. Exercised by StreamingSuite via
  * MemoryStream; a production caller swaps in `spark.readStream` sources.
  *
  * Scale notes: watermark + append mode bound state by (watermark window ×
  * key cardinality); sessionize keeps one small struct per active user —
  * with high-cardinality users configure the RocksDB state store
  * (`spark.sql.streaming.stateStore.providerClass`) and the watermark
  * evicts idle users via state timeout.
  */
object StreamOps {

  /** Tumbling 1-hour count+sum per event type; late rows beyond the
    * 10-minute watermark are dropped by the engine. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))

  /** Sliding 1-hour window every 15 minutes. */
  def slidingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))

  /** Built-in session windows with a 30-minute gap. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))

  /** Stateful dedup: first event per (user_id, event_id) within the
    * watermark — the streaming counterpart of q59's batch shape. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("user_id", "event_id")

  /** TTL'd dedup via the Spark 4 `dropDuplicatesWithinWatermark` API:
    * duplicates of a key are dropped only while the key's state is
    * younger than the watermark delay, after which the state is EVICTED
    * and a re-emission of the same key passes through. This is the
    * production-ingest dedup for UNBOUNDED key domains: plain
    * `dropDuplicates` on non-event-time keys accumulates state forever
    * (every key ever seen), while this variant bounds state to the keys
    * active inside one watermark horizon — the at-least-once-source
    * dedup window a 100 TB/day feed actually needs. */
  def dedupTtl(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_id")

  /** EXACTLY q59's batch semantics on the incremental engine: the latest
    * event (max by (ts, event_id)) per (user_id, minute bucket), emitted
    * once the watermark closes the minute. `dropDuplicates` can't express
    * "latest" (it keeps the FIRST arrival); a windowed `max_by` can — and
    * in append mode the row that emerges per closed window is the same
    * row q59's row_number window picks in batch, which StreamingSuite
    * asserts on the real `events` table rows (§5.5 batch≡stream parity). */
  def latestPerMinute(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("user_id"))
      .agg(max_by(
        struct(col("event_id"), col("ts")),
        struct(col("ts"), col("event_id"))).as("last"))
      .select(col("user_id"), col("window.start").as("minute_start"),
        col("last.event_id").as("event_id"), col("last.ts").as("ts"))

  /** Stream–static join (q180's incremental form): enrich the event
    * stream with the broadcast customer dimension, then a watermarked
    * tumbling count per (hour, segment, type). The static side is
    * re-resolvable per micro-batch — the standard slowly-changing-dim
    * enrichment; state is the windowed aggregate only (the join itself
    * keeps none). `dim` needs (c_custkey, c_mktsegment). */
  def enrichStatic(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("hour_start"), col("c_mktsegment"),
        col("event_type"), col("cnt"))

  /** Stream–stream interval join: each purchase joins the same user's
    * clicks from the preceding hour (click→purchase attribution). Both
    * sides are watermarked and the join condition carries the time bound
    * in BOTH directions the engine needs to size state: click state is
    * evicted once no purchase can reach back to it, purchase rows wait at
    * most the watermark delay. The canonical two-stream join shape —
    * state is bounded by (interval + watermark) × key cardinality. */
  def clickPurchaseAttribution(clicks: DataFrame, purchases: DataFrame,
      joinType: String = "inner"): DataFrame = {
    val c = clicks
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
    val p = purchases
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value"))
    // joinType "leftOuter" emits organic purchases (no click in the
    // window) with NULL click columns once the watermark proves no match
    // can still arrive — same state bound as the inner form
    p.join(c,
      col("p_user") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") < col("purchase_ts"), joinType)
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** Streaming face of q262's conversion-abandonment shape (VERDICT r10
    * item 8): absence can't come from an inner join, and streams can't
    * run a left-SEMI band join incrementally — so the incremental form
    * is the watermarked LEFT OUTER stream-stream join with CLICKS as the
    * preserved side: each click emits one row per in-horizon purchase,
    * and a NULL-purchase row exactly when the watermark has proven no
    * purchase can still arrive (the "abandoned" verdict, delivered as
    * soon as it is decidable and never earlier). Downstream, converted =
    * any non-NULL purchase row per click — StreamingSuite proves the
    * per-user rollup equals batch q262 on the same rows. State stays
    * bounded by the watermark + 1 h band, same as
    * [[clickPurchaseAttribution]]. */
  def clickAbandonment(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
    val p = purchases
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
    c.join(p,
      col("c_user") === col("p_user") &&
        col("purchase_ts") > col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
      "leftOuter")
      .select(col("click_id"), col("c_user").as("user_id"),
        col("click_ts"), col("purchase_id"))
  }

  /** Custom sessionization with explicit state (mapGroupsWithState):
    * assigns growing session ids per user on a 30-minute gap — the
    * hand-rolled equivalent of q58, demonstrating the
    * KeyValueGroupedDataset state API with processing-time timeout. */
  def sessionize(events: Dataset[Event]): Dataset[SessionAssignment] = {
    import events.sparkSession.implicits._
    val gapUs = 30L * 60 * 1000000
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionInfo, SessionAssignment](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionInfo]) =>
          var cur = state.getOption.getOrElse(SessionInfo(0L, Long.MinValue))
          // events inside one micro-batch arrive unordered: sort by event
          // time (µs) with event_id tiebreak before assigning sessions
          val out = it.toSeq
            .sortBy(e => (EventMicros.of(e.ts), e.event_id))
            .map { e =>
              val tUs = EventMicros.of(e.ts)
              val sid =
                if (cur.lastTs == Long.MinValue || tUs - cur.lastTs > gapUs) cur.sessionId + 1
                else cur.sessionId
              cur = SessionInfo(sid, tUs)
              SessionAssignment(user, e.event_id, sid)
            }
          state.update(cur)
          out.iterator
      }
  }

  /** Per-user running purchase totals on the Spark-4 `transformWithState`
    * API (see [[SpendProcessor]]). Requires the RocksDB state store
    * provider — the only provider the new operator supports. */
  def runningSpend(events: Dataset[Event]): Dataset[SpendUpdate] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .filter(_.event_type == "purchase")
      .groupByKey(_.user_id)
      .transformWithState(new SpendProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Streaming Count–Min over a stream of (shard, item) pairs (see
    * [[SketchProcessor]]): per-shard cells in RocksDB state, one
    * snapshot row per shard per batch. Shard sketches element-wise-sum
    * into the stream-global sketch; StreamingSuite proves the final
    * state is bit-identical to a batch `CountMin` over the union of all
    * batches. */
  def streamingSketch(items: Dataset[(Long, String)],
      depth: Int = 4, width: Int = 1024): Dataset[SketchSnapshot] = {
    import items.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    items
      .groupByKey(_._1)
      .transformWithState(new SketchProcessor(depth, width),
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming trending items over (shard, item) pairs (see
    * [[TrendProcessor]]): a k-bounded Misra–Gries summary per shard in
    * RocksDB state, current heavy hitters snapshot per batch.
    * StreamingSuite asserts the MG error contract against exact counts
    * of all arrivals. */
  def trendingItems(items: Dataset[(Long, String)], k: Int = 16): Dataset[TrendSnapshot] = {
    import items.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    items
      .groupByKey(_._1)
      .transformWithState(new TrendProcessor(k), TimeMode.None(), OutputMode.Append())
  }

  /** Streaming sliding-distinct active-user counts (q108's analog,
    * VERDICT r14 item 4): distinct users over the trailing
    * `windowBuckets` buckets of `bucketMinutes` each, one FINAL row per
    * window bucket emitted when the watermark closes it. See
    * [[SlidingDistinctProcessor]]. */
  def slidingDistinctStream(events: Dataset[Event], bucketMinutes: Int = 10,
      windowBuckets: Int = 6): Dataset[ActiveWindow] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val bucketUs = bucketMinutes * 60000000L
    events
      .withWatermark("ts", "10 minutes")
      .select(col("ts"), col("user_id"),
        explode(expr(s"sequence(unix_micros(ts) DIV $bucketUs, " +
          s"unix_micros(ts) DIV $bucketUs + ${windowBuckets - 1})")).as("wb"))
      .as[Contribution]
      .groupByKey(_.wb)
      .transformWithState(new SlidingDistinctProcessor(bucketMinutes * 60000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Streaming trailing RANGE-frame stats (q103's analog, VERDICT r14
    * item 4): per user, per event — count and value sum over the
    * trailing `windowMinutes` event-time window, RocksDB ListState
    * buffer, watermark-driven eviction. See [[TrailingWindowProcessor]]
    * for the parity contract with the batch frame. */
  def trailingWindowStats(events: Dataset[Event],
      windowMinutes: Int = 10): Dataset[TrailStat] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new TrailingWindowProcessor(windowMinutes * 60000000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Idle-user detection via event-time timers (see
    * [[IdleAlertProcessor]]): emits one alert per user once the
    * watermark proves no event arrived for `idleMinutes` after their
    * last one. RocksDB provider required (transformWithState API). */
  def idleAlerts(events: Dataset[Event], idleMinutes: Int = 30): Dataset[IdleAlert] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new IdleAlertProcessor(idleMinutes * 60000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Streaming LOCF forward fill — q144's batch semantics on the
    * incremental engine: per user, each event's value filled with the
    * most recent non-'view' observation; events before any observation
    * emit None. One small carry struct per user rides in group state
    * across micro-batches (in-batch order restored by the (ts,
    * event_id) sort, the [[sessionize]] convention); StreamingSuite
    * asserts batch ≡ stream on the same rows. High-cardinality keys:
    * RocksDB provider + state timeout, as for sessionize. */
  def locf(events: Dataset[Event]): Dataset[LocfFill] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LocfCarry, LocfFill](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[LocfCarry]) =>
          var cur = state.getOption.getOrElse(LocfCarry(0.0, has = false))
          val out = it.toSeq
            .sortBy(e => (EventMicros.of(e.ts), e.event_id))
            .map { e =>
              if (e.event_type != "view") cur = LocfCarry(e.value, has = true)
              LocfFill(user, e.event_id, if (cur.has) Some(cur.lastV) else None)
            }
          state.update(cur)
          out.iterator
      }
  }

  /** Streaming transition mining — q171's per-user consecutive
    * event-type pairs on the incremental engine: one tiny carry struct
    * (the last event type) per user rides in group state, so a
    * transition whose two events straddle a micro-batch boundary is
    * still emitted (in-batch order restored by the (ts, event_id) sort,
    * the [[sessionize]] convention). Downstream, the support aggregation
    * is an ordinary streaming groupBy over the emitted pairs.
    * StreamingSuite asserts batch ≡ stream on the same rows. */
  def transitions(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransCarry, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[TransCarry]) =>
          var cur = state.getOption.getOrElse(TransCarry("", has = false))
          val out = it.toSeq
            .sortBy(e => (EventMicros.of(e.ts), e.event_id))
            .flatMap { e =>
              val t = if (cur.has) Some(Transition(user, cur.lastType, e.event_type))
                else None
              cur = TransCarry(e.event_type, has = true)
              t
            }
          state.update(cur)
          out.iterator
      }
  }

  /** Streaming linear multi-touch attribution — q176's batch semantics
    * on the incremental engine: each purchase splits credit 1/k across
    * the user's clicks in the closed trailing window [t−1h, t]; zero
    * touches ⇒ organic. State = the per-user trailing-1h click buffer
    * (the q171-transitions cross-batch recipe with a list instead of a
    * scalar carry), so a purchase whose credited clicks arrived in
    * EARLIER micro-batches still counts them.
    *
    * Two semantics details mirror the batch RANGE frame exactly:
    * events are processed in runs of equal event time, clicks first —
    * the frame is closed at the purchase instant, so a same-µs click
    * counts regardless of event_id order; and the window test is
    * value-based (ts ≥ t−1h), so a click exactly one hour before the
    * purchase counts (closed lower end). credit_each carries the same
    * r6 rounding as the batch query.
    *
    * Scale: state per user is bounded by 1 hour of clicks (evicted as
    * event time advances) — the same bound the stream-stream interval
    * join above carries; high-cardinality keys take the RocksDB
    * provider as for sessionize. */
  def linearAttribution(events: Dataset[Event]): Dataset[LinearCredit] = {
    import events.sparkSession.implicits._
    val hourUs = 3600L * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ClickWindow, LinearCredit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[ClickWindow]) =>
          var buf = state.getOption.map(_.clicksUs).getOrElse(Nil)
          val sorted = it.toSeq.sortBy(e => (EventMicros.of(e.ts), e.event_id))
          val out = Seq.newBuilder[LinearCredit]
          var i = 0
          while (i < sorted.length) {
            val tUs = EventMicros.of(sorted(i).ts)
            var j = i
            while (j < sorted.length && EventMicros.of(sorted(j).ts) == tUs) j += 1
            val run = sorted.slice(i, j)
            // clicks of this instant enter the buffer BEFORE the instant's
            // purchases are credited (closed upper frame end)
            buf = run.filter(_.event_type == "click").map(_ => tUs).toList ::: buf
            buf = buf.filter(_ >= tUs - hourUs)
            run.filter(_.event_type == "purchase").foreach { e =>
              val n = buf.length.toLong
              out += LinearCredit(user, e.event_id, tUs, n,
                if (n > 0) Some(math.floor(1.0 / n * 1e6 + 0.5) / 1e6) else None,
                organic = n == 0)
            }
            i = j
          }
          state.update(ClickWindow(buf))
          out.result().iterator
      }
  }

  /** Idempotent foreachBatch upsert sink — the production "merge each
    * micro-batch into a keyed table" pattern with replay safety:
    *
    *  - the table lives as immutable VERSION directories (`v_<n>`) under
    *    `tableDir`, with `_latest` naming the current one — readers never
    *    see a half-written version (write fully, then flip the pointer);
    *  - a `_ledger` of applied micro-batch ids makes redelivery a no-op:
    *    foreachBatch gives at-least-once per batch id, the ledger check
    *    upgrades it to effectively-once;
    *  - the merge itself is q98's plan: base ANTI-JOIN batch ∪ batch,
    *    batch side broadcast (a micro-batch is small by construction).
    *
    * On a cluster the same orchestration runs against object storage
    * with a transactional table format (Delta/Iceberg) replacing the
    * pointer file; the merge plan and ledger logic are unchanged. The
    * crash window between data write and ledger append only ever causes
    * a re-merge of the same rows — upsert is idempotent by content,
    * PROVIDED `versionCol` totally orders a key's rows within a batch
    * (ties pick an arbitrary winner and a replay may pick a different
    * one — the r15 review's same-key-same-version caveat; the default
    * event_id is unique in the house schema). Pointer and ledger flips
    * are ATOMIC (temp file + rename), so a crash mid-write can't leave
    * a truncated pointer that poisons every later read.
    *
    * `queryKey` scopes the ledger (r15 review, the Delta txnAppId
    * lesson): foreachBatch batch ids RESTART FROM 0 when a query runs
    * with a fresh checkpointLocation, and a bare-batchId ledger would
    * then silently no-op every merge of the restarted stream. Pass the
    * StreamingQuery's stable `id` (it changes exactly when the
    * checkpoint does); the default single-key namespace preserves the
    * old behavior for tests that never reset checkpoints.
    *
    * Vacuum retains `retainVersions` versions BEHIND the current one
    * and deletes the single version falling off that horizon (O(1) per
    * merge). A reader that resolved `_latest` more than retainVersions
    * merges ago can hit FileNotFoundException on its lazy scan — size
    * the horizon to reader latency; 2 is safe for the
    * resolve-then-collect pattern readTable supports. */
  def mergeBatch(batch: DataFrame, tableDir: String, keyCol: String,
      batchId: Long, versionCol: String = "event_id",
      queryKey: String = "q", retainVersions: Int = 2): Unit = {
    require(retainVersions >= 1, "mergeBatch: retainVersions must be >= 1")
    val spark = batch.sparkSession
    val dir = new java.io.File(tableDir)
    dir.mkdirs()
    val ledger = new java.io.File(dir, "_ledger")
    // ledger entries are "queryKey/batchId"; bare legacy lines parse as
    // the default namespace so pre-r15 tables keep their idempotence
    val applied: Set[String] =
      if (ledger.exists)
        java.nio.file.Files.readAllLines(ledger.toPath).asScala
          .filter(_.nonEmpty)
          .map(l => if (l.contains('/')) l else s"q/$l").toSet
      else Set.empty
    val entry = s"$queryKey/$batchId"
    if (applied(entry)) return // redelivered batch: already merged
    val latest = new java.io.File(dir, "_latest")
    val curVersion: Long =
      if (latest.exists) java.nio.file.Files.readString(latest.toPath).trim.toLong else -1L
    val deduped = {
      // last-writer-wins INSIDE the batch too (a key can repeat within
      // one micro-batch): keep the highest `versionCol` per key — the
      // caller names the ordering column (default event_id)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCol).orderBy(col(versionCol).desc)
      batch.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
    }
    val merged =
      if (curVersion < 0) deduped
      else {
        val base = spark.read.parquet(s"$tableDir/v_$curVersion")
        base.join(broadcast(deduped.select(keyCol)), Seq(keyCol), "left_anti")
          .unionByName(deduped)
      }
    merged.write.mode("overwrite").parquet(s"$tableDir/v_${curVersion + 1}")
    // data first, then an ATOMIC pointer/ledger flip: the worst crash
    // outcome stays "version written, pointer not flipped" (re-merged
    // idempotently on redelivery) — never a half-written pointer whose
    // toLong parse would fail permanently in readTable
    atomicWrite(latest.toPath, (curVersion + 1).toString)
    atomicWrite(ledger.toPath,
      (applied + entry).toSeq.sorted.mkString("", "\n", "\n"))
    // vacuum: after the flip (new current = curVersion+1), the single
    // version falling off the retention horizon is deleted — O(1) per
    // merge, not an O(N) sweep; a crash between flip and vacuum leaves
    // at most one straggler directory. Retention exists because readers
    // resolve _latest EAGERLY but scan LAZILY (see the method doc).
    if (curVersion + 1 - retainVersions - 1 >= 0) {
      val old = new java.io.File(dir, s"v_${curVersion + 1 - retainVersions - 1}")
      if (old.exists) {
        Option(old.listFiles()).foreach(_.foreach(_.delete()))
        old.delete()
      }
    }
  }

  /** Write-temp-then-rename: POSIX rename within one directory is atomic,
    * so readers see either the old or the new full content, never a
    * truncated file. */
  private def atomicWrite(path: java.nio.file.Path, content: String): Unit = {
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    java.nio.file.Files.writeString(tmp, content)
    java.nio.file.Files.move(tmp, path,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read the current version of a [[mergeBatch]] table (empty-schema
    * error if no version exists yet — call after the first batch). */
  def readTable(spark: org.apache.spark.sql.SparkSession, tableDir: String): DataFrame = {
    val v = java.nio.file.Files.readString(
      new java.io.File(tableDir, "_latest").toPath).trim
    spark.read.parquet(s"$tableDir/v_$v")
  }

  /** Wire [[mergeBatch]] as a foreachBatch sink on a keyed update
    * stream. `versionCol` orders same-key rows within a micro-batch
    * (last writer wins) — the stream must carry it.
    *
    * The ledger queryKey is DERIVED FROM checkpointDir (ADVICE r15:
    * wiring mergeBatch with the default 'q' namespace re-opened the very
    * restart hazard the queryKey parameter exists to close — a query
    * restarted with a FRESH checkpointLocation restarts batch ids at 0,
    * and against an existing tableDir every merge of the restarted
    * stream would silently no-op as "already applied"). Batch ids are
    * scoped by the checkpoint, so the canonical checkpoint path changes
    * exactly when the id sequence does — the same coupling Delta gets
    * from txnAppId. Hashed so ledger lines stay single-token regardless
    * of path characters. */
  def upsertSink(stream: DataFrame, tableDir: String, keyCol: String,
      checkpointDir: String,
      versionCol: String = "event_id"): org.apache.spark.sql.streaming.StreamingQuery = {
    val queryKey = checkpointQueryKey(checkpointDir)
    stream.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        mergeBatch(batch, tableDir, keyCol, id, versionCol, queryKey)
      }
      .start()
  }

  /** The ledger namespace [[upsertSink]] derives from its checkpoint
    * location — exposed so out-of-band maintenance merges (backfills,
    * repairs) can join the SAME idempotence namespace as the live sink. */
  def checkpointQueryKey(checkpointDir: String): String =
    "ckpt-" + java.util.UUID.nameUUIDFromBytes(
      new java.io.File(checkpointDir).getCanonicalPath.getBytes("UTF-8")).toString
}
