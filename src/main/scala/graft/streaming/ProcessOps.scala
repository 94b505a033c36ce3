package graft.streaming

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** Process-function layer — the reference's KeyedProcessFunction surface
  * (flink-streaming-java/.../api/functions/KeyedProcessFunction.java:
  * timers + keyed state; KeyedStream.process KeyedStream.java:327) and the
  * streaming bounded over-aggregate
  * (flink-table-runtime/.../operators/over/RowTimeRowsBoundedPrecedingFunction.java:57)
  * on transformWithState (SURVEY.md §2.6, §2.10, §7.2 phase 5).
  */
object ProcessOps {

  /** Inactivity-timeout detector — the canonical KeyedProcessFunction
    * example: for each key, (re)register a processing-time timer `gapMs`
    * after the last seen row; when it fires with no intervening rows, emit
    * a timeout marker. Exercises both timer registration/deletion and the
    * timer callback (ProcessingTimeTriggers parity).
    */
  case class Timeout(key: String, lastValue: Long, firedAtMs: Long)

  class InactivityTimeoutProcessor(gapMs: Long)
      extends StatefulProcessor[String, (String, Long), Timeout] {
    @transient private var lastVal: ValueState[Long] = _
    @transient private var timerAt: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      lastVal = getHandle.getValueState[Long]("lastVal", Encoders.scalaLong, TTLConfig.NONE)
      timerAt = getHandle.getValueState[Long]("timerAt", Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[Timeout] = {
      rows.foreach { case (_, v) => lastVal.update(v) }
      // slide the timer: delete the pending one, register a fresh one
      if (timerAt.exists()) getHandle.deleteTimer(timerAt.get())
      val at = timerValues.getCurrentProcessingTimeInMs() + gapMs
      getHandle.registerTimer(at)
      timerAt.update(at)
      Iterator.empty
    }
    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Timeout] = {
      val v = if (lastVal.exists()) lastVal.get() else -1L
      timerAt.clear()
      Iterator.single(Timeout(key, v, expiredTimerInfo.getExpiryTimeInMs()))
    }
  }

  case class OverOut(key: String, ts: Long, v: Long, movingSum: Long, n: Long)
  case class OverBuf(items: Seq[Long])

  /** One timestamp's buffered values, arrival order. */
  case class TsRows(vs: Seq[Long])

  /** Event-time input envelope: transformWithState(TimeMode.EventTime)
    * needs the watermarked TIMESTAMP column to reach the operator, so the
    * input type carries it (a .map would strip the watermark metadata).
    */
  case class TimedIn(key: String, eventTime: java.sql.Timestamp, v: Long)

  /** Shared machinery for the event-time over-aggregate processors —
    * the row buffer + coalesced-timer skeleton all three frame kinds
    * (unbounded, ROWS-bounded, RANGE-bounded) use identically in the
    * reference (AbstractRowTimeUnboundedPrecedingOver.java:51,
    * RowTimeRowsBoundedPrecedingFunction.java:57,
    * RowTimeRangeBoundedPrecedingFunction.java:56 all keep a
    * MapState[ts → rows] input buffer drained by event-time timers):
    * out-of-order rows buffer in MapState keyed at millisecond
    * timestamps; when the watermark passes a timestamp, the buffered
    * rows are processed in event-time order (arrival order within one
    * timestamp) by the subclass's frame logic. Rows at or behind the
    * watermark on arrival are late and dropped (the reference's
    * numLateRecordsDropped path).
    */
  abstract class BufferedOverProcessor
      extends StatefulProcessor[String, TimedIn, OverOut] {
    @transient private var buf: MapState[Long, TsRows] = _
    @transient private var ptimer: ValueState[Long] = _ // smallest live timer

    /** Frame-specific state init (the base states are already bound). */
    protected def initFrameState(): Unit

    /** Load the frame's accumulator state ONCE before a drain — the due
      * loop below runs over every timestamp the watermark released, and
      * per-timestamp ValueState round-trips would multiply state-store
      * I/O by the drain length (the same O(T) blowup the timer
      * coalescing above exists to avoid).
      */
    protected def beginDrain(): Unit

    /** Persist the frame's accumulator state ONCE after a drain. */
    protected def endDrain(): Unit

    /** Process ALL rows of one due timestamp (arrival order) and emit
      * their output rows — the frame decides how the aggregate advances
      * and what peers see. Runs between [[beginDrain]] and [[endDrain]];
      * frame state lives in instance fields for the drain's duration.
      */
    protected def processTimestamp(key: String, ts: Long, vs: Seq[Long],
        out: scala.collection.mutable.ArrayBuffer[OverOut]): Unit

    final override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getMapState[Long, TsRows]("buffer",
        Encoders.scalaLong, Encoders.product[TsRows], TTLConfig.NONE)
      ptimer = getHandle.getValueState[Long]("ptimer",
        Encoders.scalaLong, TTLConfig.NONE)
      initFrameState()
    }

    /** Arm a timer at `ts` unless one at or below it is already live.
      * Invariant: whenever the buffer is non-empty, a live timer exists
      * at or below the smallest buffered timestamp. Timers are COALESCED:
      * one live timer per key, re-armed after each drain — a timer per
      * distinct timestamp (the naive translation of the reference, whose
      * timer service dedupes and fires each exactly once) makes every
      * watermark advance call handleExpiredTimer once per buffered
      * timestamp, each call scanning the whole remaining buffer — O(T²)
      * state-store reads per key per batch.
      */
    private def arm(ts: Long): Unit = {
      val cur = if (ptimer.exists()) ptimer.get() else Long.MaxValue
      if (ts < cur) {
        // delete the superseded higher timer: left alive it would fire a
        // no-op callback that still scans the whole remaining buffer
        if (cur != Long.MaxValue) getHandle.deleteTimer(cur)
        getHandle.registerTimer(ts)
        ptimer.update(ts)
      }
    }

    final override def handleInputRows(key: String, rows: Iterator[TimedIn],
        timerValues: TimerValues): Iterator[OverOut] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      var minNew = Long.MaxValue
      rows.foreach { r =>
        val ts = r.eventTime.getTime
        if (ts > wm) { // not yet late: buffer + schedule emission
          val cur = if (buf.containsKey(ts)) buf.getValue(ts).vs else Seq.empty
          buf.updateValue(ts, TsRows(cur :+ r.v))
          if (ts < minNew) minNew = ts
        } // else: late row, dropped (reference numLateRecordsDropped)
      }
      if (minNew != Long.MaxValue) arm(minNew)
      Iterator.empty
    }

    final override def handleExpiredTimer(key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[OverOut] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val all = buf.iterator().map(_._1).toArray.sorted
      val due = all.takeWhile(_ <= wm)
      val out = scala.collection.mutable.ArrayBuffer.empty[OverOut]
      if (due.nonEmpty) {
        beginDrain()
        due.foreach { ts =>
          processTimestamp(key, ts, buf.getValue(ts).vs, out)
          buf.removeKey(ts)
        }
        endDrain()
      }
      // re-arm for the earliest still-buffered timestamp (all > wm here)
      ptimer.clear()
      if (due.length < all.length) arm(all(due.length))
      out.iterator
    }
  }

  /** Streaming UNBOUNDED PRECEDING over-aggregate (see the class
    * scaladoc above for the buffering contract). The accumulator
    * (ValueState) persists forever — that is what "unbounded preceding"
    * means — while the row buffer is bounded by watermark lag and is
    * drained on every emission (the reference's cleanupTimestamp logic).
    *
    * `rangeMode = false` → ROWS semantics (each row its own incremental
    * sum, insertion order within a timestamp); `rangeMode = true` → RANGE
    * semantics (all rows of one timestamp accumulate first, then emit
    * with the same aggregate, RowTimeRangeUnboundedPrecedingFunction:47).
    */
  class UnboundedPrecedingOverProcessor(rangeMode: Boolean)
      extends BufferedOverProcessor {
    @transient private var acc: ValueState[Long] = _ // running sum
    @transient private var cnt: ValueState[Long] = _ // running count
    private var a = 0L // drain-scoped copies of the two states
    private var n = 0L

    override protected def initFrameState(): Unit = {
      acc = getHandle.getValueState[Long]("acc", Encoders.scalaLong, TTLConfig.NONE)
      cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)
    }

    override protected def beginDrain(): Unit = {
      a = if (acc.exists()) acc.get() else 0L
      n = if (cnt.exists()) cnt.get() else 0L
    }

    override protected def endDrain(): Unit = {
      acc.update(a)
      cnt.update(n)
    }

    override protected def processTimestamp(key: String, ts: Long,
        vs: Seq[Long],
        out: scala.collection.mutable.ArrayBuffer[OverOut]): Unit = {
      if (rangeMode) {
        vs.foreach { v => a += v; n += 1 }
        vs.foreach { v => out += OverOut(key, ts, v, a, n) }
      } else vs.foreach { v =>
        a += v; n += 1
        out += OverOut(key, ts, v, a, n)
      }
    }
  }

  /** Streaming ROWS-bounded over-aggregate — semantics of
    * RowTimeRowsBoundedPrecedingFunction.java:57: per key, each row
    * emits the running sum over the last `nRows` rows (ROWS BETWEEN
    * n-1 PRECEDING AND CURRENT ROW) in event-time order, arrival order
    * within one timestamp. State beyond the input buffer = the running
    * accumulator plus the retained last ≤ nRows values — exactly the
    * reference's accumulator + retract-row state (it retracts the row
    * falling out of the frame instead of re-summing the window).
    */
  class RowsBoundedOverProcessor(nRows: Int) extends BufferedOverProcessor {
    require(nRows >= 1, s"ROWS frame needs nRows >= 1, got $nRows")
    @transient private var acc: ValueState[Long] = _
    @transient private var retained: ValueState[OverBuf] = _
    private var a = 0L // drain-scoped copies of the two states
    private var keep: Seq[Long] = Nil

    override protected def initFrameState(): Unit = {
      acc = getHandle.getValueState[Long]("acc", Encoders.scalaLong, TTLConfig.NONE)
      retained = getHandle.getValueState[OverBuf]("window",
        Encoders.product[OverBuf], TTLConfig.NONE)
    }

    override protected def beginDrain(): Unit = {
      a = if (acc.exists()) acc.get() else 0L
      keep = if (retained.exists()) retained.get().items else Nil
    }

    override protected def endDrain(): Unit = {
      acc.update(a)
      retained.update(OverBuf(keep))
    }

    override protected def processTimestamp(key: String, ts: Long,
        vs: Seq[Long],
        out: scala.collection.mutable.ArrayBuffer[OverOut]): Unit = {
      vs.foreach { v =>
        a += v
        keep = keep :+ v
        if (keep.length > nRows) { // retract the row leaving the frame
          a -= keep.head
          keep = keep.tail
        }
        out += OverOut(key, ts, v, a, keep.length.toLong)
      }
    }
  }

  /** Streaming RANGE-bounded over-aggregate — semantics of
    * RowTimeRangeBoundedPrecedingFunction.java:56: each row emits the
    * sum over same-key rows within the trailing event-time range
    * (RANGE BETWEEN x PRECEDING AND CURRENT ROW, lower bound inclusive).
    * All rows of one timestamp are RANGE peers: they accumulate first
    * and emit the same aggregate — the reference adds the whole
    * per-timestamp input list to the accumulator before emitting.
    *
    * State beyond the input buffer = the accumulator + retained-row
    * count (two ValueStates, one load/store per drain via the
    * beginDrain/endDrain contract) plus the retained rows themselves in
    * MapState keyed by timestamp — the reference's own idiom (its
    * inputState MapState doubles as the retained frame; expired keys are
    * retracted and removed as the frame advances) — plus a PERSISTED
    * ascending index of the retained timestamps (one small ValueState,
    * the reference's sortedTimestamps analogue). Relative to a
    * single-ValueState frame blob, per-drain state I/O on the rows is
    * O(inserted + evicted) writes/removes; the index costs one
    * contiguous value read + write per drain instead of the prior
    * full MapState KEY enumeration (O(retained) separate point reads —
    * the residual term at wide-RANGE × high-rate). Eviction never scans
    * values: due timestamps drain in ascending order, so the horizon
    * advances monotonically and expired keys pop off the head of the
    * index.
    */
  class RangeBoundedOverProcessor(rangeMs: Long)
      extends BufferedOverProcessor {
    require(rangeMs >= 0, s"RANGE frame needs rangeMs >= 0, got $rangeMs")
    @transient private var acc: ValueState[Long] = _
    @transient private var cnt: ValueState[Long] = _
    @transient private var retained: MapState[Long, TsRows] = _
    // ascending ts index; protected so the rebuild-path spec can subclass
    // and withhold it between drains (ProcessOpsSpec)
    @transient protected var idx: ValueState[OverBuf] = _
    private var a = 0L // drain-scoped copies of the small states
    private var n = 0L
    // drain-scoped ascending index of retained timestamps
    private var keepTs: scala.collection.mutable.ArrayDeque[Long] = _

    override protected def initFrameState(): Unit = {
      acc = getHandle.getValueState[Long]("acc", Encoders.scalaLong, TTLConfig.NONE)
      cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)
      retained = getHandle.getMapState[Long, TsRows]("range",
        Encoders.scalaLong, Encoders.product[TsRows], TTLConfig.NONE)
      idx = getHandle.getValueState[OverBuf]("rangeIdx",
        Encoders.product[OverBuf], TTLConfig.NONE)
    }

    override protected def beginDrain(): Unit = {
      a = if (acc.exists()) acc.get() else 0L
      n = if (cnt.exists()) cnt.get() else 0L
      keepTs =
        if (idx.exists())
          scala.collection.mutable.ArrayDeque.from(idx.get().items)
        else if (!retained.exists())
          scala.collection.mutable.ArrayDeque.empty[Long]
        else
          // belt-and-braces rebuild (index lost but rows present — no
          // normal lifecycle reaches here; a checkpoint restores both)
          scala.collection.mutable.ArrayDeque.from(
            retained.keys().toArray[Long].sorted)
    }

    override protected def endDrain(): Unit = {
      acc.update(a)
      cnt.update(n)
      idx.update(OverBuf(keepTs.toSeq))
    }

    override protected def processTimestamp(key: String, ts: Long,
        vs: Seq[Long],
        out: scala.collection.mutable.ArrayBuffer[OverOut]): Unit = {
      // peers accumulate first (same-timestamp rows share the frame).
      // `ts` is fresh: retained keys are all ≤ a prior watermark < ts
      // (a re-arrival at a drained timestamp is late and was dropped),
      // so the append keeps the index ascending
      vs.foreach { v => a += v; n += 1 }
      retained.updateValue(ts, TsRows(vs))
      keepTs.append(ts)
      // retract rows behind the inclusive horizon ts - rangeMs
      while (keepTs.nonEmpty && keepTs.head < ts - rangeMs) {
        val e = keepTs.removeHead()
        val evicted = retained.getValue(e).vs
        evicted.foreach { v => a -= v; n -= 1 }
        retained.removeKey(e)
      }
      vs.foreach { v => out += OverOut(key, ts, v, a, n) }
    }
  }

  /** State TTL demonstration — StateTtlConfig parity: a counting state
    * with a TTL; keys silently reset after expiry.
    */
  class TtlCountProcessor(ttlMs: Long)
      extends StatefulProcessor[String, (String, Long), (String, Long)] {
    @transient private var cnt: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong,
        TTLConfig(java.time.Duration.ofMillis(ttlMs)))
    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[(String, Long)] = {
      var c = if (cnt.exists()) cnt.get() else 0L
      rows.foreach(_ => c += 1)
      cnt.update(c)
      Iterator.single((key, c))
    }
  }
}
