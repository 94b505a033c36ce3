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

  /** Streaming ROWS-bounded over-aggregate — semantics of
    * RowTimeRowsBoundedPrecedingFunction.java:57: per key, for each input
    * row emit the running sum over the last `nRows` rows (ROWS BETWEEN
    * n-1 PRECEDING AND CURRENT ROW) in event order. State = the bounded
    * row buffer, exactly the reference's retained-rows state.
    */
  case class OverIn(key: String, ts: Long, v: Long)
  case class OverOut(key: String, ts: Long, v: Long, movingSum: Long, n: Long)
  case class OverBuf(items: Seq[Long])

  class RowsBoundedOverProcessor(nRows: Int)
      extends StatefulProcessor[String, OverIn, OverOut] {
    @transient private var buf: ValueState[OverBuf] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getValueState[OverBuf]("window",
        Encoders.product[OverBuf], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[OverIn],
        timerValues: TimerValues): Iterator[OverOut] = {
      var cur: Seq[Long] = if (buf.exists()) buf.get().items else Nil
      val out = rows.toSeq.sortBy(_.ts).map { r =>
        cur = (cur :+ r.v).takeRight(nRows)
        OverOut(r.key, r.ts, r.v, cur.sum, cur.length.toLong)
      }
      buf.update(OverBuf(cur))
      out.iterator
    }
  }

  /** Streaming RANGE-bounded over-aggregate — semantics of
    * RowTimeRangeBoundedPrecedingFunction.java:56: for each row, the sum
    * over rows of the same key within the trailing event-time range
    * (RANGE BETWEEN x PRECEDING AND CURRENT ROW). State = the retained
    * (ts, value) buffer; rows behind the current row's range horizon are
    * evicted as it advances (the reference's cleanup-timer analogue).
    */
  class RangeBoundedOverProcessor(rangeMs: Long)
      extends StatefulProcessor[String, OverIn, OverOut] {
    @transient private var buf: ValueState[RangeBuf] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getValueState[RangeBuf]("range",
        Encoders.product[RangeBuf], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[OverIn],
        timerValues: TimerValues): Iterator[OverOut] = {
      var cur: Seq[(Long, Long)] =
        if (buf.exists()) buf.get().ts.zip(buf.get().vs) else Nil
      val out = rows.toSeq.sortBy(_.ts).map { r =>
        cur = (cur :+ (r.ts, r.v)).filter { case (t, _) => t >= r.ts - rangeMs }
        OverOut(r.key, r.ts, r.v, cur.map(_._2).sum, cur.length.toLong)
      }
      buf.update(RangeBuf(cur.map(_._1), cur.map(_._2)))
      out.iterator
    }
  }
  case class RangeBuf(ts: Seq[Long], vs: Seq[Long])

  /** Streaming UNBOUNDED PRECEDING over-aggregate — semantics of
    * AbstractRowTimeUnboundedPrecedingOver.java:51 (and the ROWS/RANGE
    * split of RowTimeRowsUnboundedPrecedingFunction /
    * RowTimeRangeUnboundedPrecedingFunction): out-of-order rows are
    * buffered in MapState[ts → rows]; when the watermark passes a
    * timestamp the buffered rows are emitted in event-time order, each
    * carrying the running aggregate from the start of the partition. The
    * accumulator (ValueState) persists forever — that is what "unbounded
    * preceding" means — while the row buffer is bounded by watermark lag
    * and is drained on every emission (the reference's cleanupTimestamp
    * logic).
    *
    * Timers are COALESCED: one live timer per key at the smallest
    * unprocessed timestamp, re-armed after each drain. A timer per
    * distinct timestamp (the naive translation of the reference, whose
    * timer service dedupes and fires each exactly once) makes every
    * watermark advance call handleExpiredTimer once per buffered
    * timestamp, each call scanning the whole remaining buffer — O(T²)
    * state-store reads per key per batch.
    *
    * `rangeMode = false` → ROWS semantics (each row its own incremental
    * sum, insertion order within a timestamp); `rangeMode = true` → RANGE
    * semantics (all rows of one timestamp accumulate first, then emit
    * with the same aggregate, RowTimeRangeUnboundedPrecedingFunction:47).
    * Rows at or behind the watermark on arrival are late and dropped
    * (the reference's numLateRecordsDropped counter path).
    */
  case class TsRows(vs: Seq[Long])

  /** Event-time input envelope: transformWithState(TimeMode.EventTime)
    * needs the watermarked TIMESTAMP column to reach the operator, so the
    * input type carries it (a .map would strip the watermark metadata).
    */
  case class TimedIn(key: String, eventTime: java.sql.Timestamp, v: Long)

  class UnboundedPrecedingOverProcessor(rangeMode: Boolean)
      extends StatefulProcessor[String, TimedIn, OverOut] {
    @transient private var buf: MapState[Long, TsRows] = _
    @transient private var acc: ValueState[Long] = _ // running sum
    @transient private var cnt: ValueState[Long] = _ // running count
    @transient private var ptimer: ValueState[Long] = _ // smallest live timer

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getMapState[Long, TsRows]("buffer",
        Encoders.scalaLong, Encoders.product[TsRows], TTLConfig.NONE)
      acc = getHandle.getValueState[Long]("acc", Encoders.scalaLong, TTLConfig.NONE)
      cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)
      ptimer = getHandle.getValueState[Long]("ptimer",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    /** Arm a timer at `ts` unless one at or below it is already live.
      * Invariant: whenever the buffer is non-empty, a live timer exists
      * at or below the smallest buffered timestamp.
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

    override def handleInputRows(key: String, rows: Iterator[TimedIn],
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

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[OverOut] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val all = buf.iterator().map(_._1).toArray.sorted
      val due = all.takeWhile(_ <= wm)
      var a = if (acc.exists()) acc.get() else 0L
      var n = if (cnt.exists()) cnt.get() else 0L
      val out = scala.collection.mutable.ArrayBuffer.empty[OverOut]
      due.foreach { ts =>
        val vs = buf.getValue(ts).vs
        if (rangeMode) {
          vs.foreach { v => a += v; n += 1 }
          vs.foreach { v => out += OverOut(key, ts, v, a, n) }
        } else vs.foreach { v =>
          a += v; n += 1
          out += OverOut(key, ts, v, a, n)
        }
        buf.removeKey(ts)
      }
      acc.update(a)
      cnt.update(n)
      // re-arm for the earliest still-buffered timestamp (all > wm here)
      ptimer.clear()
      if (due.length < all.length) arm(all(due.length))
      out.iterator
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
