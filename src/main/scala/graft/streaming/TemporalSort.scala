package graft.streaming

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming temporal (watermark-ordered) sort — semantics of the
  * reference's StreamExecTemporalSort
  * (flink-table/flink-table-planner/.../exec/stream/StreamExecTemporalSort.java:64)
  * backed by RowTimeSortOperator
  * (flink-table-runtime/.../operators/sort/RowTimeSortOperator.java:43):
  * an append-only stream ordered primarily by event time is re-emitted in
  * exact event-time order once the watermark guarantees completeness.
  *
  * Out-of-order rows are buffered in MapState[ts → rows] with one
  * event-time timer per distinct timestamp; when the watermark passes a
  * timestamp its rows are emitted in (ts, arrival) order — arrival order
  * within equal timestamps matches the reference (RowTimeSortOperator
  * appends to the per-timestamp list and emits in list order). Rows at or
  * behind the watermark on arrival are late and dropped. State is bounded
  * by watermark lag: every emission drains the buffered prefix.
  */
object TemporalSort {

  case class Buffered[V](vs: Seq[V])

  class TemporalSortProcessor[K, V: TypeTag](tsOf: V => Long, vEnc: Encoder[V])
      extends StatefulProcessor[K, V, V] {

    @transient private var buf: MapState[Long, Buffered[V]] = _
    @transient private var ptimer: ValueState[Long] = _ // smallest live timer

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      implicit val ev: Encoder[V] = vEnc
      buf = getHandle.getMapState[Long, Buffered[V]]("buffer",
        Encoders.scalaLong, Encoders.product[Buffered[V]], TTLConfig.NONE)
      ptimer = getHandle.getValueState[Long]("ptimer",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    /** Timers are COALESCED (the ProcessOps doctrine): one live timer per
      * key at the smallest unemitted timestamp, re-armed after each
      * drain. A timer per distinct timestamp makes every watermark
      * advance fire once per buffered timestamp, each fire scanning the
      * whole remaining buffer — O(T²) state reads per key.
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

    override def handleInputRows(key: K, rows: Iterator[V],
        timerValues: TimerValues): Iterator[V] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      var minNew = Long.MaxValue
      rows.foreach { v =>
        val ts = tsOf(v)
        if (ts > wm) {
          val cur = if (buf.containsKey(ts)) buf.getValue(ts).vs else Seq.empty
          buf.updateValue(ts, Buffered(cur :+ v))
          if (ts < minNew) minNew = ts
        } // else: late row, dropped
      }
      if (minNew != Long.MaxValue) arm(minNew)
      Iterator.empty
    }

    override def handleExpiredTimer(key: K, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[V] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val all = buf.iterator().map(_._1).toArray.sorted
      val due = all.takeWhile(_ <= wm)
      val out = scala.collection.mutable.ArrayBuffer.empty[V]
      due.foreach { ts =>
        out ++= buf.getValue(ts).vs
        buf.removeKey(ts)
      }
      // re-arm for the earliest still-buffered timestamp (all > wm here)
      ptimer.clear()
      if (due.length < all.length) arm(all(due.length))
      out.iterator
    }
  }

  /** Dataset entry point: watermark-ordered re-emission per key. The
    * input must already carry a watermark (withWatermark upstream);
    * `tsOf` must read the same event-time values in epoch millis.
    */
  def sorted[K: Encoder, V: Encoder: TypeTag](ds: Dataset[V], keyOf: V => K,
      tsOf: V => Long): Dataset[V] =
    ds.groupByKey(keyOf)
      .transformWithState(
        new TemporalSortProcessor[K, V](tsOf, implicitly[Encoder[V]]),
        TimeMode.EventTime(), OutputMode.Append())

  case class SeqStamped(k: String, id: Long, seq: Long)

  /** Per-key emission-sequence stamper: every row the upstream sort
    * emits gets the key's running count. Chained after [[sorted]] it
    * turns emission ORDER into a checkable VALUE — row i's seq must
    * equal its rank in exact (ts, arrival) order, so ANY out-of-order,
    * duplicated, or dropped emission shifts some seq and breaks an
    * oracle hash. Stronger than [[OrderAuditProcessor]]'s violation
    * counter, which only sees adjacent descending-ts pairs.
    */
  class SeqStampProcessor[V](idOf: V => Long)
      extends StatefulProcessor[String, V, SeqStamped] {
    @transient private var n: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      n = getHandle.getValueState[Long]("seq",
        Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[V],
        timerValues: TimerValues): Iterator[SeqStamped] = {
      var c = if (n.exists()) n.get() else 0L
      val out = rows.map { v => c += 1; SeqStamped(key, idOf(v), c) }.toVector
      n.update(c)
      out.iterator
    }
  }

  case class OrderAudit(key: String, n: Long, violations: Long)

  /** Downstream order auditor: consumes a (supposedly) time-ordered
    * stream and tracks, per key, how many rows arrived with a timestamp
    * BELOW their predecessor's. Chained after [[sorted]] it makes
    * emission ORDER a checkable value — an oracle compare of the final
    * (n, violations=0) row per key fails if the sort ever emitted out of
    * order, which a sorted-at-the-end sink table alone cannot reveal.
    */
  class OrderAuditProcessor[V](tsOf: V => Long)
      extends StatefulProcessor[String, V, OrderAudit] {
    @transient private var lastTs: ValueState[Long] = _
    @transient private var seen: ValueState[OrderAudit] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      lastTs = getHandle.getValueState[Long]("lastTs",
        Encoders.scalaLong, TTLConfig.NONE)
      seen = getHandle.getValueState[OrderAudit]("seen",
        Encoders.product[OrderAudit], TTLConfig.NONE)
    }
    override def handleInputRows(key: String, rows: Iterator[V],
        timerValues: TimerValues): Iterator[OrderAudit] = {
      var cur = if (seen.exists()) seen.get() else OrderAudit(key, 0L, 0L)
      var last = if (lastTs.exists()) lastTs.get() else Long.MinValue
      rows.foreach { v =>
        val ts = tsOf(v)
        cur = cur.copy(n = cur.n + 1,
          violations = cur.violations + (if (ts < last) 1L else 0L))
        last = ts
      }
      lastTs.update(last)
      seen.update(cur)
      Iterator.single(cur)
    }
  }
}
