package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming stateful operators on `transformWithState` — the Spark-4
  * analogue of the reference's keyed-state operators (SURVEY.md §2.7,
  * §2.4, §7.2 phase 3). Each processor documents the runtime operator
  * whose semantics it reproduces.
  */
object StatefulOps {

  /** Keyed change event consumed/produced by the changelog operators:
    * `kind` uses the Changelog byte constants (+I/-U/+U/-D).
    */
  case class Change[K, V](kind: Byte, key: K, value: V)

  /** Keep-FIRST-row-per-key streaming dedup — semantics of
    * flink-table-runtime/.../operators/deduplicate/ProcTimeDeduplicateKeepFirstRowFunction.java:28:
    * the first row wins, later rows are dropped; emits an insert-only
    * stream. (`dropDuplicates` covers the SQL path; this processor is the
    * keyed-state form that composes with the other changelog operators.)
    */
  class KeepFirstProcessor[K, V](vEnc: Encoder[V])
      extends StatefulProcessor[K, V, V] {
    @transient private var seen: ValueState[Boolean] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        Encoders.scalaBoolean, TTLConfig.NONE)
    override def handleInputRows(key: K, rows: Iterator[V],
        timerValues: TimerValues): Iterator[V] = {
      if (seen.exists()) Iterator.empty
      else {
        seen.update(true)
        rows.take(1)
      }
    }
  }

  /** Keep-LAST-row-per-key streaming dedup emitting a retract stream —
    * semantics of ProcTimeDeduplicateKeepLastRowFunction.java:32 +
    * StreamExecChangelogNormalize.java:77: each new row for a key retracts
    * the previous one (-U old, +U new; first row emits +I).
    */
  class KeepLastProcessor[K, V](vEnc: Encoder[V])
      extends StatefulProcessor[K, V, Change[K, V]] {
    @transient private var last: ValueState[V] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[V]("last", vEnc, TTLConfig.NONE)
    override def handleInputRows(key: K, rows: Iterator[V],
        timerValues: TimerValues): Iterator[Change[K, V]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Change[K, V]]
      rows.foreach { v =>
        if (last.exists()) {
          out += Change(Changelog.UpdateBefore, key, last.get())
          out += Change(Changelog.UpdateAfter, key, v)
        } else {
          out += Change(Changelog.Insert, key, v)
        }
        last.update(v)
      }
      out.iterator
    }
  }

  /** Retraction-aware streaming group aggregation (SUM + COUNT) —
    * semantics of flink-table-runtime/.../operators/aggregate/GroupAggFunction.java:43
    * with RecordCounter.java:26 empty-group deletion: consumes a changelog
    * (+I/+U accumulate, -U/-D retract), emits -U/+U pairs around each
    * change, +I for a new group, and -D when the group's record count
    * returns to zero.
    */
  case class AggResult(key: String, sum: Long, count: Long)

  class RetractSumProcessor
      extends StatefulProcessor[String, Change[String, Long], Change[String, AggResult]] {
    @transient private var acc: ValueState[AggResult] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[AggResult]("acc",
        Encoders.product[AggResult], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[Change[String, Long]],
        timerValues: TimerValues): Iterator[Change[String, AggResult]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Change[String, AggResult]]
      rows.foreach { c =>
        val prev = if (acc.exists()) Some(acc.get()) else None
        val add = Changelog.isAdd(c.kind)
        val next = prev match {
          case Some(p) => AggResult(key,
            p.sum + (if (add) c.value else -c.value),
            p.count + (if (add) 1 else -1))
          case None => AggResult(key, if (add) c.value else -c.value,
            if (add) 1L else -1L)
        }
        prev match {
          // GroupAggFunction.java:131 — a retraction arriving for an
          // absent group must not create an accumulator; drop it.
          case None if !add => ()
          case None =>
            out += Change(Changelog.Insert, key, next)
            acc.update(next)
          case Some(p) if next.count <= 0 =>
            // RecordCounter: group emptied — emit delete, clear state.
            out += Change(Changelog.Delete, key, p)
            acc.clear()
          case Some(p) =>
            out += Change(Changelog.UpdateBefore, key, p)
            out += Change(Changelog.UpdateAfter, key, next)
            acc.update(next)
        }
      }
      out.iterator
    }
  }

  /** Append-only streaming Top-N — semantics of
    * flink-table-runtime/.../operators/rank/AppendOnlyTopNFunction.java:52:
    * per key, keep the n smallest sort values seen so far; a new row that
    * enters the top-n emits +I for itself and -D for the evicted row.
    * State is the sorted top-n buffer (TopNBuffer.java:36), here a
    * ValueState holding the bounded sorted list.
    */
  case class Ranked(key: String, id: Long, sort: Long)
  case class TopNState(items: Seq[Ranked])

  class AppendOnlyTopNProcessor(n: Int)
      extends StatefulProcessor[String, Ranked, Change[String, Ranked]] {
    @transient private var buf: ValueState[TopNState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getValueState[TopNState]("topn",
        Encoders.product[TopNState], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[Ranked],
        timerValues: TimerValues): Iterator[Change[String, Ranked]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Change[String, Ranked]]
      var cur: Seq[Ranked] = if (buf.exists()) buf.get().items else Nil
      rows.foreach { r =>
        val inserted = (r +: cur).sortBy(x => (x.sort, x.id))
        if (inserted.take(n).exists(_ eq r)) {
          out += Change(Changelog.Insert, key, r)
          if (inserted.length > n)
            out += Change(Changelog.Delete, key, inserted(n))
          cur = inserted.take(n)
        }
        // row outside top-n: append-only input → never relevant again
      }
      buf.update(TopNState(cur))
      out.iterator
    }
  }

  /** Count window over a keyed stream — the reference's
    * `KeyedStream.countWindow` (KeyedStream.java:745): emit an aggregate
    * every `size` rows per key.
    */
  case class CountWindowResult(key: String, windowId: Long, sum: Long, n: Long)

  class CountWindowProcessor(size: Int)
      extends StatefulProcessor[String, Change[String, Long], CountWindowResult] {
    @transient private var pending: ValueState[CountWindowResult] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      pending = getHandle.getValueState[CountWindowResult]("pending",
        Encoders.product[CountWindowResult], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[Change[String, Long]],
        timerValues: TimerValues): Iterator[CountWindowResult] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[CountWindowResult]
      var cur = if (pending.exists()) pending.get()
        else CountWindowResult(key, 0L, 0L, 0L)
      rows.foreach { c =>
        cur = cur.copy(sum = cur.sum + c.value, n = cur.n + 1)
        if (cur.n == size) {
          out += cur
          cur = CountWindowResult(key, cur.windowId + 1, 0L, 0L)
        }
      }
      pending.update(cur)
      out.iterator
    }
  }

  // ---- typed-API entry points -------------------------------------------

  def keepFirst[K: Encoder, V: Encoder](ds: Dataset[V], keyFn: V => K): Dataset[V] =
    ds.groupByKey(keyFn)
      .transformWithState(new KeepFirstProcessor[K, V](implicitly[Encoder[V]]),
        TimeMode.None(), OutputMode.Update())

  def keepLast[K: Encoder, V: Encoder](ds: Dataset[V], keyFn: V => K)(
      implicit chEnc: Encoder[Change[K, V]]): Dataset[Change[K, V]] =
    ds.groupByKey(keyFn)
      .transformWithState(new KeepLastProcessor[K, V](implicitly[Encoder[V]]),
        TimeMode.None(), OutputMode.Update())
}
