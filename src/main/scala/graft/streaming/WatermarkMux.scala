package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.streaming._

/** Multi-source watermark combination with idleness and alignment — the
  * reference's `WatermarkStrategy.withIdleness` (WatermarkStrategy.java:147)
  * / `withWatermarkAlignment` (:168) run through
  * `WatermarkOutputMultiplexer.java` and `WatermarksWithIdleness.java`:
  *
  *   - each source partition keeps a partial watermark (max event time
  *     minus the bounded-out-of-orderness delay);
  *   - the COMBINED watermark is the min over partial watermarks of
  *     ACTIVE (non-idle) partitions, monotonically non-decreasing
  *     (IndexedCombinedWatermarkStatus);
  *   - a partition with no events for `idleTimeout` is marked idle and
  *     leaves the min — a stalled partition no longer pins the stream's
  *     event-time clock; its first later event reactivates it;
  *   - if EVERY partition is idle the combined watermark holds.
  *
  * Spark's engine watermark is a single min over all partitions with no
  * idleness knob (SURVEY §2.10) — one stalled Kafka partition stalls
  * event time forever. Here the combination runs at the SOURCE layer
  * (where the reference runs it): the replay source drives [[Mux.advance]]
  * once per fetch round and stamps each batch with the combined
  * watermark as a dedicated event-time column. Downstream, the engine's
  * own watermark on that column IS the combined watermark (delay 0,
  * values monotone by construction), so event-time timers fire from the
  * idleness-aware clock, and [[IdleTumbleProcessor]] windows close even
  * while a partition is stalled.
  *
  * Alignment (`withWatermarkAlignment`): the reference PAUSES reading
  * splits whose local watermark runs more than `maxDrift` ahead of the
  * group minimum. That is likewise a source-side behavior:
  * [[alignRounds]] paces per-source queues into fetch rounds under the
  * pause rule — a source emits only while its pre-release watermark is
  * within `maxDrift` of the group min — bounding the in-flight
  * event-time spread (and so the window state a downstream join/agg must
  * buffer) at any scale.
  */
object WatermarkMux {

  /** Partial watermark of one source partition. `maxTs` is
    * `Long.MinValue` until the first event (an un-started active source
    * holds the combined watermark down, exactly the reference's
    * `IndexedCombinedWatermarkStatus` aggregation).
    */
  case class SourceWm(maxTs: Long, idleRounds: Int, idle: Boolean)

  /** Deterministic multiplexer state. Idleness is counted in fetch
    * ROUNDS (the replay's processing-time analogue — wall clock would
    * break replay determinism); `idleTimeoutRounds` rounds without an
    * event marks the source idle.
    */
  case class Mux(delayMs: Long, idleTimeoutRounds: Int,
      sources: Map[Int, SourceWm], combined: Long) {

    /** One fetch round: `observedMaxTs` carries the max event timestamp
      * each source produced this round (absent = no events).
      */
    def advance(observedMaxTs: Map[Int, Long]): Mux = {
      val next = sources.map { case (id, sw) =>
        id -> (observedMaxTs.get(id) match {
          case Some(ts) => SourceWm(math.max(sw.maxTs, ts), 0, idle = false)
          case None =>
            val n = sw.idleRounds + 1
            SourceWm(sw.maxTs, n, idle = n >= idleTimeoutRounds)
        })
      }
      val active = next.values.filterNot(_.idle)
      val candidate =
        if (active.isEmpty) combined // all idle: hold
        else active.map(sw =>
          if (sw.maxTs == Long.MinValue) Long.MinValue
          else sw.maxTs - delayMs).min
      copy(sources = next, combined = math.max(combined, candidate))
    }
  }

  def init(sourceIds: Seq[Int], delayMs: Long,
      idleTimeoutRounds: Int): Mux = {
    require(idleTimeoutRounds >= 1, "idle timeout must be >= 1 round")
    Mux(delayMs, idleTimeoutRounds,
      sourceIds.map(_ -> SourceWm(Long.MinValue, 0, idle = false)).toMap,
      Long.MinValue)
  }

  /** Watermark-alignment pacing (WatermarkAlignmentParams / the source
    * coordinator's pause-resume protocol): drain per-source queues
    * (each already in event-time order) into fetch rounds of at most
    * `rowsPerRound` rows per source per round, where a source releases a
    * row only while its CURRENT watermark (last released timestamp) is
    * within `maxDriftMs` of the group min — sources that ran ahead
    * pause until the slowest catches up. A source that IS at the group
    * min always progresses, so the drain cannot live-lock; drained
    * sources leave the min (the reference treats finished splits as
    * idle). Returns the released rounds — the replay's micro-batches.
    */
  def alignRounds[T](perSource: Map[Int, Vector[T]], tsOf: T => Long,
      maxDriftMs: Long, rowsPerRound: Int): Seq[Seq[(Int, T)]] = {
    require(rowsPerRound >= 1)
    val queues = scala.collection.mutable.Map.empty[Int, Vector[T]]
    perSource.foreach { case (k, v) => queues(k) = v }
    val wm = scala.collection.mutable.Map.empty[Int, Long]
    perSource.keys.foreach(k => wm(k) = Long.MinValue)
    val rounds = scala.collection.mutable.ArrayBuffer.empty[Seq[(Int, T)]]
    while (queues.values.exists(_.nonEmpty)) {
      val round = scala.collection.mutable.ArrayBuffer.empty[(Int, T)]
      // deterministic source order within a round
      queues.keys.toSeq.sorted.foreach { id =>
        var released = 0
        var go = true
        while (go && released < rowsPerRound && queues(id).nonEmpty) {
          val liveMin = queues.collect {
            case (k, q) if q.nonEmpty => wm(k)
          }.min
          if (wm(id) <= liveMin + maxDriftMs || wm(id) == liveMin) {
            val row = queues(id).head
            queues(id) = queues(id).tail
            wm(id) = math.max(wm(id), tsOf(row))
            round += ((id, row))
            released += 1
          } else go = false // paused: ran ahead of the group min
        }
      }
      rounds += round.toSeq
    }
    rounds.toSeq
  }

  /** Replay tagged per-source fetch rounds through the multiplexer:
    * each round advances the mux from the round's per-source max event
    * ts and stamps the round's rows with the resulting combined
    * watermark — the source-side watermark emission the engine column
    * then rides on. Rounds before any watermark exists stamp epoch 0
    * (engine watermarks cannot be negative).
    */
  def stamp(rounds: Seq[Seq[(Int, (String, Long))]], delayMs: Long,
      idleTimeoutRounds: Int): Seq[Seq[MuxIn]] = {
    var m = init(rounds.flatMap(_.map(_._1)).distinct.sorted, delayMs,
      idleTimeoutRounds)
    rounds.map { r =>
      val obs = r.groupBy(_._1).map { case (id, rs) =>
        id -> rs.map(_._2._2).max
      }
      m = m.advance(obs)
      val wm = math.max(m.combined, 0L)
      r.map { case (_, (et, t)) =>
        MuxIn(et, new java.sql.Timestamp(t), new java.sql.Timestamp(wm))
      }
    }
  }

  /** Input row for the idleness-aware window count: `wmTs` is the
    * combined multiplexer watermark stamped by the source at the row's
    * fetch round — the column the engine watermark rides on.
    */
  case class MuxIn(etype: String, ts: java.sql.Timestamp,
      wmTs: java.sql.Timestamp)

  case class MuxWin(etype: String, ws: Long, n: Long)

  /** Tumbling count per (etype, window) driven by the STAMPED combined
    * watermark rather than a per-row event-time watermark: windows
    * close (append-only +I, exactly once) when the combined clock —
    * which keeps advancing past an idle partition — passes the window
    * end. Rows whose window already closed are dropped (the reference's
    * window-operator late-drop; the stamped clock makes that band
    * explicit). One MapState entry per OPEN window per key; timers per
    * window end — state bounded by the idle/alignment horizon, not the
    * corpus.
    */
  class IdleTumbleProcessor(windowMs: Long)
      extends StatefulProcessor[String, MuxIn, MuxWin] {
    @transient private var open: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getMapState[Long, Long]("open",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    private def bucket(tsMs: Long): Long = tsMs - Math.floorMod(tsMs, windowMs)

    override def handleInputRows(key: String, rows: Iterator[MuxIn],
        timerValues: TimerValues): Iterator[MuxWin] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      // fold the batch locally first — one state op per TOUCHED WINDOW
      // instead of one per row (the reference's mini-batch window
      // aggregation; at corpus scale the state backend sees the window
      // count, not the row count)
      val local = scala.collection.mutable.LongMap.empty[Long]
      rows.foreach { r =>
        val ws = bucket(r.ts.getTime)
        if (ws + windowMs > wm) // window still open under the combined clock
          local.update(ws, local.getOrElse(ws, 0L) + 1L)
        // else: closed-window late row — dropped, reference semantics
      }
      local.foreach { case (ws, n) =>
        val had = open.containsKey(ws)
        open.updateValue(ws, (if (had) open.getValue(ws) else 0L) + n)
        if (!had) getHandle.registerTimer(ws + windowMs)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[MuxWin] = {
      val fireAt = expiredTimerInfo.getExpiryTimeInMs()
      val fired = scala.collection.mutable.ArrayBuffer.empty[MuxWin]
      open.iterator().foreach { case (ws, n) =>
        if (ws + windowMs <= fireAt) fired += MuxWin(key, ws, n)
      }
      fired.foreach(w => open.removeKey(w.ws))
      fired.sortBy(_.ws).iterator
    }
  }

  /** Streaming entry: tumbling counts per (etype, window) under the
    * combined clock. The input must already carry the stamped `wmTs`
    * column; the engine watermark on it becomes the timer clock. The
    * 1 ms delay matters: when the combined clock holds FLAT (an idle
    * scenario's defining shape), the next batch's stamps EQUAL the
    * engine watermark, and the engine's late filter would silently drop
    * those rows at the boundary — one tick of delay keeps every stamp
    * strictly ahead while leaving the timer clock 1 ms behind the
    * combined watermark (invisible at window granularity).
    */
  def idleTumbleCounts(in: org.apache.spark.sql.Dataset[MuxIn],
      windowMs: Long): DataFrame = {
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[MuxWin]
    in.withWatermark("wmTs", "1 millisecond").as[MuxIn](Encoders.product[MuxIn])
      .groupByKey(_.etype)
      .transformWithState(new IdleTumbleProcessor(windowMs),
        TimeMode.EventTime(), OutputMode.Append()).toDF()
  }
}
