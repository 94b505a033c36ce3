package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** Streaming as-of/temporal join — semantics of
  * flink-table-runtime/.../operators/join/temporal/TemporalRowTimeJoinOperator.java:78:
  * the right side is a versioned table (key → history of (ts, value));
  * each left probe row (key, ts) joins the right version that was current
  * at its timestamp.
  *
  * Watermark-driven, as the reference: BOTH sides buffer in keyed state
  * (left probes in ListState, right versions in MapState[ts → value]);
  * when the event-time watermark passes a probe's timestamp the probe is
  * resolved — at that point every version at or below its timestamp has
  * arrived (later ones would be late and are dropped), so out-of-order
  * arrival of probes and versions is handled exactly. After emission,
  * versions superseded at or below the watermark are garbage-collected
  * (the reference's cleanupState: only the latest version ≤ watermark
  * stays current for future probes), and emitted probes leave the
  * buffer — state is bounded by watermark lag plus one current version
  * per key. Late rows on either side are dropped.
  *
  * The resolve+GC core is the pure [[advance]], unit-testable without a
  * streaming query.
  */
object TemporalJoin {

  /** Union envelope: a left probe (isProbe, probeId) or a right version
    * (value effective from eventTime on). The TIMESTAMP column carries
    * the watermark through to the operator.
    */
  case class TemporalEvent(key: String, eventTime: java.sql.Timestamp,
      isProbe: Boolean, probeId: Long, value: Long)

  case class AsOfMatch(key: String, probeId: Long, probeTs: Long,
      versionTs: Long, value: Long, matched: Boolean)

  case class ProbeBuf(ts: Long, probeId: Long)

  /** Resolve all probes with ts ≤ wm against the version history, in
    * (ts, probeId) order, then GC versions superseded at or below wm.
    * Returns (matches, retained probes, version timestamps to remove).
    */
  def advance(key: String, probes: Seq[ProbeBuf], versions: Seq[(Long, Long)],
      wm: Long): (Seq[AsOfMatch], Seq[ProbeBuf], Seq[Long]) = {
    val sortedV = versions.sortBy(_._1).toIndexedSeq
    val (due, remaining) = probes.partition(_.ts <= wm)
    val out = due.sortBy(p => (p.ts, p.probeId)).map { p =>
      // latest version at or before the probe timestamp
      var lo = -1
      var i = 0
      while (i < sortedV.length && sortedV(i)._1 <= p.ts) { lo = i; i += 1 }
      if (lo >= 0) {
        val (vts, v) = sortedV(lo)
        AsOfMatch(key, p.probeId, p.ts, vts, v, matched = true)
      } else AsOfMatch(key, p.probeId, p.ts, -1L, -1L, matched = false)
    }
    // keep the latest version ≤ wm (still current) and everything after it
    val current = sortedV.lastIndexWhere(_._1 <= wm)
    val evict = if (current <= 0) Nil else sortedV.take(current).map(_._1)
    (out, remaining, evict)
  }

  class TemporalJoinProcessor
      extends StatefulProcessor[String, TemporalEvent, AsOfMatch] {
    @transient private var probes: ListState[ProbeBuf] = _
    @transient private var versions: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      probes = getHandle.getListState[ProbeBuf]("probes",
        Encoders.product[ProbeBuf], TTLConfig.NONE)
      versions = getHandle.getMapState[Long, Long]("versions",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[TemporalEvent],
        timerValues: TimerValues): Iterator[AsOfMatch] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      rows.foreach { e =>
        val ts = e.eventTime.getTime
        if (ts > wm) { // late rows on either side are dropped
          if (e.isProbe) probes.appendValue(ProbeBuf(ts, e.probeId))
          else versions.updateValue(ts, e.value)
          getHandle.registerTimer(ts)
        }
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[AsOfMatch] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val (out, remaining, evict) =
        advance(key, probes.get().toSeq, versions.iterator().toSeq, wm)
      if (out.nonEmpty) {
        probes.clear()
        remaining.foreach(probes.appendValue)
      }
      evict.foreach(versions.removeKey)
      out.iterator
    }
  }
}
