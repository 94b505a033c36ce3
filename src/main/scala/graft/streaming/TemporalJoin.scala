package graft.streaming

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming as-of/temporal join — semantics of
  * flink-table-runtime/.../operators/join/temporal/TemporalRowTimeJoinOperator.java:78:
  * the right side is a versioned table (key → history of (ts, value));
  * each left probe row (key, ts) joins the right version that was current
  * at its timestamp.
  *
  * State: a MapState per key from version-timestamp to value — the direct
  * analogue of the reference's indexed right-side state. Probe rows
  * arriving before any right version emit a null match (left join).
  *
  * This micro-batch implementation resolves probes against all versions
  * received so far (both sides keyed and co-partitioned by Spark's
  * state-store shuffle). Watermark-driven version GC — dropping versions
  * older than the watermark minus one — is the TTL story at scale; here
  * versions are retained for determinism of the specs.
  */
object TemporalJoin {

  case class ProbeOrVersion(key: String, ts: Long, isProbe: Boolean,
      probeId: Long, value: Long)
  case class AsOfMatch(key: String, probeId: Long, probeTs: Long,
      versionTs: Long, value: Long, matched: Boolean)

  class TemporalJoinProcessor
      extends StatefulProcessor[String, ProbeOrVersion, AsOfMatch] {
    @transient private var versions: MapState[Long, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      versions = getHandle.getMapState[Long, Long]("versions",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[ProbeOrVersion],
        timerValues: TimerValues): Iterator[AsOfMatch] = {
      // apply version updates before probes within the same micro-batch,
      // then resolve each probe against the latest version <= probe ts
      val (probes, updates) = rows.toSeq.partition(_.isProbe)
      updates.foreach(u => versions.updateValue(u.ts, u.value))
      val versionList = versions.iterator().toSeq.sortBy(_._1)
      probes.sortBy(_.ts).iterator.map { p =>
        versionList.filter(_._1 <= p.ts).lastOption match {
          case Some((vts, v)) => AsOfMatch(key, p.probeId, p.ts, vts, v, matched = true)
          case None => AsOfMatch(key, p.probeId, p.ts, -1L, -1L, matched = false)
        }
      }
    }
  }
}
