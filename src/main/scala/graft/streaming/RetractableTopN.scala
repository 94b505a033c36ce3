package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** Retractable / updatable streaming Top-N — semantics of the reference's
  * UpdatableTopNFunction.java:71 and RetractableTopNFunction.java:56
  * (flink-table-runtime/.../operators/rank/): the input is a changelog of
  * (id, sortValue) per key; every change re-ranks the key's rows and the
  * operator emits the DIFF of the visible top-n as a changelog —
  * rank-movement cascades included (a delete inside the top-n promotes
  * the first row below it; an update can move a row in or out).
  *
  * State = a point-addressable MapState (id → sort) mirrored into a
  * [[TopNIndex]] sorted set once per micro-batch — the reference's
  * treeMap + data-state shape. Per record: O(log m) index mutation +
  * O(n) boundary walk + one MapState point write; no full re-sort and
  * no monolithic whole-set state value.
  */
object RetractableTopN {

  /** kind: Insert/UpdateAfter upserts (id, sort); Delete removes id. */
  case class TopNChange(kind: Byte, key: String, id: Long, sort: Long)

  class RetractableTopNProcessor(n: Int, ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, TopNChange, TopNChange] {
    @transient private var idx: MapState[Long, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      idx = getHandle.getMapState[Long, Long]("idx",
        Encoders.scalaLong, Encoders.scalaLong, ttl)

    override def handleInputRows(key: String, rows: Iterator[TopNChange],
        timerValues: TimerValues): Iterator[TopNChange] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[TopNChange]
      val index = new TopNIndex[Long](n, Ordering.Long)
      index.load(idx.iterator().map { case (id, s) => (id, s) })
      rows.foreach { c =>
        val del = c.kind == Changelog.Delete
        if (del) idx.removeKey(c.id) else idx.updateValue(c.id, c.sort)
        index.apply(del, c.id, c.sort).foreach { v =>
          (v.oldSort, v.newSort) match {
            case (Some(os), None) =>
              out += TopNChange(Changelog.Delete, key, v.id, os)
            case (Some(os), Some(ns)) =>
              out += TopNChange(Changelog.UpdateBefore, key, v.id, os)
              out += TopNChange(Changelog.UpdateAfter, key, v.id, ns)
            case (None, Some(ns)) =>
              out += TopNChange(Changelog.Insert, key, v.id, ns)
            case _ =>
          }
        }
      }
      out.iterator
    }
  }
}
