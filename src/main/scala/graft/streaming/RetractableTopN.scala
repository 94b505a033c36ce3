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
  * State = the key's full id→sort map (the reference keeps the same in
  * its data-state map plus a sorted index; at n ≪ rows-per-key a
  * sorted-map index state would cut the re-rank cost — noted as the
  * optimization path).
  */
object RetractableTopN {

  /** kind: Insert/UpdateAfter upserts (id, sort); Delete removes id. */
  case class TopNChange(kind: Byte, key: String, id: Long, sort: Long)
  case class RowsState(ids: Seq[Long], sorts: Seq[Long])

  class RetractableTopNProcessor(n: Int)
      extends StatefulProcessor[String, TopNChange, TopNChange] {
    @transient private var st: ValueState[RowsState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[RowsState]("rows",
        Encoders.product[RowsState], TTLConfig.NONE)

    private def topN(m: Map[Long, Long]): Seq[(Long, Long)] =
      m.toSeq.sortBy { case (id, sort) => (sort, id) }.take(n)

    override def handleInputRows(key: String, rows: Iterator[TopNChange],
        timerValues: TimerValues): Iterator[TopNChange] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[TopNChange]
      var m: Map[Long, Long] =
        if (st.exists()) { val s = st.get(); s.ids.zip(s.sorts).toMap }
        else Map.empty
      rows.foreach { c =>
        val before = topN(m)
        m = c.kind match {
          case Changelog.Delete => m - c.id
          case _ => m + (c.id -> c.sort) // +I/+U upsert
        }
        val after = topN(m)
        val beforeM = before.toMap
        val afterM = after.toMap
        // leaves and changed-olds retract first (reference emit order)
        before.foreach { case (id, sort) =>
          if (!afterM.contains(id))
            out += TopNChange(Changelog.Delete, key, id, sort)
          else if (afterM(id) != sort)
            out += TopNChange(Changelog.UpdateBefore, key, id, sort)
        }
        after.foreach { case (id, sort) =>
          if (!beforeM.contains(id))
            out += TopNChange(Changelog.Insert, key, id, sort)
          else if (beforeM(id) != sort)
            out += TopNChange(Changelog.UpdateAfter, key, id, sort)
        }
      }
      st.update(RowsState(m.keys.toSeq, m.values.toSeq))
      out.iterator
    }
  }
}
