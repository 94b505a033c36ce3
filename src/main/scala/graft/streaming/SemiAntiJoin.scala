package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** Stream–stream SEMI / ANTI join with retractions — semantics of the
  * reference's StreamingSemiAntiJoinOperator
  * (flink-table-runtime/.../operators/join/stream/StreamingSemiAntiJoinOperator.java:34):
  * both inputs are kept in keyed state; left rows are emitted (semi) or
  * suppressed (anti) according to the *current* right-side match count,
  * and a right-side arrival/departure RETRACTS previously emitted results
  * that it invalidates:
  *
  *   - SEMI: left row emitted +I while right count > 0; when the right
  *     count drops to 0, every left row is retracted (-D); when it rises
  *     from 0, every stored left row is (re-)emitted (+I).
  *   - ANTI: the mirror — left rows emitted while right count == 0,
  *     retracted when a right row arrives.
  *
  * Both sides union into one keyed stream of tagged envelopes (the
  * micro-batch two-input pattern, SURVEY.md §2.10).
  */
object SemiAntiJoin {

  /** isLeft: probe side row (id identifies it); otherwise right side, and
    * `delta` is +1 (insert) or -1 (delete) on the right match count.
    */
  case class JoinInput(key: String, isLeft: Boolean, id: Long, delta: Int)
  case class JoinOutput(kind: Byte, key: String, id: Long)

  case class JoinState(leftIds: Seq[Long], rightCount: Long)

  class SemiAntiProcessor(semi: Boolean)
      extends StatefulProcessor[String, JoinInput, JoinOutput] {
    @transient private var st: ValueState[JoinState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[JoinState]("join",
        Encoders.product[JoinState], TTLConfig.NONE)

    /** Is a left row currently emitted, given the right count? */
    private def emitted(rightCount: Long): Boolean =
      if (semi) rightCount > 0 else rightCount == 0

    override def handleInputRows(key: String, rows: Iterator[JoinInput],
        timerValues: TimerValues): Iterator[JoinOutput] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[JoinOutput]
      var s = if (st.exists()) st.get() else JoinState(Nil, 0L)
      rows.foreach { r =>
        if (r.isLeft) {
          s = s.copy(leftIds = s.leftIds :+ r.id)
          if (emitted(s.rightCount))
            out += JoinOutput(Changelog.Insert, key, r.id)
        } else {
          val before = emitted(s.rightCount)
          s = s.copy(rightCount = s.rightCount + r.delta)
          val after = emitted(s.rightCount)
          if (before && !after)
            s.leftIds.foreach(id => out += JoinOutput(Changelog.Delete, key, id))
          else if (!before && after)
            s.leftIds.foreach(id => out += JoinOutput(Changelog.Insert, key, id))
        }
      }
      st.update(s)
      out.iterator
    }
  }
}
