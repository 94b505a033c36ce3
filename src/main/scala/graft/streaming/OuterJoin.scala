package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** Stream–stream OUTER join with retractions — semantics of the
  * reference's StreamingJoinOperator
  * (flink-table-runtime/.../operators/join/stream/StreamingJoinOperator.java:36,
  * with AbstractStreamingJoinOperator.java:46 and the
  * OuterJoinRecordStateView association counting):
  *
  *   - an outer-side row with no matches is emitted null-padded (+I(l, null));
  *   - when the FIRST match arrives on the other side, the null-padded
  *     result is retracted (-D(l, null)) and the joined row emitted
  *     (+I(l, r)) — the core changelog-correctness behavior Spark's
  *     built-in watermarked outer join (which emits null padding only at
  *     watermark expiry and never retracts) cannot express;
  *   - when the LAST match leaves, the joined rows are retracted and the
  *     null-padded row re-emitted;
  *   - inner rows join/retract symmetrically.
  *
  * Both inputs union into one keyed stream of tagged envelopes (the
  * micro-batch two-input pattern, SURVEY.md §2.10). State: both sides'
  * rows per key — exactly the reference's JoinRecordStateView pair.
  */
object OuterJoin {

  sealed abstract class JoinType(val leftOuter: Boolean, val rightOuter: Boolean)
  case object Inner extends JoinType(false, false)
  case object LeftOuter extends JoinType(true, false)
  case object RightOuter extends JoinType(false, true)
  case object FullOuter extends JoinType(true, true)

  /** One input envelope: a row arriving on the left or right side of the
    * join, as an insert (isAdd) or a retraction of a prior insert.
    */
  case class JoinInput(key: String, isLeft: Boolean, isAdd: Boolean, id: Long)

  /** Emitted changelog row: leftId / rightId are null-padded with -1 (the
    * encoders-friendly stand-in for NULL in the id domain).
    */
  case class JoinOutput(kind: Byte, key: String, leftId: Long, rightId: Long)
  val NullId: Long = -1L

  case class SideState(leftIds: Seq[Long], rightIds: Seq[Long])

  class OuterJoinProcessor(joinType: JoinType)
      extends StatefulProcessor[String, JoinInput, JoinOutput] {
    @transient private var st: ValueState[SideState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SideState]("join",
        Encoders.product[SideState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[JoinInput],
        timerValues: TimerValues): Iterator[JoinOutput] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[JoinOutput]
      var s = if (st.exists()) st.get() else SideState(Nil, Nil)

      def joined(l: Long, r: Long, kind: Byte): Unit =
        out += JoinOutput(kind, key, l, r)

      rows.foreach { in =>
        // views of "this side" and "other side", normalized so the logic
        // below is written once (thisOuter: does THIS side null-pad?)
        val (same, other, thisOuter, otherOuter) =
          if (in.isLeft) (s.leftIds, s.rightIds, joinType.leftOuter, joinType.rightOuter)
          else (s.rightIds, s.leftIds, joinType.rightOuter, joinType.leftOuter)

        def emitJoined(id: Long, o: Long, kind: Byte): Unit =
          if (in.isLeft) joined(id, o, kind) else joined(o, id, kind)
        def emitPadded(id: Long, kind: Byte): Unit =
          if (in.isLeft) joined(id, NullId, kind) else joined(NullId, id, kind)
        def emitOtherPadded(o: Long, kind: Byte): Unit =
          if (in.isLeft) joined(NullId, o, kind) else joined(o, NullId, kind)

        if (in.isAdd) {
          if (other.isEmpty) {
            if (thisOuter) emitPadded(in.id, Changelog.Insert)
          } else {
            other.foreach(o => emitJoined(in.id, o, Changelog.Insert))
          }
          // first row on THIS side: other side's null-padded rows retract
          if (same.isEmpty && otherOuter)
            other.foreach { o =>
              emitOtherPadded(o, Changelog.Delete)
            }
          s = if (in.isLeft) s.copy(leftIds = s.leftIds :+ in.id)
              else s.copy(rightIds = s.rightIds :+ in.id)
        } else if (!same.contains(in.id)) {
          // retraction for a row never inserted: drop it (the same
          // no-accumulator-for-first-retraction rule as GroupAggFunction)
        } else {
          // retraction of a prior insert on this side
          val remaining = same.diff(Seq(in.id))
          if (other.isEmpty) {
            if (thisOuter) emitPadded(in.id, Changelog.Delete)
          } else {
            other.foreach(o => emitJoined(in.id, o, Changelog.Delete))
          }
          // last row on THIS side left: other side re-emits null padding
          if (remaining.isEmpty && same.nonEmpty && otherOuter)
            other.foreach(o => emitOtherPadded(o, Changelog.Insert))
          s = if (in.isLeft) s.copy(leftIds = remaining)
              else s.copy(rightIds = remaining)
        }
      }
      if (s.leftIds.isEmpty && s.rightIds.isEmpty) st.clear() else st.update(s)
      out.iterator
    }
  }
}
