package graft.streaming

import java.time.Duration

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** Stream–stream INNER/OUTER join with retractions — semantics of the
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
  * micro-batch two-input pattern, SURVEY.md §2.10).
  *
  * State layout mirrors the reference's JoinRecordStateView pair: one
  * MapState[payload → count] PER SIDE, so a duplicate row increments a
  * counter instead of appending to a list, point lookups are O(1) (no
  * Seq.contains scans), and a retraction decrements/removes in O(1).
  * "Side empty" / "side will empty" checks read per-side distinct-entry
  * counters held in chunk-local variables (one state read/write per chunk).
  * Optional TTL (InputRecordStateTtl in the reference planner,
  * table.exec.state.ttl) bounds state for keys that stop receiving input.
  */
object OuterJoin {

  sealed abstract class JoinType(val leftOuter: Boolean, val rightOuter: Boolean)
  case object Inner extends JoinType(false, false)
  case object LeftOuter extends JoinType(true, false)
  case object RightOuter extends JoinType(false, true)
  case object FullOuter extends JoinType(true, true)

  /** One input envelope: a row arriving on the left or right side of the
    * join (exactly one of `left`/`right` is set), as an insert (isAdd) or a
    * retraction of a prior insert.
    */
  case class JoinInput[K, L, R](key: K, isLeft: Boolean, isAdd: Boolean,
      left: Option[L], right: Option[R])

  /** Emitted changelog row: the unmatched side is None (SQL NULL padding). */
  case class JoinOutput[K, L, R](kind: Byte, key: K, left: Option[L], right: Option[R])

  object JoinInput {
    def addLeft[K, L, R](key: K, l: L): JoinInput[K, L, R] =
      JoinInput(key, isLeft = true, isAdd = true, Some(l), None)
    def addRight[K, L, R](key: K, r: R): JoinInput[K, L, R] =
      JoinInput(key, isLeft = false, isAdd = true, None, Some(r))
    def retractLeft[K, L, R](key: K, l: L): JoinInput[K, L, R] =
      JoinInput(key, isLeft = true, isAdd = false, Some(l), None)
    def retractRight[K, L, R](key: K, r: R): JoinInput[K, L, R] =
      JoinInput(key, isLeft = false, isAdd = false, None, Some(r))
  }

  class OuterJoinProcessor[K, L, R](joinType: JoinType,
      lEnc: Encoder[L], rEnc: Encoder[R], stateTtl: Option[Duration] = None)
      extends StatefulProcessor[K, JoinInput[K, L, R], JoinOutput[K, L, R]] {

    @transient private var leftSt: MapState[L, Long] = _
    @transient private var rightSt: MapState[R, Long] = _
    // distinct-entry count per side: the empty / first-row / will-empty
    // checks become chunk-local reads instead of a state-store iterator
    // creation per input row (3 per row — the dominant fixed per-record
    // cost at volume). With TTL configured, entries expire behind a
    // counter's back, so the iterator-probe path stays authoritative there.
    @transient private var leftN: ValueState[Long] = _
    @transient private var rightN: ValueState[Long] = _
    private val exactCounts = stateTtl.isEmpty

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttl = stateTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
      leftSt = getHandle.getMapState[L, Long]("left", lEnc, Encoders.scalaLong, ttl)
      rightSt = getHandle.getMapState[R, Long]("right", rEnc, Encoders.scalaLong, ttl)
      leftN = getHandle.getValueState[Long]("leftN", Encoders.scalaLong, TTLConfig.NONE)
      rightN = getHandle.getValueState[Long]("rightN", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: K, rows: Iterator[JoinInput[K, L, R]],
        timerValues: TimerValues): Iterator[JoinOutput[K, L, R]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[JoinOutput[K, L, R]]

      def emitN(n: Long)(o: JoinOutput[K, L, R]): Unit = {
        var i = 0L; while (i < n) { out += o; i += 1 }
      }

      // chunk-local counters: read once per chunk, write back once
      var nLeft = if (exactCounts && leftN.exists()) leftN.get() else 0L
      var nRight = if (exactCounts && rightN.exists()) rightN.get() else 0L

      rows.foreach { in =>
        if (in.isLeft) process[L, R](key, in.left.get, in.isAdd, leftSt, rightSt,
          joinType.leftOuter, joinType.rightOuter,
          (k, l, r) => JoinOutput(0: Byte, k, l, r), out, emitN,
          () => nLeft, d => nLeft += d, () => nRight)
        else process[R, L](key, in.right.get, in.isAdd, rightSt, leftSt,
          joinType.rightOuter, joinType.leftOuter,
          (k, r, l) => JoinOutput(0: Byte, k, l, r), out, emitN,
          () => nRight, d => nRight += d, () => nLeft)
      }
      if (exactCounts) { leftN.update(nLeft); rightN.update(nRight) }
      out.iterator
    }

    /** One input record on side `same` (payload type A) against side
      * `other` (payload type B), written once for both orientations via
      * `mk(key, thisSide, otherSide)` which re-orders into (left, right).
      */
    private def process[A, B](key: K, p: A, isAdd: Boolean,
        same: MapState[A, Long], other: MapState[B, Long],
        thisOuter: Boolean, otherOuter: Boolean,
        mk: (K, Option[A], Option[B]) => JoinOutput[K, L, R],
        out: scala.collection.mutable.ArrayBuffer[JoinOutput[K, L, R]],
        emitN: Long => JoinOutput[K, L, R] => Unit,
        sameN: () => Long, bumpSame: Long => Unit, otherN: () => Long): Unit = {

      def withKind(kind: Byte)(o: JoinOutput[K, L, R]) = o.copy(kind = kind)

      if (isAdd) {
        // O(1): does the other side have any row / is this the first row here?
        val otherEmpty =
          if (exactCounts) otherN() == 0L else !other.iterator().hasNext
        val firstOnThisSide =
          if (exactCounts) sameN() == 0L else !same.iterator().hasNext
        if (otherEmpty) {
          if (thisOuter) out += withKind(Changelog.Insert)(mk(key, Some(p), None))
        } else {
          other.iterator().foreach { case (o, cnt) =>
            // reference order: retract the match's null-padding first,
            // then emit the joined row (StreamingJoinOperator retract-then-emit)
            if (firstOnThisSide && otherOuter)
              emitN(cnt)(withKind(Changelog.Delete)(mk(key, None, Some(o))))
            emitN(cnt)(withKind(Changelog.Insert)(mk(key, Some(p), Some(o))))
          }
        }
        val prev = if (same.containsKey(p)) same.getValue(p) else 0L
        if (prev == 0L) bumpSame(1L)
        same.updateValue(p, prev + 1L)
      } else if (!same.containsKey(p)) {
        // retraction for a row never inserted: drop it (the same
        // no-accumulator-for-first-retraction rule as GroupAggFunction)
      } else {
        val cnt = same.getValue(p)
        // O(1): after removing one instance of p, is this side empty?
        // (true iff the side's only entry is (p, 1))
        val willBeEmpty =
          if (exactCounts) sameN() == 1L && cnt == 1L
          else {
            val it = same.iterator()
            val first = it.next()
            !it.hasNext && first._1 == p && first._2 == 1L
          }
        val otherEmpty =
          if (exactCounts) otherN() == 0L else !other.iterator().hasNext
        if (otherEmpty) {
          if (thisOuter) out += withKind(Changelog.Delete)(mk(key, Some(p), None))
        } else {
          other.iterator().foreach { case (o, cnt) =>
            emitN(cnt)(withKind(Changelog.Delete)(mk(key, Some(p), Some(o))))
            // last row on THIS side left: the match re-emits null padding
            if (willBeEmpty && otherOuter)
              emitN(cnt)(withKind(Changelog.Insert)(mk(key, None, Some(o))))
          }
        }
        if (cnt <= 1L) { same.removeKey(p); bumpSame(-1L) }
        else same.updateValue(p, cnt - 1L)
      }
    }
  }

  /** Dataset-level entry point: union two changelog-tagged sides (rowkind
    * per Changelog's byte constants) into the envelope stream and run the
    * keyed join processor. Pass `stateTtl` to bound state for idle keys
    * (requires a processing-time query); the default keeps state until
    * both sides' rows for a key are retracted.
    */
  def outerJoin[K: Encoder: TypeTag, L: Encoder: TypeTag, R: Encoder: TypeTag](
      left: Dataset[(K, Byte, L)], right: Dataset[(K, Byte, R)],
      joinType: JoinType, stateTtl: Option[Duration] = None): Dataset[JoinOutput[K, L, R]] = {
    implicit val inEnc: Encoder[JoinInput[K, L, R]] = Encoders.product[JoinInput[K, L, R]]
    implicit val outEnc: Encoder[JoinOutput[K, L, R]] = Encoders.product[JoinOutput[K, L, R]]
    val env = left.map { case (k, kind, l) =>
        JoinInput[K, L, R](k, isLeft = true, Changelog.isAdd(kind), Some(l), None) }
      .union(right.map { case (k, kind, r) =>
        JoinInput[K, L, R](k, isLeft = false, Changelog.isAdd(kind), None, Some(r)) })
    val timeMode = if (stateTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    env.groupByKey(_.key)
      .transformWithState(
        new OuterJoinProcessor[K, L, R](joinType,
          implicitly[Encoder[L]], implicitly[Encoder[R]], stateTtl),
        timeMode, OutputMode.Update())
  }
}
