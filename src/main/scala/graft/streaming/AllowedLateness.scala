package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.streaming._

/** Allowed-lateness window re-fire + late side output — the reference's
  * `WindowedStream.allowedLateness` (WindowedStream.java:113) and
  * `sideOutputLateData` (:141), run by WindowOperator.java:101: a window
  * fires when the watermark passes its end, stays ALIVE for `lateness`
  * afterwards, re-fires an updated result for every late-but-allowed
  * element, and routes elements later than end+lateness to a side
  * output. Spark's built-in window agg drops everything behind the
  * watermark with no re-fire and no side channel (SURVEY §2.10), and the
  * engine filters input rows behind the watermark BEFORE they reach a
  * transformWithState operator — so the operator runs behind an
  * INFLATED watermark: the caller sets `withWatermark(col, D)` for any
  * D ≥ lateness + window and the processor recovers the reference's
  * watermark as `engineWM + D`. Engine filtering then removes only rows
  * more than D behind the reference watermark (the engine-level
  * numLateRecordsDropped tail); everything the reference would re-fire,
  * and a D-minus-lateness-wide band of what it would side-output,
  * reaches the processor.
  *
  * Protocol per (key, window): first (recovered-)watermark pass of `end`
  * emits +I; each allowed-late element immediately emits -U(old)/+U(new)
  * (the reference fires the window function per late element); state
  * clears when the watermark passes end+lateness; anything later emits a
  * `late=true` row (the side output) and touches no state. State is one
  * accumulator per live window — bounded by lateness, exactly the
  * reference's window-state retention story at any scale.
  *
  * Timer arithmetic under the inflation (delay D ≥ lateness + window,
  * engineWM = flinkWM - D, slack S = D - lateness - window): fire when
  * flinkWM ≥ end ⇔ engineWM ≥ ws - lateness - S; clean when flinkWM ≥
  * end + lateness ⇔ engineWM ≥ ws - S; a row is past the side-output
  * line when ws ≤ engineWM + S. Slack widens the processor-visible
  * too-late band (otherwise at most one window wide) at the price of S
  * extra event-time state retention.
  */
object AllowedLateness {

  /** Input: the watermarked event-time column must reach the operator. */
  case class LWIn(etype: String, eventTime: java.sql.Timestamp, id: Long)

  /** Changelog output; `late=true` rows are the side output (id = the
    * too-late element, n = -1); window rows carry (ws, n) with id = -1.
    */
  case class LWChange(kind: Byte, late: Boolean, etype: String,
      ws: Long, n: Long, id: Long)

  case class LWAcc(n: Long, fired: Boolean)

  class LatenessWindowProcessor(windowMs: Long, latenessMs: Long,
      delayMs: Long)
      extends StatefulProcessor[String, LWIn, LWChange] {
    require(delayMs >= windowMs + latenessMs,
      "watermark delay must cover lateness + window")
    private val slackMs = delayMs - windowMs - latenessMs
    @transient private var acc: ValueState[LWAcc] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[LWAcc]("acc",
        Encoders.product[LWAcc], TTLConfig.NONE)

    private def bucket(tsMs: Long): Long = tsMs - Math.floorMod(tsMs, windowMs)

    override def handleInputRows(key: String, rows: Iterator[LWIn],
        timerValues: TimerValues): Iterator[LWChange] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val out = scala.collection.mutable.ArrayBuffer.empty[LWChange]
      rows.foreach { r =>
        val ws = bucket(r.eventTime.getTime)
        if (ws <= wm + slackMs) { // flinkWM ≥ end+lateness: side output
          out += LWChange(Changelog.Insert, true, r.etype, ws, -1L, r.id)
        } else {
          val cur = if (acc.exists()) acc.get() else {
            // first element of this window: arm fire + cleanup timers
            getHandle.registerTimer(ws - latenessMs - slackMs)
            getHandle.registerTimer(ws - slackMs)
            LWAcc(0L, fired = false)
          }
          val next = cur.copy(n = cur.n + 1)
          if (cur.fired) { // allowed-late element: re-fire per element
            out += LWChange(Changelog.UpdateBefore, false, r.etype, ws, cur.n, -1L)
            out += LWChange(Changelog.UpdateAfter, false, r.etype, ws, next.n, -1L)
          }
          acc.update(next)
        }
      }
      out.iterator
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[LWChange] = {
      if (!acc.exists()) return Iterator.empty
      val sep = key.lastIndexOf('|')
      val etype = key.substring(0, sep)
      val ws = key.substring(sep + 1).toLong
      if (expiredTimerInfo.getExpiryTimeInMs() >= ws - slackMs) {
        acc.clear() // lateness horizon passed: drop the window's state
        Iterator.empty
      } else {
        val cur = acc.get()
        if (cur.fired) Iterator.empty
        else { // watermark passed the window end: initial firing
          acc.update(cur.copy(fired = true))
          Iterator.single(
            LWChange(Changelog.Insert, false, etype, ws, cur.n, -1L))
        }
      }
    }
  }

  /** DataFrame entry: tumbling count per (etype, window) with allowed
    * lateness. The input MUST carry `withWatermark("eventTime", delayMs)`
    * upstream — the inflation the processor's recovered-watermark
    * arithmetic assumes (see class doc).
    */
  def tumbleCounts(in: org.apache.spark.sql.Dataset[LWIn], windowMs: Long,
      latenessMs: Long, delayMs: Long): DataFrame = {
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[LWChange]
    in.groupByKey { r =>
      val ts = r.eventTime.getTime
      s"${r.etype}|${ts - Math.floorMod(ts, windowMs)}"
    }.transformWithState(
      new LatenessWindowProcessor(windowMs, latenessMs, delayMs),
      TimeMode.EventTime(), OutputMode.Update()).toDF()
  }
}
