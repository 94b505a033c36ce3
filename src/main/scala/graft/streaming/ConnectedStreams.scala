package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Two-input stateful patterns — the reference's connected streams /
  * broadcast state (DataStream.connect:255, (Keyed)BroadcastProcessFunction,
  * SURVEY.md §2.10): a control stream updates per-key (or global) rule
  * state; a data stream is processed against the latest rules. In the
  * micro-batch model both streams union into one keyed stream of tagged
  * envelopes, exactly the SURVEY §2.10 mapping.
  */
object ConnectedStreams {

  /** Tagged envelope: control rows carry a rule update, data rows a value. */
  case class Tagged(key: String, isControl: Boolean, threshold: Long, value: Long)
  case class Flagged(key: String, value: Long, threshold: Long)

  /** Per-key threshold filter whose threshold is updated by the control
    * stream (KeyedBroadcastProcessFunction parity): control rows set the
    * key's threshold; data rows pass through only when above it.
    * Control rows in a batch apply before that batch's data rows.
    */
  class ThresholdProcessor(defaultThreshold: Long)
      extends StatefulProcessor[String, Tagged, Flagged] {
    @transient private var thr: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      thr = getHandle.getValueState[Long]("thr", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[Tagged],
        timerValues: TimerValues): Iterator[Flagged] = {
      val (control, data) = rows.toSeq.partition(_.isControl)
      control.foreach(c => thr.update(c.threshold))
      val t = if (thr.exists()) thr.get() else defaultThreshold
      data.filter(_.value > t).map(d => Flagged(d.key, d.value, t)).iterator
    }
  }
}

/** Late-data side channel — the reference re-fires closed windows for
  * rows within `allowedLateness` and routes later rows to a side output
  * (WindowedStream.allowedLateness:113, sideOutputLateData:141). Spark
  * drops late rows inside the window operator with no re-fire; the
  * documented replacement (SURVEY.md §7.3 item 5) is this explicit
  * pre-aggregation split: rows older than the observed watermark go to a
  * side DataFrame the caller can sink separately, rows on time proceed to
  * the windowed aggregation.
  */
object LateData {

  /** Split a batch (or foreachBatch) DataFrame on a watermark timestamp:
    * (onTime, late). `watermark` is the engine-tracked low-water mark the
    * caller obtained from the previous batch's StreamingQueryProgress.
    */
  def sideOutputLate(df: DataFrame, tsCol: String,
      watermark: java.sql.Timestamp): (DataFrame, DataFrame) = {
    val onTime = df.filter(col(tsCol) >= lit(watermark))
    val late = df.filter(col(tsCol) < lit(watermark))
    (onTime, late)
  }
}
