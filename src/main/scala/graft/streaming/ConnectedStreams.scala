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

  /** One named rule in the rules map: version + threshold (cents). */
  case class Rule(version: Long, thrCents: Long)

  /** Tagged envelope for [[BroadcastRulesProcessor]]: a control op
    * (PUT/REMOVE of a named rule) or a data row, on one fused keyed
    * stream so the cross-stream arrival order is pinned.
    */
  case class RuleEnv(key: String, isCtrl: Boolean, rule: String,
      isDel: Boolean, version: Long, thrCents: Long, dataId: Long,
      cents: Long)

  /** One emitted match: the data row × the live rule it passed (or the
    * `__none` sentinel when no rule passed — every data row is visible
    * in the output, so a dropped row is a detectable divergence).
    */
  case class RuleMatch(k: String, data_id: Long, rule_name: String,
      version: Long, thr_cents: Long)

  /** The reference's full broadcast-state shape — a MAP of named rules
    * (KeyedBroadcastProcessFunction over a MapStateDescriptor,
    * flink-streaming-java/.../co/KeyedBroadcastProcessFunction.java:61;
    * the classic rules-over-a-broadcast-stream pattern): control ops
    * PUT (rule, version, threshold) or REMOVE a rule; each data row is
    * evaluated against every live rule and emits one row per rule it
    * passes (value strictly above the rule's threshold), carrying the
    * rule's version — or the `__none` sentinel when nothing passes.
    *
    * Rows apply strictly in ARRIVAL order — a control op takes effect
    * for every later data row, including later rows of the same batch
    * (the reference's element-order contract on the fused stream; the
    * simpler [[ThresholdProcessor]] above keeps the
    * control-before-data-per-batch convention instead). One MapState
    * read per (key, batch); only rules touched by a control op are
    * written back — per-batch state I/O is O(live rules + touched).
    */
  class BroadcastRulesProcessor
      extends StatefulProcessor[String, RuleEnv, RuleMatch] {
    @transient private var rules: MapState[String, Rule] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      rules = getHandle.getMapState[String, Rule]("rules",
        Encoders.STRING, Encoders.product[Rule], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[RuleEnv],
        timerValues: TimerValues): Iterator[RuleMatch] = {
      // sorted so multi-rule emission order is deterministic per row
      val live = scala.collection.mutable.TreeMap.empty[String, Rule]
      rules.iterator().foreach { case (r, v) => live(r) = v }
      val touched = scala.collection.mutable.Set.empty[String]
      val out = scala.collection.mutable.ArrayBuffer.empty[RuleMatch]
      rows.foreach { e =>
        if (e.isCtrl) {
          touched += e.rule
          if (e.isDel) live.remove(e.rule)
          else live(e.rule) = Rule(e.version, e.thrCents)
        } else {
          var any = false
          live.foreach { case (r, v) =>
            if (e.cents > v.thrCents) {
              out += RuleMatch(e.key, e.dataId, r, v.version, v.thrCents)
              any = true
            }
          }
          if (!any) out += RuleMatch(e.key, e.dataId, "__none", -1L, -1L)
        }
      }
      // write back only the final image of rules a control op touched
      touched.foreach { r =>
        live.get(r) match {
          case Some(v) => rules.updateValue(r, v)
          case None => rules.removeKey(r)
        }
      }
      out.iterator
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
