package graft.cep

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** CEP execution — the engine's CepOperator
  * (flink-libraries/flink-cep/.../operator/CepOperator.java:82) and
  * StreamExecMatch (MATCH_RECOGNIZE) equivalents:
  *
  *   - batch: sort each key's events by time, run the NFA with
  *     skip-past-last-row (the reference's BatchExecMatch does exactly
  *     sort-within-key + NFA);
  *   - streaming: a transformWithState processor holding the per-key
  *     ordered event buffer in state, re-scanning for complete matches as
  *     events arrive and trimming the buffer past each match.
  *
  * One shuffle on the key either way; NFA work is per-key local.
  */
object CEP {

  case class CepMatch[E](key: String, startTs: Long, endTs: Long,
      stages: Seq[(String, Seq[E])])

  /** Batch CEP over a bounded Dataset (BatchExecMatch parity). */
  def batch[E: Encoder](events: Dataset[E], keyFn: E => String,
      tsFn: E => Long, pattern: Pattern[E])(
      implicit outEnc: Encoder[CepMatch[E]]): Dataset[CepMatch[E]] = {
    implicit val strEnc: Encoder[String] = Encoders.STRING
    val nfa = new NFA[E](pattern, tsFn)
    events.groupByKey(keyFn).flatMapGroups { (key, it) =>
      val sorted = it.toIndexedSeq.sortBy(tsFn)
      nfa.findMatches(sorted).iterator.map { case (s, e, m) =>
        CepMatch(key, tsFn(sorted(s)), tsFn(sorted(e)), m)
      }
    }
  }

  /** Streaming CEP state: the per-key time-ordered event buffer — the
    * analogue of the reference's SharedBuffer, with buffer trimming past
    * each emitted match (skip-past-last-row) and within-window expiry.
    */
  case class CepBuffer[E](events: Seq[E])

  class CepProcessor[E](pattern: Pattern[E], tsFn: E => Long, eventEnc: Encoder[E])
      extends StatefulProcessor[String, E, CepMatch[E]] {
    @transient private var buf: ListState[E] = _
    private val nfa = new NFA[E](pattern, tsFn)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[E]("buffer", eventEnc, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[E],
        timerValues: TimerValues): Iterator[CepMatch[E]] = {
      val existing = buf.get().toSeq
      val all = (existing ++ rows).sortBy(tsFn).toIndexedSeq
      val matches = nfa.findMatches(all)
      val out = matches.map { case (s, e, m) =>
        CepMatch(key, tsFn(all(s)), tsFn(all(e)), m)
      }
      // trim everything up to the last match end (skip past last row);
      // expire events older than the within-window behind the newest event
      val afterMatches =
        if (matches.isEmpty) all
        else all.drop(matches.last._2 + 1)
      val retained = pattern.withinMs match {
        case Some(w) if afterMatches.nonEmpty =>
          val horizon = tsFn(all.last) - w
          afterMatches.filter(e => tsFn(e) >= horizon)
        case _ => afterMatches
      }
      buf.clear()
      retained.foreach(buf.appendValue)
      out.iterator
    }
  }

  /** Streaming CEP over a keyed stream (CepOperator parity, arrival-order
    * processing within the state buffer).
    */
  def streaming[E: Encoder](events: Dataset[E], keyFn: E => String,
      tsFn: E => Long, pattern: Pattern[E])(
      implicit outEnc: Encoder[CepMatch[E]]): Dataset[CepMatch[E]] = {
    implicit val strEnc: Encoder[String] = Encoders.STRING
    events.groupByKey(keyFn)
      .transformWithState(
        new CepProcessor[E](pattern, tsFn, implicitly[Encoder[E]]),
        TimeMode.None(), OutputMode.Update())
  }
}
