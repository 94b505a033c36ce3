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
      tsFn: E => Long, pattern: Pattern[E],
      skip: AfterMatchSkip = AfterMatchSkip.SkipPastLastRow)(
      implicit outEnc: Encoder[CepMatch[E]]): Dataset[CepMatch[E]] = {
    implicit val strEnc: Encoder[String] = Encoders.STRING
    val nfa = new NFA[E](pattern, tsFn)
    events.groupByKey(keyFn).flatMapGroups { (key, it) =>
      val sorted = it.toIndexedSeq.sortBy(tsFn)
      nfa.findMatches(sorted, 0, skip).iterator.map { case (s, e, m) =>
        CepMatch(key, tsFn(sorted(s)), tsFn(sorted(e)), m)
      }
    }
  }

  /** One micro-batch step of the streaming buffer: merge the new rows
    * into the (already sorted) retained buffer, scan incrementally, trim
    * matched prefixes and expired events. Pure so the state-bound
    * properties are directly testable.
    *
    * Scale properties (the reference's NFA prunes computation states the
    * same way, CepOperator.advanceTime):
    *   - the stored buffer stays sorted, so a batch costs
    *     O(buffer + batch·log batch) — no full re-sort;
    *   - only anchors whose within-window overlaps the new events are
    *     re-scanned: an older anchor saw an identical window in a prior
    *     batch and is known-failed;
    *   - events behind `maxTs − within` can never join a future match
    *     (every stage consumes events at or after its anchor) → evicted;
    *   - without `within`, `maxBufferPerKey` caps state per key, dropping
    *     oldest events first (documented lossy bound).
    *
    * Returns (matches over the merged buffer, retained buffer — sorted).
    */
  def step[E](existingSorted: IndexedSeq[E], freshUnsorted: Seq[E],
      pattern: Pattern[E], nfa: NFA[E], tsFn: E => Long,
      maxBufferPerKey: Option[Int]): (Seq[(Int, Int, Seq[(String, Seq[E])])], IndexedSeq[E]) = {
    if (freshUnsorted.isEmpty) return (Nil, existingSorted)
    val fresh = freshUnsorted.sortBy(tsFn)
    // linear merge of two sorted runs (stable: existing first on ties)
    val all = {
      val b = Vector.newBuilder[E]; b.sizeHint(existingSorted.length + fresh.length)
      var i = 0; var j = 0
      while (i < existingSorted.length && j < fresh.length) {
        if (tsFn(existingSorted(i)) <= tsFn(fresh(j))) { b += existingSorted(i); i += 1 }
        else { b += fresh(j); j += 1 }
      }
      while (i < existingSorted.length) { b += existingSorted(i); i += 1 }
      while (j < fresh.length) { b += fresh(j); j += 1 }
      b.result()
    }
    val scanFrom = pattern.withinMs match {
      case Some(w) =>
        val frontier = tsFn(fresh.head) - w
        all.indexWhere(e => tsFn(e) >= frontier) match {
          case -1 => all.length
          case i => i
        }
      case None => 0
    }
    val matches = nfa.findMatches(all, scanFrom)
    // trim everything up to the last match end (skip past last row);
    // expire events whose within-window closed behind the newest event
    val afterMatches =
      if (matches.isEmpty) all
      else all.drop(matches.last._2 + 1)
    val expired = pattern.withinMs match {
      case Some(w) if afterMatches.nonEmpty =>
        val horizon = tsFn(all.last) - w
        afterMatches.filter(e => tsFn(e) >= horizon)
      case _ => afterMatches
    }
    val retained = maxBufferPerKey match {
      case Some(cap) if expired.length > cap => expired.takeRight(cap)
      case _ => expired
    }
    (matches, retained.toIndexedSeq)
  }

  class CepProcessor[E](pattern: Pattern[E], tsFn: E => Long, eventEnc: Encoder[E],
      maxBufferPerKey: Option[Int] = None)
      extends StatefulProcessor[String, E, CepMatch[E]] {
    @transient private var buf: ListState[E] = _
    private val nfa = new NFA[E](pattern, tsFn)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[E]("buffer", eventEnc, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[E],
        timerValues: TimerValues): Iterator[CepMatch[E]] = {
      val existing = buf.get().toIndexedSeq // stored sorted
      val (matches, retained) =
        step(existing, rows.toSeq, pattern, nfa, tsFn, maxBufferPerKey)
      val out = matches.map { case (_, _, m) =>
        // first/last consumed event bound the match (optional stages may
        // be empty, so flatten rather than reading head/last stages)
        val evs = m.flatMap(_._2)
        CepMatch(key, tsFn(evs.head), tsFn(evs.last), m)
      }
      buf.clear()
      retained.foreach(buf.appendValue)
      out.iterator
    }
  }

  /** Streaming CEP over a keyed stream (CepOperator parity, arrival-order
    * processing within the state buffer). The per-key buffer must be
    * bounded: either the pattern carries `within` (events behind the
    * window are evicted, as the reference's NFA prunes by watermark) or
    * an explicit `maxBufferPerKey` cap is given (oldest dropped).
    */
  def streaming[E: Encoder](events: Dataset[E], keyFn: E => String,
      tsFn: E => Long, pattern: Pattern[E],
      maxBufferPerKey: Option[Int] = None)(
      implicit outEnc: Encoder[CepMatch[E]]): Dataset[CepMatch[E]] = {
    require(pattern.withinMs.isDefined || maxBufferPerKey.isDefined,
      "streaming CEP needs a state bound: give the pattern `within` or pass maxBufferPerKey")
    implicit val strEnc: Encoder[String] = Encoders.STRING
    events.groupByKey(keyFn)
      .transformWithState(
        new CepProcessor[E](pattern, tsFn, implicitly[Encoder[E]], maxBufferPerKey),
        TimeMode.None(), OutputMode.Update())
  }
}
