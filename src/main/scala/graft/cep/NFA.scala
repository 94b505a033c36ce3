package graft.cep

/** Backtracking matcher over an ordered event sequence — the engine's
  * equivalent of the reference's NFA + SharedBuffer
  * (flink-libraries/flink-cep/.../nfa/NFA.java:85): greedy quantifiers
  * with backtracking, strict/relaxed contiguity, within-window pruning,
  * AFTER MATCH SKIP PAST LAST ROW.
  *
  * `timestampOf` supplies event time for the `within` constraint.
  */
class NFA[E](pattern: Pattern[E], timestampOf: E => Long) extends Serializable {

  /** One complete match: stage name → the events it consumed, in order. */
  type Match = Seq[(String, Seq[E])]

  /** Timed-out partial matches (the reference's CEP timeout side output,
    * PatternStream.select timeout variant / CepOperator timed-out
    * patterns): anchor events that begin a pattern but whose
    * within-window closed (relative to `nowTs`) without a complete
    * match. Only meaningful for patterns with `within`.
    */
  def findTimeouts(events: IndexedSeq[E], nowTs: Long): Seq[E] =
    pattern.withinMs match {
      case None => Nil
      case Some(w) =>
        val matched = findMatches(events)
        val covered = matched.flatMap { case (s, e, _) => s to e }.toSet
        events.indices
          .filter { i =>
            !covered.contains(i) &&
              pattern.stages.head.predicate(events(i)) &&
              timestampOf(events(i)) + w < nowTs &&
              matchAt(events, i).isEmpty
          }
          .map(events)
    }

  /** All non-overlapping matches over `events` (assumed time-ordered),
    * scanning left to right with skip-past-last-row after each match.
    * `from` skips anchors before that index — the incremental-scan entry
    * for streaming CEP, where anchors whose within-window closed before
    * any new event are known-failed (CEP.step).
    */
  def findMatches(events: IndexedSeq[E], from: Int = 0): Seq[(Int, Int, Match)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Match)]
    var start = from max 0
    while (start < events.length) {
      matchAt(events, start) match {
        case Some((endIdx, m)) =>
          out += ((start, endIdx, m))
          start = endIdx + 1 // SKIP PAST LAST ROW
        case None =>
          start += 1
      }
    }
    out.toSeq
  }

  /** Try to match the full pattern with the FIRST stage anchored at
    * `start` (the reference anchors match starts the same way: a match
    * begins at an event that satisfies the begin stage).
    */
  private def matchAt(events: IndexedSeq[E], start: Int): Option[(Int, Match)] = {
    if (!pattern.stages.head.predicate(events(start))) return None
    val deadline = pattern.withinMs.map(w => timestampOf(events(start)) + w)

    def inWindow(i: Int): Boolean =
      deadline.forall(d => timestampOf(events(i)) <= d)

    /** Match stage `si` starting at event index `ei`; returns last
      * consumed index + accumulated match, exploring greedily.
      */
    def stageRec(si: Int, ei: Int, acc: Match): Option[(Int, Match)] = {
      if (si == pattern.stages.length) return Some((ei - 1, acc))
      val st = pattern.stages(si)

      // collect candidate repetition runs at increasing counts, then try
      // the greediest first (reference default: greedy)
      def repRec(count: Int, at: Int, taken: Vector[E]): Option[(Int, Match)] = {
        // option A (only when enough reps consumed): close this stage
        lazy val closed =
          if (count >= st.minTimes)
            stageRec(si + 1, at, acc :+ (st.name -> taken))
          else None
        // option B: consume one more repetition (contiguity applies both
        // to a stage's first event and between its repetitions). A
        // negative constraint (notNext/notFollowedBy) guards the gap
        // before the stage's FIRST repetition only.
        lazy val extended: Option[(Int, Match)] = {
          val gapNot = if (count == 0) st.notBefore else None
          if (count >= st.maxTimes) None
          // notNext: the immediately following event must not match
          else if (gapNot.exists { case (p, strict) =>
            strict && at < events.length && p(events(at)) }) None
          else st.contiguity match {
            case Contiguity.Strict =>
              // strict: the repetition must sit exactly at `at`
              if (at < events.length && inWindow(at) && st.predicate(events(at)))
                repRec(count + 1, at + 1, taken :+ events(at))
              else None
            case Contiguity.Relaxed =>
              // relaxed: scan forward; on downstream failure backtrack to
              // the next candidate position. A relaxed negative
              // constraint (notFollowedBy) aborts the scan at the first
              // forbidden event in the gap.
              val relaxedNot = gapNot.collect { case (p, false) => p }
              var i = at
              var res: Option[(Int, Match)] = None
              var blocked = false
              while (res.isEmpty && !blocked && i < events.length && inWindow(i)) {
                if (st.predicate(events(i)))
                  res = repRec(count + 1, i + 1, taken :+ events(i))
                else if (relaxedNot.exists(_(events(i))))
                  blocked = true
                i += 1
              }
              res
          }
        }
        // greedy: prefer extending before closing
        extended.orElse(closed)
      }

      if (si == 0) {
        // begin stage anchored at `start`
        if (!inWindow(ei)) None
        else repRec(1, ei + 1,
          Vector(events(ei))) // first repetition = anchor event
      } else repRec(0, ei, Vector.empty)
    }

    // anchor consumes events(start) as the first repetition of stage 0
    stageRec(0, start, Vector.empty).filter { case (endIdx, _) =>
      // terminal notFollowedBy (legal only with within): no forbidden
      // event may occur after the last stage inside the window
      pattern.endNot.forall { p =>
        var j = endIdx + 1
        var ok = true
        while (ok && j < events.length && inWindow(j)) {
          if (p(events(j))) ok = false
          j += 1
        }
        ok
      }
    }
  }
}
