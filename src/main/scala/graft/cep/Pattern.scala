package graft.cep

/** CEP pattern DSL — the engine's analogue of the reference's Pattern API
  * (/root/reference/flink-libraries/flink-cep/src/main/java/org/apache/flink/cep/pattern/Pattern.java:
  * begin:153, where:180, next:327, followedBy:356, optional:397,
  * oneOrMore:415, times:482, within:272).
  *
  * A pattern is a linear sequence of stages; each stage has a predicate,
  * a contiguity requirement vs the previous stage (STRICT = `next`,
  * RELAXED = `followedBy` — non-matching events may sit in between), and
  * a repetition quantifier (times / oneOrMore / optional). `within`
  * bounds first-to-last event time of a match.
  *
  * Matching semantics follow the reference's defaults: greedy quantifiers
  * with backtracking, AFTER MATCH SKIP PAST LAST ROW.
  */
object Contiguity extends Enumeration {
  /** Strict = `next`; Relaxed = `followedBy` (skip non-matching events,
    * deterministic first-match); AnyRelaxed = `followedByAny`
    * (non-deterministic: every candidate position is its own branch).
    */
  val Strict, Relaxed, AnyRelaxed = Value
}

case class Stage[E](
    name: String,
    predicate: E => Boolean,
    contiguity: Contiguity.Value,
    minTimes: Int,
    maxTimes: Int, // Int.MaxValue = unbounded (oneOrMore)
    // negative constraint BETWEEN the previous stage and this one:
    // (predicate, strict). strict (notNext:338) = only the immediately
    // following event is checked; relaxed (notFollowedBy:369) = no event
    // in the whole gap may match.
    notBefore: Option[(E => Boolean, Boolean)] = None,
    // loop-stop condition (Pattern.until:244): an event matching it ends
    // the stage's repetitions without being consumed.
    until: Option[E => Boolean] = None,
    // loop branch policy (Pattern.greedy:632): greedy loops contribute
    // only their longest extension per anchor; reluctant loops branch
    // over EVERY legal repetition count (the reference Pattern API's
    // default — this DSL defaults to greedy, the SQL MATCH_RECOGNIZE
    // default, so `.reluctant` opts into the reference behavior).
    greedyLoop: Boolean = true,
    // internal loop contiguity (Pattern.allowCombinations:612): when set,
    // repetitions after the first may skip matching events, branching
    // over every order-preserving combination.
    combinations: Boolean = false)

case class Pattern[E](stages: Vector[Stage[E]], withinMs: Option[Long] = None,
    // terminal notFollowedBy (legal only with `within`, as in the
    // reference): no matching event may occur after the last stage inside
    // the window.
    endNot: Option[E => Boolean] = None,
    // pending negative constraint to attach to the next positive stage
    private val pendingNot: Option[(E => Boolean, Boolean)] = None) {

  private def updLast(f: Stage[E] => Stage[E]): Pattern[E] =
    copy(stages = stages.init :+ f(stages.last))

  /** Additional condition on the current stage (Pattern.where:180). */
  def where(p: E => Boolean): Pattern[E] =
    updLast(s => s.copy(predicate = e => s.predicate(e) && p(e)))

  /** OR-alternative condition on the current stage (Pattern.or:200). */
  def or(p: E => Boolean): Pattern[E] =
    updLast(s => s.copy(predicate = e => s.predicate(e) || p(e)))

  /** At least n repetitions, greedy (Pattern.timesOrMore:577). */
  def timesOrMore(n: Int): Pattern[E] =
    updLast(s => s.copy(minTimes = n, maxTimes = Int.MaxValue))

  /** Strict contiguity: the very next event (Pattern.next:327). */
  def next(name: String)(p: E => Boolean): Pattern[E] =
    copy(stages = stages :+ Stage(name, p, Contiguity.Strict, 1, 1, pendingNot),
      pendingNot = None)

  /** Relaxed contiguity (Pattern.followedBy:356). */
  def followedBy(name: String)(p: E => Boolean): Pattern[E] =
    copy(stages = stages :+ Stage(name, p, Contiguity.Relaxed, 1, 1, pendingNot),
      pendingNot = None)

  /** Non-deterministic relaxed contiguity (Pattern.followedByAny:387):
    * every candidate event for this stage opens its own match branch —
    * surfaced by NFA.findMatches under AfterMatchSkip.NoSkip.
    */
  def followedByAny(name: String)(p: E => Boolean): Pattern[E] =
    copy(stages = stages :+ Stage(name, p, Contiguity.AnyRelaxed, 1, 1, pendingNot),
      pendingNot = None)

  /** Loop-stop condition for the current (looping) stage
    * (Pattern.until:244): repetitions end at the first event matching
    * `p`, which itself stays unconsumed.
    */
  def until(p: E => Boolean): Pattern[E] = updLast(s => s.copy(until = Some(p)))

  /** Restrict the current stage to events of a subtype
    * (Pattern.subtype:221) — predicate sugar over the class check.
    */
  def subtype(cls: Class[_]): Pattern[E] =
    updLast(s => s.copy(predicate = e => cls.isInstance(e) && s.predicate(e)))

  /** The immediately next event must NOT match (Pattern.notNext:338). */
  def notNext(p: E => Boolean): Pattern[E] = copy(pendingNot = Some((p, true)))

  /** No event matching `p` may occur before the next stage
    * (Pattern.notFollowedBy:369). If no positive stage follows, the
    * pattern must carry `within` and the constraint applies to the rest
    * of the window (use [[withinNot]] implicitly via `within`).
    */
  def notFollowedBy(p: E => Boolean): Pattern[E] = copy(pendingNot = Some((p, false)))

  /** Current stage may be skipped (Pattern.optional:397). */
  def optional: Pattern[E] = updLast(s => s.copy(minTimes = 0))

  /** Exactly n repetitions (Pattern.times:482). */
  def times(n: Int): Pattern[E] = updLast(s => s.copy(minTimes = n, maxTimes = n))

  /** Between from and to repetitions (Pattern.times(from,to)). */
  def times(from: Int, to: Int): Pattern[E] =
    updLast(s => s.copy(minTimes = from, maxTimes = to))

  /** One or more repetitions, greedy (Pattern.oneOrMore:415). */
  def oneOrMore: Pattern[E] = updLast(s => s.copy(minTimes = 1, maxTimes = Int.MaxValue))

  /** Repetitions of the current stage must be contiguous
    * (Pattern.consecutive — quantifier contiguity, NFA strict-internal).
    */
  def consecutive: Pattern[E] = updLast(s => s.copy(contiguity = Contiguity.Strict))

  /** Greedy looping — as many repetitions as possible, one branch per
    * anchor (Pattern.greedy:632). This DSL's default; present for
    * reference-API parity and to undo [[reluctant]].
    */
  def greedy: Pattern[E] = updLast(s => s.copy(greedyLoop = true))

  /** Reluctant looping — the reference Pattern API's default quantifier
    * behavior: every legal repetition count is its own match branch
    * (visible under NoSkip / followedByAny), shortest first.
    */
  def reluctant: Pattern[E] = updLast(s => s.copy(greedyLoop = false))

  /** Loop repetitions may skip matching events, branching over every
    * order-preserving combination (Pattern.allowCombinations:612).
    * Implies reluctant branching, as in the reference (greedy cannot be
    * combined with combinations).
    */
  def allowCombinations: Pattern[E] =
    updLast(s => s.copy(combinations = true, greedyLoop = false))

  /** Bound first-to-last event time of a match (Pattern.within:272). A
    * pending terminal notFollowedBy becomes the window-scoped negative
    * constraint, as in the reference (terminal notFollowedBy is legal
    * only with within).
    */
  def within(ms: Long): Pattern[E] = pendingNot match {
    case Some((p, false)) =>
      copy(withinMs = Some(ms), endNot = Some(p), pendingNot = None)
    case _ => copy(withinMs = Some(ms))
  }
}

object Pattern {
  /** Start a pattern (Pattern.begin:153). */
  def begin[E](name: String)(p: E => Boolean): Pattern[E] =
    Pattern(Vector(Stage(name, p, Contiguity.Relaxed, 1, 1)))
}
