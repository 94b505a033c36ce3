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
object Contiguity extends Enumeration { val Strict, Relaxed = Value }

case class Stage[E](
    name: String,
    predicate: E => Boolean,
    contiguity: Contiguity.Value,
    minTimes: Int,
    maxTimes: Int) // Int.MaxValue = unbounded (oneOrMore)

case class Pattern[E](stages: Vector[Stage[E]], withinMs: Option[Long] = None) {

  private def updLast(f: Stage[E] => Stage[E]): Pattern[E] =
    copy(stages = stages.init :+ f(stages.last))

  /** Additional condition on the current stage (Pattern.where:180). */
  def where(p: E => Boolean): Pattern[E] =
    updLast(s => s.copy(predicate = e => s.predicate(e) && p(e)))

  /** Strict contiguity: the very next event (Pattern.next:327). */
  def next(name: String)(p: E => Boolean): Pattern[E] =
    copy(stages = stages :+ Stage(name, p, Contiguity.Strict, 1, 1))

  /** Relaxed contiguity (Pattern.followedBy:356). */
  def followedBy(name: String)(p: E => Boolean): Pattern[E] =
    copy(stages = stages :+ Stage(name, p, Contiguity.Relaxed, 1, 1))

  /** Current stage may be skipped (Pattern.optional:397). */
  def optional: Pattern[E] = updLast(s => s.copy(minTimes = 0))

  /** Exactly n repetitions (Pattern.times:482). */
  def times(n: Int): Pattern[E] = updLast(s => s.copy(minTimes = n, maxTimes = n))

  /** Between from and to repetitions (Pattern.times(from,to)). */
  def times(from: Int, to: Int): Pattern[E] =
    updLast(s => s.copy(minTimes = from, maxTimes = to))

  /** One or more repetitions, greedy (Pattern.oneOrMore:415). */
  def oneOrMore: Pattern[E] = updLast(s => s.copy(minTimes = 1, maxTimes = Int.MaxValue))

  /** Bound first-to-last event time of a match (Pattern.within:272). */
  def within(ms: Long): Pattern[E] = copy(withinMs = Some(ms))
}

object Pattern {
  /** Start a pattern (Pattern.begin:153). */
  def begin[E](name: String)(p: E => Boolean): Pattern[E] =
    Pattern(Vector(Stage(name, p, Contiguity.Relaxed, 1, 1)))
}
