package graft.cep

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the NFA over random event sequences and
  * random patterns — structural guarantees that must hold for EVERY
  * match set regardless of pattern shape:
  *
  *   - skip-past-last-row matches never overlap and are ordered;
  *   - every consumed segment satisfies its stage's predicate and
  *     repetition bounds, in stage order;
  *   - `within` bounds first-to-last consumed timestamps;
  *   - skip strategies are ordered by match count:
  *     PAST_LAST_ROW ≤ SKIP_TO_NEXT ≤ NO_SKIP;
  *   - strict-adjacency patterns consume contiguous index ranges.
  */
class NfaPropertySpec extends AnyFunSuite {

  private case class E(ts: Long, kind: Char)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  private val genEvents: Gen[IndexedSeq[E]] =
    Gen.listOf(Gen.oneOf('a', 'b', 'c')).map(ks =>
      ks.zipWithIndex.map { case (k, i) => E(i.toLong, k) }.toIndexedSeq)

  /** Random 1-3 stage pattern: per stage a kind predicate, quantifier,
    * and strict/relaxed contiguity.
    */
  private case class StageSpec(kind: Char, minT: Int, maxT: Int, strict: Boolean)

  private val genStage: Gen[StageSpec] = for {
    k <- Gen.oneOf('a', 'b', 'c')
    mn <- Gen.choose(1, 2)
    mx <- Gen.choose(mn, mn + 2)
    st <- Gen.oneOf(true, false)
  } yield StageSpec(k, mn, mx, st)

  private val genPattern: Gen[List[StageSpec]] =
    Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, genStage))

  private def build(specs: List[StageSpec]): Pattern[E] = {
    val head = specs.head
    var p = Pattern.begin[E](s"s0")(_.kind == head.kind).times(head.minT, head.maxT)
    if (head.strict) p = p.consecutive
    specs.tail.zipWithIndex.foreach { case (st, i) =>
      p = if (st.strict) p.next(s"s${i + 1}")(_.kind == st.kind)
          else p.followedBy(s"s${i + 1}")(_.kind == st.kind)
      p = p.times(st.minT, st.maxT)
      if (st.strict) p = p.consecutive
    }
    p
  }

  test("skip-past-last-row matches are ordered, non-overlapping, and well-formed") {
    check(Prop.forAll(genEvents, genPattern) { (events, specs) =>
      val pat = build(specs)
      val nfa = new NFA[E](pat, _.ts)
      val ms = nfa.findMatches(events)
      val spansOk = ms.forall { case (s, e, _) => s >= 0 && s <= e && e < events.length }
      val ordered = ms.sliding(2).forall {
        case Seq((_, e1, _), (s2, _, _)) => s2 > e1
        case _ => true
      }
      val wellFormed = ms.forall { case (_, _, m) =>
        m.map(_._1) == specs.indices.map(i => s"s$i") &&
          m.zip(specs).forall { case ((_, rows), st) =>
            rows.nonEmpty == true &&
            rows.size >= st.minT && rows.size <= st.maxT &&
            rows.forall(_.kind == st.kind)
          }
      }
      spansOk && ordered && wellFormed
    })
  }

  test("skip strategies are ordered by match count") {
    check(Prop.forAll(genEvents, genPattern) { (events, specs) =>
      val nfa = new NFA[E](build(specs), _.ts)
      val past = nfa.findMatches(events).size
      val next = nfa.findMatches(events, 0, AfterMatchSkip.SkipToNext).size
      val all = nfa.findMatches(events, 0, AfterMatchSkip.NoSkip).size
      past <= next && next <= all
    })
  }

  test("within bounds the first-to-last consumed timestamp span") {
    check(Prop.forAll(genEvents, genPattern, Gen.choose(1L, 5L)) { (events, specs, w) =>
      val nfa = new NFA[E](build(specs).within(w), _.ts)
      nfa.findMatches(events).forall { case (_, _, m) =>
        val evs = m.flatMap(_._2)
        evs.last.ts - evs.head.ts <= w
      }
    })
  }

  test("all-strict patterns consume contiguous index ranges") {
    check(Prop.forAll(genEvents, genPattern.map(_.map(_.copy(strict = true)))) {
      (events, specs) =>
        val nfa = new NFA[E](build(specs), _.ts)
        nfa.findMatches(events).forall { case (s, e, m) =>
          val consumed = m.flatMap(_._2).map(_.ts)
          consumed == (s.toLong to e.toLong)
        }
    })
  }

  test("greedy vs reluctant loop branch counts match the run-length model") {
    check(Prop.forAll(genEvents) { events =>
      // terminal consecutive a+ loop: at anchor i with r remaining
      // contiguous a's, greedy yields 1 branch (the longest), reluctant
      // yields r branches (every count) — Pattern.greedy:632 semantics
      def runFrom(i: Int): Int =
        events.drop(i).takeWhile(_.kind == 'a').length
      val base = Pattern.begin[E]("as")(_.kind == 'a').oneOrMore.consecutive
      val greedyN = new NFA[E](base.greedy, _.ts)
        .findMatches(events, 0, AfterMatchSkip.NoSkip).size
      val reluctantN = new NFA[E](base.reluctant, _.ts)
        .findMatches(events, 0, AfterMatchSkip.NoSkip).size
      val anchors = events.indices.filter(events(_).kind == 'a')
      greedyN == anchors.size &&
        reluctantN == anchors.map(runFrom).sum
    })
  }

  test("greedy NoSkip spans are a subset of reluctant NoSkip spans") {
    check(Prop.forAll(genEvents) { events =>
      val base = Pattern.begin[E]("as")(_.kind == 'a').oneOrMore
        .followedBy("b")(_.kind == 'b')
      def spans(p: Pattern[E]) =
        new NFA[E](p, _.ts).findMatches(events, 0, AfterMatchSkip.NoSkip)
          .map { case (s, e, _) => (s, e) }.toSet
      spans(base.greedy).subsetOf(spans(base.reluctant))
    })
  }

  test("allowCombinations branches over every order-preserving pair") {
    check(Prop.forAll(genEvents) { events =>
      // a{2} with combinations: every ordered pair of a's is a branch →
      // C(#a, 2) matches under NoSkip; without combinations the second
      // repetition is the deterministic next a → (#a - 1) matches
      val base = Pattern.begin[E]("as")(_.kind == 'a').times(2)
      val na = events.count(_.kind == 'a')
      val combN = new NFA[E](base.allowCombinations, _.ts)
        .findMatches(events, 0, AfterMatchSkip.NoSkip).size
      val plainN = new NFA[E](base, _.ts)
        .findMatches(events, 0, AfterMatchSkip.NoSkip).size
      combN == na * (na - 1) / 2 && plainN == math.max(0, na - 1)
    })
  }

  test("combination branches consume only matching events, in order") {
    check(Prop.forAll(genEvents) { events =>
      val p = Pattern.begin[E]("as")(_.kind == 'a').times(2).allowCombinations
      new NFA[E](p, _.ts).findMatches(events, 0, AfterMatchSkip.NoSkip)
        .forall { case (_, _, m) =>
          val as = m.head._2
          as.size == 2 && as.forall(_.kind == 'a') && as(0).ts < as(1).ts
        }
    })
  }

  test("until never admits a repetition at or past the stopping event") {
    check(Prop.forAll(genEvents) { events =>
      // a+ until 'c', then b: no consumed 'a' may sit after the first 'c'
      // that appears in the run's scan range
      val p = Pattern.begin[E]("as")(_.kind == 'a').oneOrMore
        .until(_.kind == 'c')
        .followedBy("b")(_.kind == 'b')
      val nfa = new NFA[E](p, _.ts)
      nfa.findMatches(events).forall { case (s, _, m) =>
        val as = m.head._2
        val lastA = as.last.ts
        // between the 2nd..last consumed a's there is no 'c'
        (as.head.ts to lastA).forall(i => events(i.toInt).kind != 'c')
      }
    })
  }
}
