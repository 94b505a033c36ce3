package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import TemporalJoin._

/** Properties of the temporal-join core: resolution matches a
  * brute-force as-of model, and version GC is SAFE — evicting versions
  * superseded at the watermark can never change the resolution of any
  * probe the watermark has not yet released.
  */
class TemporalAdvancePropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  private val genVersions: Gen[Seq[(Long, Long)]] =
    Gen.listOf(Gen.choose(0L, 50L)).map(_.distinct.map(ts => ts -> (ts * 10)))

  private val genProbes: Gen[Seq[ProbeBuf]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, 60L), Gen.choose(0L, 1000L)))
      .map(_.map { case (ts, id) => ProbeBuf(ts, id) })

  /** Brute-force as-of model: latest version at or before the probe. */
  private def model(versions: Seq[(Long, Long)], ts: Long): Option[(Long, Long)] =
    versions.filter(_._1 <= ts).sortBy(_._1).lastOption

  test("advance resolves exactly the released probes, per the as-of model") {
    check(Prop.forAll(genVersions, genProbes, Gen.choose(0L, 60L)) { (vs, ps, wm) =>
      val (out, remaining, _) = advance("k", ps, vs, wm)
      val releasedOk = out.forall { m =>
        model(vs, m.probeTs) match {
          case Some((vts, v)) => m.matched && m.versionTs == vts && m.value == v
          case None => !m.matched
        }
      }
      val partitionOk =
        out.map(_.probeId).toSet ++ remaining.map(_.probeId).toSet ==
          ps.map(_.probeId).toSet &&
        out.forall(_.probeTs <= wm) && remaining.forall(_.ts > wm)
      releasedOk && partitionOk
    })
  }

  test("version GC never changes any future probe's resolution") {
    check(Prop.forAll(genVersions, Gen.choose(0L, 60L)) { (vs, wm) =>
      val (_, _, evicted) = advance("k", Nil, vs, wm)
      val retained = vs.filterNot(v => evicted.contains(v._1))
      // every probe the watermark has NOT released resolves identically
      // against the full history and the GC'd history
      (wm + 1 to 61L).forall { futureTs =>
        model(vs, futureTs) == model(retained, futureTs)
      }
    })
  }
}
