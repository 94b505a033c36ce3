package graft.operators

import graft.SparkSuite

/** Randomized pins for the iteration and watermark machinery: the
  * distributed delta-iteration SSSP must equal a driver-side dynamic
  * program on random DAGs, and the watermark multiplexer / alignment
  * pacer must hold their invariants on random traffic.
  */
class IteratePropertySpec extends SparkSuite {
  import spark.implicits._

  test("shortestPaths equals a driver-side DP on random weighted DAGs") {
    val rnd = new scala.util.Random(42)
    (1 to 4).foreach { trial =>
      val n = 30 + rnd.nextInt(20)
      val edges = (for {
        i <- 0 until n; j <- (i + 1) until n
        if rnd.nextDouble() < 0.12
      } yield (i.toLong, j.toLong, (1 + rnd.nextInt(9)).toLong)).toSeq
      // driver-side DP in topological (= id) order
      val dist = Array.fill(n)(Long.MaxValue)
      dist(0) = 0L
      edges.sortBy(_._1).foreach { case (s, d, w) =>
        if (dist(s.toInt) != Long.MaxValue)
          dist(d.toInt) = math.min(dist(d.toInt), dist(s.toInt) + w)
      }
      val expected = dist.zipWithIndex.collect {
        case (dd, i) if dd != Long.MaxValue => (i.toLong, dd)
      }.toMap
      val got = Iterate.shortestPaths(edges.toDF("src", "dst", "w"), 0L)
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial: $got vs $expected")
    }
  }

  test("mux invariants hold on random multi-source traffic") {
    import graft.streaming.WatermarkMux
    val rnd = new scala.util.Random(7)
    var m = WatermarkMux.init(Seq(0, 1, 2), delayMs = 5L,
      idleTimeoutRounds = 3)
    var prevCombined = m.combined
    val silentRounds = Array(0, 0, 0)
    var ts = 0L
    (1 to 300).foreach { _ =>
      val obs = (0 to 2).flatMap { s =>
        if (rnd.nextDouble() < 0.5) { ts += rnd.nextInt(10); Some(s -> ts) }
        else None
      }.toMap
      val preAdvance = m.combined
      m = m.advance(obs)
      (0 to 2).foreach { s =>
        if (obs.contains(s)) silentRounds(s) = 0 else silentRounds(s) += 1
      }
      // monotone, never regresses
      assert(m.combined >= prevCombined)
      prevCombined = m.combined
      // idle exactly when silent >= timeout
      (0 to 2).foreach { s =>
        assert(m.sources(s).idle == (silentRounds(s) >= 3),
          s"source $s idle flag vs silent=${silentRounds(s)}")
      }
      // combined never exceeds an ACTIVE source's partial watermark
      // unless it merely HELD its pre-advance value (idleness hold)
      m.sources.values.filterNot(_.idle)
        .filter(_.maxTs != Long.MinValue)
        .foreach(sw => assert(m.combined <= sw.maxTs - 5L ||
          m.combined == preAdvance,
          s"combined ${m.combined} ran past active ${sw.maxTs - 5L}"))
    }
  }

  test("alignRounds invariants hold on random skewed queues") {
    import graft.streaming.WatermarkMux
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { trial =>
      val qs = (0 to 2).map { s =>
        var t = 0L
        s -> Vector.fill(50 + rnd.nextInt(100)) {
          t += 1 + rnd.nextInt(if (s == 0) 40 else 5); t
        }
      }.toMap
      val drift = 60L
      val rounds = WatermarkMux.alignRounds(qs, (t: Long) => t, drift,
        rowsPerRound = 7)
      val released = rounds.flatten
      // completeness + per-source order
      (0 to 2).foreach { s =>
        assert(released.collect { case (`s`, t) => t } == qs(s))
      }
      // pause-rule replay: each release within drift of the live min
      val wm = scala.collection.mutable.Map(0 -> Long.MinValue,
        1 -> Long.MinValue, 2 -> Long.MinValue)
      val left = scala.collection.mutable.Map((0 to 2).map(s =>
        s -> qs(s).size): _*)
      released.foreach { case (s, t) =>
        val liveMin = left.collect { case (k, n) if n > 0 => wm(k) }.min
        assert(wm(s) <= liveMin + drift || wm(s) == liveMin,
          s"trial $trial: source $s wm=${wm(s)} liveMin=$liveMin")
        wm(s) = math.max(wm(s), t)
        left(s) -= 1
      }
    }
  }
}
