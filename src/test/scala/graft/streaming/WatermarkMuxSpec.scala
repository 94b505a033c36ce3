package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import WatermarkMux._

/** Watermark idleness + alignment semantics (WatermarkStrategy
  * withIdleness/withWatermarkAlignment via WatermarkOutputMultiplexer):
  * pure multiplexer sequences, the alignment pacer's drift bound, and
  * the stamped-clock window operator closing windows past a stalled
  * partition.
  */
class WatermarkMuxSpec extends SparkSuite {
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  // ---- pure multiplexer ----

  test("combined watermark is the min over active sources") {
    var m = init(Seq(0, 1), delayMs = 10L, idleTimeoutRounds = 2)
    m = m.advance(Map(0 -> 100L, 1 -> 50L))
    assert(m.combined == 40L) // min(100,50) - 10
    m = m.advance(Map(0 -> 200L, 1 -> 180L))
    assert(m.combined == 170L)
  }

  test("un-started source holds the combined watermark down") {
    var m = init(Seq(0, 1), delayMs = 0L, idleTimeoutRounds = 3)
    m = m.advance(Map(0 -> 100L))
    assert(m.combined == Long.MinValue) // source 1 active but never emitted
  }

  test("idle source leaves the min; first event reactivates it") {
    var m = init(Seq(0, 1), delayMs = 0L, idleTimeoutRounds = 2)
    m = m.advance(Map(0 -> 100L, 1 -> 60L))
    assert(m.combined == 60L)
    m = m.advance(Map(0 -> 150L)) // source 1 idle for 1 round: still active
    assert(m.combined == 60L)
    m = m.advance(Map(0 -> 200L)) // 2 rounds: idle, min jumps to source 0
    assert(m.sources(1).idle && m.combined == 200L)
    m = m.advance(Map(0 -> 250L, 1 -> 240L)) // reactivated, rejoins the min
    assert(!m.sources(1).idle && m.combined == 240L)
  }

  test("all sources idle: combined holds; never regresses on reactivation") {
    var m = init(Seq(0, 1), delayMs = 0L, idleTimeoutRounds = 1)
    m = m.advance(Map(0 -> 100L, 1 -> 90L))
    m = m.advance(Map.empty)
    assert(m.sources.values.forall(_.idle) && m.combined == 90L)
    m = m.advance(Map.empty)
    assert(m.combined == 90L)
    // a reactivating source behind the combined watermark cannot pull it back
    m = m.advance(Map(1 -> 30L))
    assert(m.combined == 90L)
  }

  // ---- alignment pacer ----

  test("alignRounds: completeness, order, and the pause-rule drift bound") {
    // source 0 is 10x faster in event time than source 1
    val fast = (1 to 40).map(i => i * 100L).toVector
    val slow = (1 to 40).map(i => i * 10L).toVector
    val rounds = alignRounds(Map(0 -> fast, 1 -> slow), (t: Long) => t,
      maxDriftMs = 500L, rowsPerRound = 4)
    val released = rounds.flatten
    // every row released exactly once, per-source order preserved
    assert(released.collect { case (0, t) => t } == fast)
    assert(released.collect { case (1, t) => t } == slow)
    // replay the release sequence: at each release, the source's
    // PRE-RELEASE watermark must satisfy the pause rule (within
    // maxDrift of the live group min, or itself the min)
    val wm = scala.collection.mutable.Map(0 -> Long.MinValue, 1 -> Long.MinValue)
    val remaining = scala.collection.mutable.Map(0 -> fast.size, 1 -> slow.size)
    released.foreach { case (id, t) =>
      val liveMin = remaining.collect { case (k, n) if n > 0 => wm(k) }.min
      assert(wm(id) <= liveMin + 500L || wm(id) == liveMin,
        s"source $id released at wm=${wm(id)} vs liveMin=$liveMin")
      wm(id) = math.max(wm(id), t)
      remaining(id) -= 1
    }
  }

  test("alignRounds: drained source stops pausing the others") {
    val short = Vector(10L, 20L)
    val long = (1 to 20).map(i => i * 1000L).toVector
    val rounds = alignRounds(Map(0 -> long, 1 -> short), (t: Long) => t,
      maxDriftMs = 100L, rowsPerRound = 8)
    assert(rounds.flatten.size == 22)
    // once source 1 drains, source 0 releases full rounds unimpeded
    assert(rounds.last.forall(_._1 == 0))
  }

  // ---- stamped-clock window operator ----

  private def runWindows(batches: Seq[Seq[MuxIn]]): Seq[MuxWin] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MuxIn]
    val out = idleTumbleCounts(input.toDS(), windowMs = 1000L)
    val name = s"wmx_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", tmpDir("wmx_ckpt")).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).as[MuxWin].collect().toSeq
    } finally q.stop()
  }

  test("windows close past a stalled partition only under idleness") {
    // source 1 contributes to window [0,1000) then stalls; source 0
    // keeps advancing far past it
    val rounds = Seq(
      Seq((0, ("a", 100L)), (1, ("b", 200L))),
      Seq((0, ("a", 1200L))), // src 1 silent (round 1)
      Seq((0, ("a", 2500L))), // silent round 2: idle -> combined jumps
      Seq((0, ("a", 9500L))), // combined passes every open window end
      Seq.empty)              // one more batch so the engine wm catches up
    val out = runWindows(stamp(rounds, delayMs = 0L, idleTimeoutRounds = 2))
    assert(out.toSet == Set(MuxWin("a", 0L, 1L), MuxWin("b", 0L, 1L),
      MuxWin("a", 1000L, 1L), MuxWin("a", 2000L, 1L)))

    // contrast: with an effectively infinite idle timeout the stalled
    // partition pins the clock at 200 and NOTHING ever closes
    val pinned = runWindows(stamp(rounds, delayMs = 0L,
      idleTimeoutRounds = 1000))
    assert(pinned.isEmpty)
  }

  test("mux fuzz: combined watermark equals an independent per-round simulator") {
    import scala.util.Random
    for (seed <- 1L to 60L) {
      val r = new Random(graft.queries.StreamFuzzGen.scramble(seed ^ 0x33a4e1L))
      val n = 2 + r.nextInt(3)
      val delay = Seq(0L, 10L, 50L)(r.nextInt(3))
      val k = 1 + r.nextInt(3)
      val rounds = 8 + r.nextInt(8)
      // random forward walks; each source observed with prob ~0.55 —
      // long gaps (idle + resume) and never-observed sources both draw
      val tsOf = Array.fill(n)(0L)
      val obs: Seq[Map[Int, Long]] = (1 to rounds).map { _ =>
        (0 until n).flatMap { j =>
          if (r.nextInt(100) < 55) {
            tsOf(j) += 1 + r.nextInt(200)
            Some(j -> tsOf(j))
          } else None
        }.toMap
      }
      // independent simulator: activity from rounds-since-last-
      // observation bookkeeping, combined as a running max over
      // not-all-idle round candidates — no SourceWm state machine
      val lastObs = Array.fill(n)(0)
      val maxTs = Array.fill(n)(Long.MinValue)
      var combined = Long.MinValue
      var m = init(0 until n, delay, k)
      obs.zipWithIndex.foreach { case (o, i) =>
        val round = i + 1
        o.foreach { case (j, t) =>
          lastObs(j) = round
          maxTs(j) = math.max(maxTs(j), t)
        }
        val active = (0 until n).filter(j => round - lastObs(j) < k)
        if (active.nonEmpty) {
          val cand = active.map(j =>
            if (maxTs(j) == Long.MinValue) Long.MinValue
            else maxTs(j) - delay).min
          combined = math.max(combined, cand)
        }
        m = m.advance(o)
        assert(m.combined == combined,
          s"mux seed $seed round $round: mux=${m.combined} sim=$combined " +
            s"(n=$n delay=$delay k=$k obs=$o)")
      }
    }
  }

  /** Randomized resume/drop coverage for the stamped-clock operator:
    * sources go idle and RESUME with rows behind the advanced combined
    * clock — the closed-window drop path no generated end-to-end family
    * reaches (their validity guarantees exclude drops by construction).
    * The oracle is a survivors model computed directly from the batch
    * structure: a row survives iff its window end is still ahead of the
    * engine watermark at its batch (= previous round's stamp − 1 ms),
    * and a window fires iff its end is behind the final watermark.
    */
  test("stamped-clock operator under random idles and resumes equals the survivors model") {
    import scala.util.Random
    val W = 1000L
    var droppedTotal = 0
    for (seed <- 1L to 6L) {
      val r = new Random(graft.queries.StreamFuzzGen.scramble(seed ^ 0x77d20bL))
      val n = 2 + r.nextInt(2)
      val k = 1 + r.nextInt(2)
      val rounds = 8 + r.nextInt(4)
      val types = Seq("a", "b", "c")
      // positive base + a warm round where EVERY source emits: the
      // combined clock never stamps the 0 floor, so no row is ever
      // engine-late (wmTs stamps stay strictly above the engine
      // watermark — the real families guarantee this structurally via
      // slice occupancy) and every drop is the PROCESSOR's closed-
      // window rule, which is what the survivors model states
      val tsOf = Array.fill(n)(10000L)
      val warmRound: Seq[(Int, (String, Long))] = (0 until n).map { j =>
        tsOf(j) += r.nextInt(200)
        (j, (types(r.nextInt(3)), tsOf(j)))
      }
      val dataRounds: Seq[Seq[(Int, (String, Long))]] =
        warmRound +: (1 to rounds).map { _ =>
        (0 until n).flatMap { j =>
          if (r.nextInt(100) < 55) {
            (0 until 1 + r.nextInt(2)).map { _ =>
              // mostly forward, sometimes barely ahead of the OLD max —
              // after an idle gap these land behind the advanced clock
              tsOf(j) += (if (r.nextInt(3) == 0) 1L else 300L + r.nextInt(800))
              (j, (types(r.nextInt(3)), tsOf(j)))
            }
          } else Seq.empty
        }
      }
      val sentinelTs = tsOf.max + 100000L
      val allRounds = dataRounds ++ Seq(
        (0 until n).map(j => (j, ("zfin", sentinelTs))),
        Seq.empty[(Int, (String, Long))])
      val stamped = stamp(allRounds, delayMs = 0L, idleTimeoutRounds = k)
      // survivors model over the stamped batches
      val stamps = stamped.map(b =>
        b.headOption.map(_.wmTs.getTime).getOrElse(Long.MinValue))
      def wmBefore(i: Int): Long =
        if (i == 0) 0L
        else math.max(0L, stamps.take(i).max - 1L)
      val finalWm = math.max(0L, stamps.max - 1L)
      val survivors = stamped.zipWithIndex.flatMap { case (b, i) =>
        b.filter { row =>
          val ws = row.ts.getTime - Math.floorMod(row.ts.getTime, W)
          ws + W > wmBefore(i)
        }
      }
      droppedTotal += stamped.map(_.size).sum - survivors.size
      val expected = survivors
        .filter(_.etype != "zfin")
        .groupBy(row => (row.etype,
          row.ts.getTime - Math.floorMod(row.ts.getTime, W)))
        .collect { case ((et, ws), rows) if ws + W <= finalWm =>
          MuxWin(et, ws, rows.size.toLong) }
        .toSet
      val actual = runWindows(stamped).filterNot(_.etype == "zfin").toSet
      assert(actual == expected,
        s"resume seed $seed diverged (n=$n k=$k rounds=$rounds): " +
          s"expected=${expected.size} windows, got=${actual.size}")
    }
    assert(droppedTotal > 0,
      "no seed ever dropped a closed-window row — the resume arm is degenerate")
  }

  test("closed-window late row is dropped, open windows fire exactly once") {
    val rounds = Seq(
      Seq((0, ("a", 100L))),
      Seq((0, ("a", 3500L))),  // combined 3500: [0,1000) closes
      Seq((0, ("a", 500L))),   // late for the closed window: dropped
      Seq((0, ("a", 9000L))),
      Seq.empty)
    val out = runWindows(stamp(rounds, delayMs = 0L, idleTimeoutRounds = 99))
    assert(out.count(w => w.ws == 0L) == 1)
    assert(out.toSet == Set(MuxWin("a", 0L, 1L), MuxWin("a", 3000L, 1L)))
  }
}
