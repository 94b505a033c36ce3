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
