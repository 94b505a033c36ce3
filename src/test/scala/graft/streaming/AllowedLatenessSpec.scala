package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import AllowedLateness._

/** WindowOperator allowedLateness semantics: initial fire at (recovered)
  * watermark ≥ window end, per-element -U/+U re-fire inside the lateness
  * horizon, side output beyond it, state cleared at end+lateness.
  *
  * Window 1000 ms, lateness 1000 ms → the stream watermark delay is
  * 2000 ms (lateness + window, the inflation the operator requires).
  * flinkWM below = max-seen ts; engineWM = flinkWM - 2000.
  */
class AllowedLatenessSpec extends SparkSuite {
  import spark.implicits._

  private def run(batches: Seq[Seq[LWIn]]): Seq[Seq[LWChange]] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[LWIn]
    val out = tumbleCounts(
      input.toDS().withWatermark("eventTime", "2 seconds"), 1000L, 1000L,
      2000L)
    val name = s"lw_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", tmpDir("lw_ckpt")).start()
    try {
      val emitted = scala.collection.mutable.ArrayBuffer.empty[Seq[LWChange]]
      var seen = 0
      batches.foreach { b =>
        input.addData(b)
        q.processAllAvailable()
        val all = spark.table(name).as[LWChange].collect().toSeq
        emitted += all.drop(seen)
        seen = all.length
      }
      emitted.toSeq
    } finally q.stop()
  }

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("fire, per-element re-fire, side output, cleanup") {
    val out = run(Seq(
      Seq(LWIn("k", ts(10100), 1), LWIn("k", ts(10200), 2)), // win [10000,11000)
      Seq(LWIn("k", ts(11500), 3)), // flinkWM→11500 ≥ end: initial fire
      Seq(LWIn("k", ts(10500), 4)), // allowed late (11500 < end+lat 12000)
      Seq(LWIn("k", ts(14500), 5)), // flinkWM→14500: [10000,11000) cleaned
      Seq(LWIn("k", ts(12700), 6)))) // ws 12000 ≤ engineWM 12500: side output
    assert(out(1).contains(LWChange(Changelog.Insert, false, "k", 10000, 2, -1)))
    assert(out(2) == Seq(
      LWChange(Changelog.UpdateBefore, false, "k", 10000, 2, -1),
      LWChange(Changelog.UpdateAfter, false, "k", 10000, 3, -1)))
    assert(out(4) == Seq(LWChange(Changelog.Insert, true, "k", 12000, -1, 6)))
  }

  test("fire and cleanup in one jump: exactly one emission, no zombies") {
    val out = run(Seq(
      Seq(LWIn("k", ts(10100), 1)),
      Seq(LWIn("k", ts(13500), 2)), // engineWM→11500 ≥ ws: fire then clean
      Seq(LWIn("k", ts(11700), 3)))) // ws 11000 ≤ engineWM: side output only
    val flat = out.flatten
    assert(flat.filter(c => !c.late && c.ws == 10000) ==
      Seq(LWChange(Changelog.Insert, false, "k", 10000, 1, -1)))
    assert(flat.filter(_.late) == Seq(
      LWChange(Changelog.Insert, true, "k", 11000, -1, 3)))
  }

  test("late first element of a never-fired window still fires") {
    val out = run(Seq(
      Seq(LWIn("k", ts(11600), 1)),  // after batch: engineWM 9600
      Seq(LWIn("z", ts(10700), 2)),  // z [10000,11000): fire timer already due
      Seq(LWIn("k", ts(14000), 3)))) // advance: cleanups fire
    val zRows = out.flatten.filter(c => c.etype == "z")
    assert(zRows == Seq(LWChange(Changelog.Insert, false, "z", 10000, 1, -1)))
  }
}
