package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.SparkSuite
import SemiAntiJoin._

/** Retraction semantics of the stream-stream semi/anti join, mirroring
  * the reference's operator tests: right-side arrivals/departures must
  * retract or re-emit the stored left rows.
  */
class SemiAntiJoinSpec extends SparkSuite {
  import spark.implicits._

  private def run(semi: Boolean, batches: Seq[Seq[JoinInput]]): Seq[Seq[JoinOutput]] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[JoinInput]
    val out = input.toDS().groupByKey(_.key)
      .transformWithState(new SemiAntiProcessor(semi),
        TimeMode.None(), OutputMode.Update())
    val name = s"saj_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt")).start()
    try {
      val emitted = scala.collection.mutable.ArrayBuffer.empty[Seq[JoinOutput]]
      var seen = 0
      batches.foreach { b =>
        input.addData(b)
        q.processAllAvailable()
        val all = spark.table(name).as[JoinOutput].collect().toSeq
        emitted += all.drop(seen)
        seen = all.length
      }
      emitted.toSeq
    } finally q.stop()
  }

  test("semi join: left emitted on right arrival, retracted on right departure") {
    val out = run(semi = true, Seq(
      Seq(JoinInput("k", isLeft = true, 1, 0)),          // no right yet
      Seq(JoinInput("k", isLeft = false, 0, +1)),        // right arrives
      Seq(JoinInput("k", isLeft = true, 2, 0)),          // immediate emit
      Seq(JoinInput("k", isLeft = false, 0, -1))))       // right leaves
    assert(out(0).isEmpty)
    assert(out(1) == Seq(JoinOutput(Changelog.Insert, "k", 1)))
    assert(out(2) == Seq(JoinOutput(Changelog.Insert, "k", 2)))
    assert(out(3).toSet == Set(
      JoinOutput(Changelog.Delete, "k", 1),
      JoinOutput(Changelog.Delete, "k", 2)))
  }

  test("anti join: left emitted while no right, retracted when right arrives") {
    val out = run(semi = false, Seq(
      Seq(JoinInput("k", isLeft = true, 1, 0)),          // emitted: no right
      Seq(JoinInput("k", isLeft = false, 0, +1)),        // retract
      Seq(JoinInput("k", isLeft = true, 2, 0)),          // suppressed
      Seq(JoinInput("k", isLeft = false, 0, -1))))       // re-emit all
    assert(out(0) == Seq(JoinOutput(Changelog.Insert, "k", 1)))
    assert(out(1) == Seq(JoinOutput(Changelog.Delete, "k", 1)))
    assert(out(2).isEmpty)
    assert(out(3).toSet == Set(
      JoinOutput(Changelog.Insert, "k", 1),
      JoinOutput(Changelog.Insert, "k", 2)))
  }

  test("keys are independent") {
    val out = run(semi = true, Seq(
      Seq(JoinInput("a", isLeft = true, 1, 0), JoinInput("b", isLeft = false, 0, +1)),
      Seq(JoinInput("b", isLeft = true, 2, 0))))
    assert(out(0).isEmpty)
    assert(out(1) == Seq(JoinOutput(Changelog.Insert, "b", 2)))
  }
}
