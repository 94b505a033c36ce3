package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.SparkSuite
import RetractableTopN._

/** Rank-movement cascades of the updatable top-n: updates move rows in
  * and out, deletes promote rows from below the cut.
  */
class RetractableTopNSpec extends SparkSuite {
  import spark.implicits._

  private def run(batches: Seq[Seq[TopNChange]]): Seq[Seq[TopNChange]] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TopNChange]
    val out = input.toDS().groupByKey(_.key)
      .transformWithState(new RetractableTopNProcessor(2),
        TimeMode.None(), OutputMode.Update())
    val name = s"rtn_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt")).start()
    try {
      val emitted = scala.collection.mutable.ArrayBuffer.empty[Seq[TopNChange]]
      var seen = 0
      batches.foreach { b =>
        input.addData(b)
        q.processAllAvailable()
        val all = spark.table(name).as[TopNChange].collect().toSeq
        emitted += all.drop(seen)
        seen = all.length
      }
      emitted.toSeq
    } finally q.stop()
  }

  test("update/delete cascades through the visible top-2") {
    val out = run(Seq(
      Seq(TopNChange(Changelog.Insert, "k", 1, 30),
        TopNChange(Changelog.Insert, "k", 2, 10)),
      Seq(TopNChange(Changelog.UpdateAfter, "k", 1, 5)),  // 1 moves to front
      Seq(TopNChange(Changelog.Insert, "k", 3, 7)),       // 3 evicts 2
      Seq(TopNChange(Changelog.Delete, "k", 1, 0))))      // delete promotes 2
    assert(out(0) == Seq(
      TopNChange(Changelog.Insert, "k", 1, 30),
      TopNChange(Changelog.Insert, "k", 2, 10)))
    assert(out(1) == Seq(
      TopNChange(Changelog.UpdateBefore, "k", 1, 30),
      TopNChange(Changelog.UpdateAfter, "k", 1, 5)))
    assert(out(2) == Seq(
      TopNChange(Changelog.Delete, "k", 2, 10),
      TopNChange(Changelog.Insert, "k", 3, 7)))
    assert(out(3) == Seq(
      TopNChange(Changelog.Delete, "k", 1, 5),
      TopNChange(Changelog.Insert, "k", 2, 10)))
  }

  test("row outside the top-n emits nothing until it becomes visible") {
    val out = run(Seq(
      Seq(TopNChange(Changelog.Insert, "k", 1, 1),
        TopNChange(Changelog.Insert, "k", 2, 2),
        TopNChange(Changelog.Insert, "k", 3, 9)),         // 3 invisible
      Seq(TopNChange(Changelog.UpdateAfter, "k", 3, 0)))) // 3 jumps to #1
    assert(out(0) == Seq(
      TopNChange(Changelog.Insert, "k", 1, 1),
      TopNChange(Changelog.Insert, "k", 2, 2)))
    assert(out(1) == Seq(
      TopNChange(Changelog.Delete, "k", 2, 2),
      TopNChange(Changelog.Insert, "k", 3, 0)))
  }
}
