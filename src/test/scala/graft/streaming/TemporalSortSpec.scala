package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.SparkSuite
import ProcessOps.{OverOut, TimedIn, UnboundedPrecedingOverProcessor}
import TemporalSort.TemporalSortProcessor

/** Watermark-ordered operators: temporal sort (StreamExecTemporalSort /
  * RowTimeSortOperator) and the UNBOUNDED PRECEDING over-aggregate
  * (AbstractRowTimeUnboundedPrecedingOver) — out-of-order MemoryStream
  * input, emission gated and ordered by the event-time watermark.
  */
class TemporalSortSpec extends SparkSuite {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  /** Feed batches with watermark `withWatermark(eventTime, delay)`,
    * return rows appended to the sink after each batch (append mode —
    * emission order inside a batch is preserved).
    */
  private def runAppend[O](batches: Seq[Seq[TimedIn]], delay: String,
      pipeline: Dataset[TimedIn] => Dataset[O]): Seq[Seq[O]] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TimedIn]
    val out = pipeline(input.toDS().withWatermark("eventTime", delay))
    val name = s"sink_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ckpt"))
      .start()
    try {
      val emitted = scala.collection.mutable.ArrayBuffer.empty[Seq[O]]
      var seen = 0
      batches.foreach { b =>
        input.addData(b)
        query.processAllAvailable()
        val all = spark.table(name).as[O](out.encoder).collect().toSeq
        emitted += all.drop(seen)
        seen = all.length
      }
      emitted.toSeq
    } finally query.stop()
  }

  private def sortPipeline(ds: Dataset[TimedIn]): Dataset[TimedIn] =
    ds.groupByKey(_.key)
      .transformWithState(
        new TemporalSortProcessor[String, TimedIn](_.eventTime.getTime, implicitly),
        TimeMode.EventTime(), OutputMode.Append())

  test("temporal sort re-emits out-of-order rows in event-time order") {
    // batch 1 arrives out of order; sentinel batches push the watermark
    val out = runAppend[TimedIn](Seq(
      Seq(TimedIn("k", ts(3000), 3), TimedIn("k", ts(1000), 1), TimedIn("k", ts(2000), 2)),
      Seq(TimedIn("k", ts(10000), 10)),
      Seq(TimedIn("k", ts(20000), 20))), "0 milliseconds", sortPipeline)
    // all rows ≤ watermark emitted in exact event-time order
    assert(out.flatten.map(_.v).takeWhile(_ <= 3) == Seq(1L, 2L, 3L))
    // emission is watermark-gated: a batch only emits rows whose event
    // time the watermark has reached (wm after batch 1 = 3000)
    assert(out(0).forall(_.eventTime.getTime <= 3000))
    assert(out(0).map(_.eventTime.getTime) == out(0).map(_.eventTime.getTime).sorted)
  }

  test("temporal sort drops rows at or behind the watermark (late)") {
    val out = runAppend[TimedIn](Seq(
      Seq(TimedIn("k", ts(5000), 5)),
      Seq(TimedIn("k", ts(6000), 6)), // watermark now 5000+
      Seq(TimedIn("k", ts(1000), 99)), // late: behind watermark
      Seq(TimedIn("k", ts(20000), 20))), "0 milliseconds", sortPipeline)
    assert(!out.flatten.map(_.v).contains(99L))
  }

  test("temporal sort: arrival order preserved within equal timestamps") {
    val out = runAppend[TimedIn](Seq(
      Seq(TimedIn("k", ts(1000), 1), TimedIn("k", ts(1000), 2), TimedIn("k", ts(1000), 3)),
      Seq(TimedIn("k", ts(9000), 9))), "0 milliseconds", sortPipeline)
    assert(out.flatten.map(_.v).takeWhile(_ < 9) == Seq(1L, 2L, 3L))
  }

  private def overPipeline(rangeMode: Boolean)(ds: Dataset[TimedIn]): Dataset[OverOut] =
    ds.groupByKey(_.key)
      .transformWithState(new UnboundedPrecedingOverProcessor(rangeMode),
        TimeMode.EventTime(), OutputMode.Append())

  test("unbounded-preceding over: running sum in event-time order despite disorder") {
    val out = runAppend[OverOut](Seq(
      Seq(TimedIn("a", ts(3000), 30), TimedIn("a", ts(1000), 10), TimedIn("b", ts(1000), 5)),
      Seq(TimedIn("a", ts(2000), 20), TimedIn("a", ts(5000), 50), TimedIn("b", ts(5000), 7)),
      Seq(TimedIn("a", ts(99000), 0), TimedIn("b", ts(99000), 0))),
      "2 seconds", overPipeline(rangeMode = false))
    val a = out.flatten.filter(_.key == "a").filter(_.ts < 99000)
    // emitted in event-time order with the cumulative sum from partition start
    assert(a.map(r => (r.ts, r.v, r.movingSum, r.n)) == Seq(
      (1000L, 10L, 10L, 1L), (2000L, 20L, 30L, 2L),
      (3000L, 30L, 60L, 3L), (5000L, 50L, 110L, 4L)))
    val b = out.flatten.filter(_.key == "b").filter(_.ts < 99000)
    assert(b.map(r => (r.ts, r.movingSum)) == Seq((1000L, 5L), (5000L, 12L)))
  }

  test("unbounded-preceding over equals the batch window aggregate (q_over_running shape)") {
    val rows = Seq(
      TimedIn("x", ts(4000), 4), TimedIn("x", ts(1000), 1), TimedIn("x", ts(3000), 3),
      TimedIn("y", ts(2000), 2), TimedIn("x", ts(2000), 2), TimedIn("y", ts(4000), 4))
    val streaming = runAppend[OverOut](Seq(
      rows.take(3), rows.drop(3), Seq(TimedIn("x", ts(99000), 0), TimedIn("y", ts(99000), 0))),
      "5 seconds", overPipeline(rangeMode = false))
      .flatten.filter(_.ts < 99000)
      .map(r => (r.key, r.ts, r.v, r.movingSum)).toSet
    val batch = rows.toDF()
      .withColumn("running", sum($"v").over(
        Window.partitionBy($"key").orderBy($"eventTime")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"key", unix_millis($"eventTime"), $"v", $"running")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(streaming == batch)
  }

  test("unbounded-preceding over RANGE mode: equal timestamps share the aggregate") {
    val out = runAppend[OverOut](Seq(
      Seq(TimedIn("k", ts(1000), 1), TimedIn("k", ts(1000), 2), TimedIn("k", ts(2000), 4)),
      Seq(TimedIn("k", ts(99000), 0))), "0 milliseconds", overPipeline(rangeMode = true))
    val got = out.flatten.filter(_.ts < 99000).map(r => (r.ts, r.v, r.movingSum))
    // both ts=1000 rows carry the full ts-1000 aggregate (3), as in
    // RowTimeRangeUnboundedPrecedingFunction
    assert(got.toSet == Set((1000L, 1L, 3L), (1000L, 2L, 3L), (2000L, 4L, 7L)))
  }

  test("order auditor flags out-of-order emission and passes ordered emission") {
    implicit val sqlCtx = spark.sqlContext
    implicit val auditEnc =
      org.apache.spark.sql.Encoders.product[TemporalSort.OrderAudit]
    def audit(batches: Seq[Seq[TimedIn]]): Map[String, (Long, Long)] = {
      val input = MemoryStream[TimedIn]
      val out = input.toDS().groupByKey(_.key)
        .transformWithState(
          new TemporalSort.OrderAuditProcessor[TimedIn](
            _.eventTime.getTime),
          TimeMode.None(), OutputMode.Update())
      val name = s"audit_${System.nanoTime()}"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("update")
        .option("checkpointLocation", tmpDir("ckpt")).start()
      try { batches.foreach { b => input.addData(b); q.processAllAvailable() } }
      finally q.stop()
      spark.table(name).as[TemporalSort.OrderAudit].collect()
        .groupBy(_.key)
        .map { case (k, rs) =>
          k -> (rs.map(_.n).max, rs.map(_.violations).max) }
    }
    // ordered input (incl. across batches): zero violations
    val ok = audit(Seq(
      Seq(TimedIn("k", ts(1000), 1), TimedIn("k", ts(2000), 2)),
      Seq(TimedIn("k", ts(2000), 3), TimedIn("k", ts(5000), 4))))
    assert(ok("k") == ((4L, 0L)))
    // a regression inside a batch AND across a batch boundary both count
    val bad = audit(Seq(
      Seq(TimedIn("k", ts(3000), 1), TimedIn("k", ts(1000), 2)),
      Seq(TimedIn("k", ts(500), 3))))
    assert(bad("k") == ((3L, 2L)))
  }
}
