package graft.streaming

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}

import graft.SparkSuite
import ProcessOps._

/** Specs for the process-function layer: timers, bounded over-aggregate,
  * and state TTL.
  *
  * NOTE: with TimeMode.ProcessingTime the query keeps scheduling
  * micro-batches to advance timers, so `processAllAvailable` never reaches
  * the no-new-data latch — these specs poll the sink with a deadline
  * instead.
  */
class ProcessOpsSpec extends SparkSuite {
  import spark.implicits._

  /** Poll `spark.table(name)` until `cond` holds or the deadline passes. */
  private def awaitSink(name: String, deadlineMs: Long = 30000)(
      cond: () => Boolean): Boolean = {
    val until = System.currentTimeMillis() + deadlineMs
    var ok = cond()
    while (!ok && System.currentTimeMillis() < until) {
      Thread.sleep(100)
      ok = cond()
    }
    ok
  }

  test("processing-time timer fires after inactivity gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val out = input.toDS().groupByKey(_._1)
      .transformWithState(new InactivityTimeoutProcessor(gapMs = 500),
        TimeMode.ProcessingTime(), OutputMode.Update())
    val name = s"timer_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", tmpDir("ckpt")).start()
    try {
      input.addData(Seq(("a", 1L)))
      // the timer fires ~500ms after the row is processed
      assert(awaitSink(name)(() => spark.table(name).count() >= 1))
      val fired = spark.table(name).as[Timeout].collect()
      assert(fired.map(_.key).toSet == Set("a"))
      assert(fired.head.lastValue == 1L)
    } finally q.stop()
  }

  test("rows-bounded over agg: moving sum over last 3 rows per key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[OverIn]
    val out = input.toDS().groupByKey(_.key)
      .transformWithState(new RowsBoundedOverProcessor(3),
        TimeMode.None(), OutputMode.Update())
    val name = s"over_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt")).start()
    try {
      input.addData(Seq(OverIn("k", 1, 10), OverIn("k", 2, 20)))
      q.processAllAvailable()
      input.addData(Seq(OverIn("k", 3, 30), OverIn("k", 4, 40)))
      q.processAllAvailable()
      val rows = spark.table(name).as[OverOut].collect()
        .map(o => o.ts -> (o.movingSum, o.n)).toMap
      assert(rows(1L) == ((10L, 1L)))
      assert(rows(2L) == ((30L, 2L)))
      assert(rows(3L) == ((60L, 3L)))
      assert(rows(4L) == ((90L, 3L))) // window slid: 20+30+40
    } finally q.stop()
  }

  test("range-bounded over agg: trailing 10ms event-time window per key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[OverIn]
    val out = input.toDS().groupByKey(_.key)
      .transformWithState(new RangeBoundedOverProcessor(rangeMs = 10),
        TimeMode.None(), OutputMode.Update())
    val name = s"rng_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt")).start()
    try {
      input.addData(Seq(OverIn("k", 100, 1), OverIn("k", 105, 2)))
      q.processAllAvailable()
      input.addData(Seq(OverIn("k", 114, 4), OverIn("k", 130, 8)))
      q.processAllAvailable()
      val rows = spark.table(name).as[OverOut].collect()
        .map(o => o.ts -> (o.movingSum, o.n)).toMap
      assert(rows(100L) == ((1L, 1L)))
      assert(rows(105L) == ((3L, 2L)))  // 100 within [95, 105]
      assert(rows(114L) == ((6L, 2L)))  // 100 evicted, 105+114
      assert(rows(130L) == ((8L, 1L)))  // everything else evicted
    } finally q.stop()
  }

  test("state TTL: counts reset after expiry") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    // ttl must comfortably exceed worst-case micro-batch scheduling delay
    // under a fully loaded test machine, or the second add lands after the
    // first write expired and the count resets early (flaky under sbt test).
    val out = input.toDS().groupByKey(_._1)
      .transformWithState(new TtlCountProcessor(ttlMs = 8000),
        TimeMode.ProcessingTime(), OutputMode.Update())
    val name = s"ttl_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", tmpDir("ckpt")).start()
    try {
      input.addData(Seq(("a", 1L)))
      assert(awaitSink(name)(() => spark.table(name).count() >= 1))
      input.addData(Seq(("a", 1L)))
      assert(awaitSink(name)(() => spark.table(name).count() >= 2))
      Thread.sleep(8800) // exceed TTL
      input.addData(Seq(("a", 1L)))
      assert(awaitSink(name)(() => spark.table(name).count() >= 3))
      val counts = spark.table(name).as[(String, Long)].collect().map(_._2).toSeq
      assert(counts.take(2) == Seq(1L, 2L))
      assert(counts(2) == 1L) // state expired — count restarted
    } finally q.stop()
  }
}
