package graft.streaming

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}

import graft.SparkSuite
import ProcessOps._

/** [[ProcessOps.RangeBoundedOverProcessor]] with its persisted
  * ascending-timestamp index WITHHELD after every drain — clearing the
  * `rangeIdx` ValueState while the retained rows stay present forces
  * the next drain through the belt-and-braces rebuild path (index
  * recomputed from the retained MapState keys, sorted) that no normal
  * lifecycle reaches. Top-level so the streaming query serializes it
  * without capturing the spec.
  */
class IndexLosingRangeProcessor(rangeMs: Long)
    extends ProcessOps.RangeBoundedOverProcessor(rangeMs) {
  override protected def endDrain(): Unit = {
    super.endDrain()
    idx.clear()
  }
}

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

  /** Run `batches` of TimedIn through an over-aggregate processor under
    * a 1 ms watermark (event-time mode), flushing the tail with a
    * far-future sentinel key; returns the non-sentinel outputs.
    */
  private def runOver(proc: => BufferedOverProcessor,
      batches: Seq[Seq[TimedIn]]): Seq[OverOut] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TimedIn]
    val out = input.toDS().withWatermark("eventTime", "1 millisecond")
      .groupByKey(_.key)
      .transformWithState(proc, TimeMode.EventTime(), OutputMode.Append())
    val name = s"over_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ckpt")).start()
    val sentinel = Seq(TimedIn("\u0000flush",
      new java.sql.Timestamp(10L * 86400000L), 0L))
    try {
      (batches :+ sentinel).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      spark.table(name).as[OverOut].collect().toSeq
        .filter(_.key != "\u0000flush")
    } finally q.stop()
  }

  test("rows-bounded over agg: moving sum over last 3 rows per key") {
    // fed ascending, but the frame is event-time defined: the watermark
    // drains ts 1..2 after batch 1 (wm = 2-1 = 1 → only ts 1), the rest
    // after batch 2 + sentinel — output must be frame-exact regardless
    val rows = runOver(new RowsBoundedOverProcessor(3), Seq(
        Seq(TimedIn("k", new java.sql.Timestamp(1L), 10),
          TimedIn("k", new java.sql.Timestamp(2L), 20)),
        Seq(TimedIn("k", new java.sql.Timestamp(3L), 30),
          TimedIn("k", new java.sql.Timestamp(4L), 40))))
      .map(o => o.ts -> ((o.movingSum, o.n))).toMap
    assert(rows(1L) == ((10L, 1L)))
    assert(rows(2L) == ((30L, 2L)))
    assert(rows(3L) == ((60L, 3L)))
    assert(rows(4L) == ((90L, 3L))) // window slid: 20+30+40
  }

  test("range-bounded over agg: trailing 10ms event-time window per key") {
    val rows = runOver(new RangeBoundedOverProcessor(rangeMs = 10), Seq(
        Seq(TimedIn("k", new java.sql.Timestamp(100L), 1),
          TimedIn("k", new java.sql.Timestamp(105L), 2)),
        Seq(TimedIn("k", new java.sql.Timestamp(114L), 4),
          TimedIn("k", new java.sql.Timestamp(130L), 8))))
      .map(o => o.ts -> ((o.movingSum, o.n))).toMap
    assert(rows(100L) == ((1L, 1L)))
    assert(rows(105L) == ((3L, 2L)))  // 100 within [95, 105]
    assert(rows(114L) == ((6L, 2L)))  // 100 evicted, 105+114
    assert(rows(130L) == ((8L, 1L)))  // everything else evicted
  }

  test("range-bounded over agg: same-timestamp rows are peers (accumulate first)") {
    // two rows at ts 105 must BOTH see the full peer group — the SQL
    // RANGE frame includes peers, and the reference adds the whole
    // per-timestamp list to the accumulator before emitting
    val rows = runOver(new RangeBoundedOverProcessor(rangeMs = 10), Seq(
        Seq(TimedIn("k", new java.sql.Timestamp(100L), 1)),
        Seq(TimedIn("k", new java.sql.Timestamp(105L), 2),
          TimedIn("k", new java.sql.Timestamp(105L), 4))))
    val at105 = rows.filter(_.ts == 105L).map(o => (o.movingSum, o.n))
    assert(at105 == Seq((7L, 3L), (7L, 3L)), s"peers diverged: $at105")
  }

  test("range index rebuild: a withheld rangeIdx state drains identically") {
    // three batches so the second and third drains find retained rows
    // with the index gone — eviction must still walk the REBUILT
    // ascending index (ts 100/105 evicted at 114/130, all at 150)
    val batches = Seq(
      Seq(TimedIn("k", new java.sql.Timestamp(100L), 1),
        TimedIn("k", new java.sql.Timestamp(105L), 2)),
      Seq(TimedIn("k", new java.sql.Timestamp(114L), 4),
        TimedIn("k", new java.sql.Timestamp(130L), 8)),
      Seq(TimedIn("k", new java.sql.Timestamp(135L), 16),
        TimedIn("k", new java.sql.Timestamp(150L), 32)))
    def canon(rows: Seq[OverOut]) =
      rows.map(o => (o.ts, o.v, o.movingSum, o.n)).sorted
    val expected = canon(runOver(new RangeBoundedOverProcessor(10), batches))
    val actual = canon(runOver(new IndexLosingRangeProcessor(10), batches))
    assert(actual == expected, s"rebuild path diverged: $actual")
    // spot-pin the rebuilt-index evictions, not just self-agreement
    val m = actual.map { case (ts, _, s, n) => ts -> ((s, n)) }.toMap
    assert(m(114L) == ((6L, 2L)))   // 100 evicted by the rebuilt index
    assert(m(130L) == ((8L, 1L)))   // 105/114 evicted
    assert(m(135L) == ((24L, 2L)))  // 130 within [125, 135]
    assert(m(150L) == ((32L, 1L)))
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
