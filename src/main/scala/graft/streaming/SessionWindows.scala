package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.streaming._
import org.apache.spark.sql.types._

/** Streaming per-row session-window annotation — the reference's SESSION
  * window TVF in its non-aggregate shape (StreamExecWindowTableFunction
  * .java:73 over SessionWindowAssigner / the MergingWindowSet model):
  * each row gains `window_start` / `window_end` / `window_time` for the
  * session it belongs to, and the annotated rows emit append-only once
  * the session CLOSES (no row can extend it any more).
  *
  * Spark's built-in `session_window` only exists as a grouping
  * expression (aggregate shape); this operator supplies the per-row
  * form with the reference's MergingWindowSet state layout
  * (MergingWindowSet.java:48): rows buffer in keyed ListState, and a
  * COMPACT RUN INDEX (ValueState of gap-separated [min,max] spans)
  * mirrors the open sessions. Each arriving batch merges its timestamps
  * into the index in one linear pass and re-arms ONE event-time timer
  * per open run at `max + gap` (superseded timers deleted) — not a
  * timer per row. When a run's timer fires the run is a closed
  * session: only then is the row buffer read, its rows emitted sorted
  * with start = min ts, end = max ts + gap, time = end − 1 ms (the TVF
  * contract). A row at or behind the watermark on arrival is dropped as
  * late; a row beyond the watermark can only extend a session the
  * watermark has not yet closed, so emission is exactly-once and final.
  *
  * Scale shape: one shuffle on the partition keys; state per key is the
  * open tail of its session history (closed sessions leave the buffer),
  * bounded by watermark lag + gap, the reference's session-state bound.
  * Per-row work is O(open runs) index arithmetic — the buffer is touched
  * once per closing session, not once per timer.
  */
object SessionWindows {

  /** @param df        streaming input
    * @param partCols  session partition keys (PARTITION BY of the TVF)
    * @param tsCol     event-time column (must carry the watermark)
    * @param gap       inactivity gap, a Spark interval string ("1 hour")
    */
  def annotate(df: DataFrame, partCols: Seq[String], tsCol: String,
      gap: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, struct, to_json}
    require(df.isStreaming, "annotate is the streaming form; batch " +
      "statements take WindowTvf's analytic expansion")
    require(partCols.nonEmpty, "SESSION needs PARTITION BY keys")
    val gapIv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(gapIv.months == 0, "session gap must be a fixed-length interval")
    // the operator works in MICROSECONDS end to end — timestamp columns
    // carry micros, and the gap merge must not truncate them (a pair
    // 1ms-resolution-equal but micros-apart would merge wrongly)
    val gapMicros = gapIv.days * 86400000000L + gapIv.microseconds
    require(gapMicros > 0, s"session gap must be positive, got $gap")

    val keyExpr = StreamKeys.text(partCols)
    val inSchema = df.schema
    // no derived time column: casting tsCol would CLONE its event-time
    // watermark metadata and Spark rejects streams with two event-time
    // columns — the processor reads the original column instead
    // the event-time column must be TIMESTAMP: Spark's watermark (which
    // annotate requires) rejects TIMESTAMP_NTZ event time outright
    // (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), so an NTZ branch here would
    // be unreachable — fail loudly at the operator boundary instead
    require(inSchema(tsCol).dataType == TimestampType,
      s"$tsCol must be TIMESTAMP (streaming event time cannot be " +
        s"${inSchema(tsCol).dataType.simpleString}; cast before annotate)")
    val tagged = df.withColumn("__sw_key", keyExpr)
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("window_start", TimestampType),
      StructField("window_end", TimestampType),
      StructField("window_time", TimestampType)))
    implicit val outEnc: org.apache.spark.sql.Encoder[Row] = Encoders.row(outSchema)
    implicit val keyEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    tagged
      .groupByKey((r: Row) => r.getString(r.fieldIndex("__sw_key")))
      .transformWithState(
        new SessionAnnotateProcessor(tagged.schema, inSchema, tsCol, gapMicros),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Pure close/retain core, unit-testable without a streaming query:
    * gap-split the (sorted) buffered timestamps into runs; a run whose
    * last element + gap ≤ wm is a CLOSED session. Returns (closed runs
    * as (start, end) index ranges into the sorted order, retained from).
    * Unit-agnostic — the processor calls it in microseconds.
    */
  def closedSessions(sortedTs: IndexedSeq[Long], gapUnits: Long,
      wm: Long): (Seq[(Int, Int)], Int) = {
    if (sortedTs.isEmpty) return (Nil, 0)
    val runs = Seq.newBuilder[(Int, Int)]
    var runStart = 0
    var i = 1
    while (i <= sortedTs.length) {
      val runEnds = i == sortedTs.length ||
        sortedTs(i) - sortedTs(i - 1) > gapUnits
      if (runEnds) {
        if (sortedTs(i - 1) + gapUnits <= wm) runs += ((runStart, i))
        else return (runs.result(), runStart) // later runs close even later
        runStart = i
      }
      i += 1
    }
    (runs.result(), sortedTs.length)
  }

  /** Merge sorted fresh timestamps into a sorted, disjoint,
    * gap-separated run set — the MergingWindowSet merge step. Runs are
    * (minTs, maxTs) spans; two spans merge when they are within
    * `gapUnits` of each other. O(|runs| + |fresh|), unit-agnostic.
    */
  def mergeRuns(runs: IndexedSeq[(Long, Long)], freshSorted: IndexedSeq[Long],
      gapUnits: Long): IndexedSeq[(Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def push(lo: Long, hi: Long): Unit = {
      if (out.nonEmpty && lo - out.last._2 <= gapUnits) {
        val (plo, phi) = out.last
        out(out.length - 1) = (plo, math.max(phi, hi))
      } else out += ((lo, hi))
    }
    var i = 0
    var j = 0
    while (i < runs.length || j < freshSorted.length) {
      if (j >= freshSorted.length ||
          (i < runs.length && runs(i)._1 <= freshSorted(j))) {
        push(runs(i)._1, runs(i)._2); i += 1
      } else { push(freshSorted(j), freshSorted(j)); j += 1 }
    }
    out.toIndexedSeq
  }

  class SessionAnnotateProcessor(taggedSchema: StructType,
      inSchema: StructType, tsCol: String, gapMicros: Long)
      extends StatefulProcessor[String, Row, Row] {
    private val bufSchema = StructType(Seq(
      StructField("ts", LongType),
      StructField("p", inSchema)))
    private val runSchema = StructType(Seq(
      StructField("mins", ArrayType(LongType, containsNull = false)),
      StructField("maxs", ArrayType(LongType, containsNull = false))))
    @transient private var buf: ListState[Row] = _
    @transient private var runs: ValueState[Row] = _
    private val tsIdx = taggedSchema.fieldIndex(tsCol)
    private val inIdxs = inSchema.fieldNames.map(taggedSchema.fieldIndex)

    /** Event time in epoch MICROS — full column precision, so gap
      * merges and emitted bounds never truncate. (The annotate boundary
      * guarantees TimestampType; the other cases are defensive.)
      */
    private def tsMicros(r: Row): Long = r.get(tsIdx) match {
      case t: java.sql.Timestamp =>
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      case d: java.time.LocalDateTime =>
        val i = d.toInstant(java.time.ZoneOffset.UTC)
        i.getEpochSecond * 1000000L + i.getNano / 1000L
      case i: java.time.Instant =>
        i.getEpochSecond * 1000000L + i.getNano / 1000L
      case other => throw new IllegalArgumentException(
        s"$tsCol is not an event-time column (got $other)")
    }

    private def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[Row]("buf",
        Encoders.row(bufSchema), TTLConfig.NONE)
      runs = getHandle.getValueState[Row]("runs",
        Encoders.row(runSchema), TTLConfig.NONE)
    }

    private def loadRuns(): IndexedSeq[(Long, Long)] = {
      val r = runs.get()
      if (r == null) IndexedSeq.empty
      else {
        val mins = r.getSeq[Long](0)
        val maxs = r.getSeq[Long](1)
        mins.indices.map(i => (mins(i), maxs(i)))
      }
    }

    private def saveRuns(rs: IndexedSeq[(Long, Long)]): Unit =
      if (rs.isEmpty) runs.clear()
      else runs.update(new org.apache.spark.sql.catalyst.expressions.GenericRow(
        Array[Any](rs.map(_._1), rs.map(_._2))))

    /** Timers are millis: round UP so the timer fires strictly after
      * the run's close instant `maxUs + gap`.
      */
    private def timerMs(maxUs: Long): Long =
      Math.floorDiv(maxUs + gapMicros, 1000L) + 1L

    override def handleInputRows(key: String, rows: Iterator[Row],
        timerValues: TimerValues): Iterator[Row] = {
      // the watermark API is millis; compare conservatively in micros
      // (a row inside the watermark's open millisecond still buffers)
      val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
      val fresh = scala.collection.mutable.ArrayBuffer.empty[Long]
      val newRows = scala.collection.mutable.ArrayBuffer.empty[Row]
      rows.foreach { r =>
        val ts = tsMicros(r)
        if (ts > wmUs) { // at-or-behind the watermark = late, dropped
          newRows += new org.apache.spark.sql.catalyst.expressions.GenericRow(
            Array[Any](ts, new org.apache.spark.sql.catalyst.expressions.GenericRow(
              inIdxs.map(r.get(_)).toArray[Any])))
          fresh += ts
        }
      }
      if (fresh.nonEmpty) {
        // one state call for the whole batch, not a merge per row
        buf.appendList(newRows.toArray)
        val before = loadRuns()
        val after =
          SessionWindows.mergeRuns(before, fresh.sortInPlace().toIndexedSeq,
            gapMicros)
        // one timer per OPEN RUN: re-arm only the runs whose close
        // instant moved, delete the spans they superseded
        val oldTimers = before.iterator.map(r => timerMs(r._2)).toSet
        val newTimers = after.iterator.map(r => timerMs(r._2)).toSet
        (oldTimers diff newTimers).foreach(getHandle.deleteTimer)
        (newTimers diff oldTimers).foreach(getHandle.registerTimer)
        saveRuns(after)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Row] = {
      val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
      // the run index answers "did anything close?" without touching
      // the row buffer — a superseded timer exits on this cheap path
      val rs = loadRuns()
      var nClosed = 0
      while (nClosed < rs.length && rs(nClosed)._2 + gapMicros <= wmUs)
        nClosed += 1
      if (nClosed == 0) return Iterator.empty
      val boundary = rs(nClosed - 1)._2
      val buffered = buf.get().toIndexedSeq
        .map(r => (r.getLong(0), r.getStruct(1)))
      val (closedRows, retained) = buffered.partition(_._1 <= boundary)
      buf.clear()
      if (retained.nonEmpty) buf.appendList(retained.map { case (ts, p) =>
        new org.apache.spark.sql.catalyst.expressions.GenericRow(
          Array[Any](ts, p)): Row
      }.toArray)
      saveRuns(rs.drop(nClosed))
      val sorted = closedRows.sortBy(_._1)
      var idx = 0
      rs.take(nClosed).iterator.flatMap { case (lo, hi) =>
        val end = hi + gapMicros
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (idx < sorted.length && sorted(idx)._1 <= hi) {
          val (_, p) = sorted(idx)
          out += new org.apache.spark.sql.catalyst.expressions.GenericRow(
            (p.toSeq ++ Seq(toTs(lo), toTs(end),
              toTs(end - 1000L))).toArray[Any])
          idx += 1
        }
        out.iterator
      }
    }
  }
}
