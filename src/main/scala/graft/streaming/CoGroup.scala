package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.{col, explode, floor, lit, sequence, struct, unix_millis}
import org.apache.spark.sql.streaming._
import org.apache.spark.sql.types._

/** Windowed coGroup of two streams — the reference's
  * `left.coGroup(right).where(...).equalTo(...).window(...).apply(fn)`
  * (flink-streaming-java `CoGroupedStreams.java`, reached from
  * `DataStream.java:748`): both sides' elements for a (key, window)
  * buffer until the window fires, then ONE callback sees the two
  * buffers TOGETHER — strictly more general than a join (it also sees
  * keys present on only one side, which is how the reference implements
  * outer joins on top of coGroup).
  *
  * Spark-first mapping: tag each side, union, shuffle once on
  * (key, windowStart) via `groupByKey`, buffer per side in keyed
  * ListState, and fire the user's cogroup function from an event-time
  * timer at window end — the same fire-once-per-window contract as the
  * reference's EvictingWindowOperator-driven apply.
  *
  * Payload codec: a TYPED union — each shuffle row carries two nullable
  * structs (`__l` over the left schema, `__r` over the right), exactly
  * one non-null, the analogue of the reference's `TaggedUnion` element
  * type (`CoGroupedStreams.java`, UnionTypeInfo/UnionSerializer): Spark
  * shuffles and RocksDB-stores the struct natively via encoders, and
  * the callback receives Rows with the side's REAL column types — no
  * per-row text encode/parse, no stringly-typed casts in user code.
  *
  * Scale shape: ONE shuffle over the union (each side shuffles once, as
  * in the reference); state per key = that window's rows on both sides,
  * evicted at the watermark-driven fire; no cross-product, no driver
  * involvement. Late rows (window already fired) drop, matching the
  * reference's default lateness of zero.
  */
object CoGroup {

  /** Tumbling-window coGroup.
    *
    * @param left      streaming side A
    * @param right     streaming side B (same key/ts column names after
    *                  their own projections)
    * @param keyCols   equality keys (`where`/`equalTo`)
    * @param tsCol     event-time column, present on both sides
    * @param windowMs  tumbling window size in milliseconds
    * @param delay     watermark delay (applied to the tagged union)
    * @param f         cogroup callback: (keyText, windowStartMs,
    *                  leftRows, rightRows) → output rows; the buffered
    *                  Rows carry each side's original schema and types
    * @param outSchema schema of the callback's output rows
    */
  def tumbling(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, windowMs: Long, delay: String,
      f: (String, Long, Seq[Row], Seq[Row]) => Iterator[Row],
      outSchema: StructType): DataFrame =
    windowed(left, right, keyCols, tsCol, windowMs, windowMs, delay, f,
      outSchema)

  /** Sliding-window coGroup — size/slide window assigner (the
    * reference's SlidingEventTimeWindows under coGroup): each record
    * joins every window covering its timestamp, so a record appears in
    * size/slide window instances. Session-gap coGroup is reached by
    * composing [[SessionWindows.annotate]] (per-row session bounds)
    * with a tumbling coGroup on `window_start`.
    */
  def sliding(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, sizeMs: Long, slideMs: Long, delay: String,
      f: (String, Long, Seq[Row], Seq[Row]) => Iterator[Row],
      outSchema: StructType): DataFrame =
    windowed(left, right, keyCols, tsCol, sizeMs, slideMs, delay, f,
      outSchema)

  private def windowed(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String, sizeMs: Long, slideMs: Long,
      delay: String, f: (String, Long, Seq[Row], Seq[Row]) => Iterator[Row],
      outSchema: StructType): DataFrame = {
    require(left.isStreaming && right.isStreaming,
      "windowed coGroup is the streaming form; batch uses Dataset.cogroup")
    require(keyCols.nonEmpty, "coGroup needs equality keys")
    require(sizeMs > 0 && slideMs > 0 && sizeMs % slideMs == 0,
      "window size must be a positive multiple of the slide")
    // state/encoder schemas: all-nullable so one-sided union rows and
    // RocksDB round-trips agree on the layout regardless of source
    // nullability
    val leftSchema = StructType(left.schema.fields.map(_.copy(nullable = true)))
    val rightSchema = StructType(right.schema.fields.map(_.copy(nullable = true)))

    // key text: StreamKeys.text — single keys cast to string; composite
    // keys encode as to_json(struct(...)), collision-free for arbitrary
    // component values including nulls and separator bytes (shared with
    // SessionWindows.annotate). Callbacks receive the key opaquely and
    // never parse composite text, so the encoding is an internal
    // detail. One expression serves both sides — it only references the
    // shared key column names.
    val keyExpr = StreamKeys.text(keyCols)

    def tag(df: DataFrame, side: Int): DataFrame = {
      val payload = struct(df.columns.map(col).toSeq: _*)
      val (l, r) =
        if (side == 0) (payload.cast(leftSchema), lit(null).cast(rightSchema))
        else (lit(null).cast(leftSchema), payload.cast(rightSchema))
      df.select(keyExpr.as("__key"), col(tsCol).as("__ts"),
        lit(side).as("__side"), l.as("__l"), r.as("__r"))
    }
    // union of the two tagged shapes; the side structs travel typed so
    // the two sides' (different) schemas share one shuffle row layout.
    // Sliding assignment replicates each record to its covering window
    // starts BEFORE the shuffle (last start down to ts − size,
    // step slide) — one shuffle total, same as the reference.
    // FLOOR of the real-valued division (cast-to-long truncates toward
    // zero, which is ceil for negative epochs). Note Spark's streaming
    // watermark floor is epoch 0, so pre-1970 event times cannot fire
    // windows in any transformWithState operator — not just this one.
    val lastStart = floor(unix_millis(col("__ts")).divide(lit(slideMs)))
      .cast("long").multiply(lit(slideMs))
    val tagged = tag(left, 0).unionByName(tag(right, 1))
      .withWatermark("__ts", delay)
      .withColumn("__win", explode(
        sequence(lastStart - lit(sizeMs) + lit(slideMs), lastStart,
          lit(slideMs))))

    implicit val outEnc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(outSchema)
    implicit val keyEnc: org.apache.spark.sql.Encoder[(String, Long)] =
      Encoders.product[(String, Long)]
    tagged
      .groupByKey((r: Row) =>
        (r.getString(0), r.getLong(r.fieldIndex("__win"))))
      .transformWithState(
        new WindowedCoGroupProcessor(sizeMs, leftSchema, rightSchema, f),
        TimeMode.EventTime(), OutputMode.Append())
  }

  class WindowedCoGroupProcessor(windowMs: Long,
      leftSchema: StructType, rightSchema: StructType,
      f: (String, Long, Seq[Row], Seq[Row]) => Iterator[Row])
      extends StatefulProcessor[(String, Long), Row, Row] {
    @transient private var leftBuf: ListState[Row] = _
    @transient private var rightBuf: ListState[Row] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      // typed ListState: rows persist in the row-encoder's binary form,
      // the analogue of the reference's heap/RocksDB ListState over the
      // TaggedUnion serializer — no text round-trip
      leftBuf = getHandle.getListState[Row]("left",
        Encoders.row(leftSchema), TTLConfig.NONE)
      rightBuf = getHandle.getListState[Row]("right",
        Encoders.row(rightSchema), TTLConfig.NONE)
    }

    override def handleInputRows(key: (String, Long), rows: Iterator[Row],
        timerValues: TimerValues): Iterator[Row] = {
      val winEnd = key._2 + windowMs
      // window already fired (or would fire immediately) → late, drop
      if (timerValues.getCurrentWatermarkInMs() >= winEnd)
        return Iterator.empty
      val ls = scala.collection.mutable.ArrayBuffer.empty[Row]
      val rs = scala.collection.mutable.ArrayBuffer.empty[Row]
      rows.foreach { r =>
        if (r.getInt(2) == 0) ls += r.getStruct(3) else rs += r.getStruct(4)
      }
      if (ls.nonEmpty) leftBuf.appendList(ls.toArray)
      if (rs.nonEmpty) rightBuf.appendList(rs.toArray)
      // idempotent re-arm: one timer per (key, window) at window end
      getHandle.registerTimer(winEnd)
      Iterator.empty
    }

    override def handleExpiredTimer(key: (String, Long),
        timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo)
        : Iterator[Row] = {
      val ls = leftBuf.get().toIndexedSeq
      val rs = rightBuf.get().toIndexedSeq
      leftBuf.clear(); rightBuf.clear()
      f(key._1, key._2, ls, rs)
    }
  }
}
