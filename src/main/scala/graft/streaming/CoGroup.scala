package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRow
import org.apache.spark.sql.functions.{col, lit, struct, to_json}
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
    * @param f         cogroup callback: (keyJson, windowStartMs,
    *                  leftRows, rightRows) → output rows
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
    val leftCols = left.columns.toSeq
    val rightCols = right.columns.toSeq

    def tag(df: DataFrame, side: Int): DataFrame = {
      val key =
        if (keyCols.lengthCompare(1) == 0) col(keyCols.head).cast("string")
        else to_json(struct(keyCols.map(col): _*))
      // micros-precision timestampFormat: bare to_json truncates
      // timestamps to millis, collapsing events distinct only at
      // microsecond precision inside the payload
      df.select(key.as("__key"), col(tsCol).as("__ts"), lit(side).as("__side"),
        to_json(struct(df.columns.map(col).toSeq: _*),
          java.util.Map.of("timestampFormat",
            "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")).as("__payload"))
    }
    // union of the two tagged shapes; payload travels as JSON so the
    // two sides' (different) schemas share one shuffle row layout.
    // Sliding assignment replicates each record to its covering window
    // starts BEFORE the shuffle (last start down to ts − size,
    // step slide) — one shuffle total, same as the reference.
    // FLOOR of the real-valued division (cast-to-long truncates toward
    // zero, which is ceil for negative epochs). Note Spark's streaming
    // watermark floor is epoch 0, so pre-1970 event times cannot fire
    // windows in any transformWithState operator — not just this one.
    val lastStart = org.apache.spark.sql.functions.floor(
        org.apache.spark.sql.functions.unix_millis(col("__ts"))
          .divide(lit(slideMs))).cast("long").multiply(lit(slideMs))
    val tagged = tag(left, 0).unionByName(tag(right, 1))
      .withWatermark("__ts", delay)
      .withColumn("__win", org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.sequence(
          lastStart - lit(sizeMs) + lit(slideMs), lastStart, lit(slideMs))))

    implicit val outEnc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(outSchema)
    implicit val keyEnc: org.apache.spark.sql.Encoder[(String, Long)] =
      Encoders.product[(String, Long)]
    tagged
      .groupByKey((r: Row) =>
        (r.getString(0), r.getLong(r.fieldIndex("__win"))))
      .transformWithState(
        new TumblingCoGroupProcessor(sizeMs, leftCols, rightCols, f),
        TimeMode.EventTime(), OutputMode.Append())
  }

  class TumblingCoGroupProcessor(windowMs: Long,
      leftCols: Seq[String], rightCols: Seq[String],
      f: (String, Long, Seq[Row], Seq[Row]) => Iterator[Row])
      extends StatefulProcessor[(String, Long), Row, Row] {
    @transient private var leftBuf: ListState[String] = _
    @transient private var rightBuf: ListState[String] = _
    // built once, not per buffered row on the fire path
    private lazy val leftSchema =
      StructType(leftCols.map(StructField(_, StringType)))
    private lazy val rightSchema =
      StructType(rightCols.map(StructField(_, StringType)))

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      leftBuf = getHandle.getListState[String]("left",
        Encoders.STRING, TTLConfig.NONE)
      rightBuf = getHandle.getListState[String]("right",
        Encoders.STRING, TTLConfig.NONE)
    }

    override def handleInputRows(key: (String, Long), rows: Iterator[Row],
        timerValues: TimerValues): Iterator[Row] = {
      val winEnd = key._2 + windowMs
      // window already fired (or would fire immediately) → late, drop
      if (timerValues.getCurrentWatermarkInMs() >= winEnd)
        return Iterator.empty
      val ls = scala.collection.mutable.ArrayBuffer.empty[String]
      val rs = scala.collection.mutable.ArrayBuffer.empty[String]
      rows.foreach { r =>
        if (r.getInt(2) == 0) ls += r.getString(3) else rs += r.getString(3)
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
      def parse(json: String, cols: Seq[String], schema: StructType): Row = {
        val m = parseFlatJson(json)
        // carry a schema (all-string payload) so callbacks can read
        // fields by name
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          cols.map(c => m.getOrElse(c, null)).toArray[Any], schema)
      }
      val ls = leftBuf.get().map(parse(_, leftCols, leftSchema)).toIndexedSeq
      val rs = rightBuf.get().map(parse(_, rightCols, rightSchema)).toIndexedSeq
      leftBuf.clear(); rightBuf.clear()
      f(key._1, key._2, ls, rs)
    }
  }

  /** Minimal flat-JSON object parser for the payload round-trip (values
    * come back as String; the cogroup callback casts as needed). Handles
    * string escapes; nested objects/arrays are returned as raw text.
    */
  def parseFlatJson(s: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = s.indexOf('{') + 1
    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def readString(): String = {
      val sb = new StringBuilder
      i += 1 // opening quote
      while (i < s.length && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => sb += '\n'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 'b' => sb += '\b'; i += 2
            case 'f' => sb += '\f'; i += 2
            case 'u' if i + 5 < s.length =>
              sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
              i += 6
            case c => sb += c; i += 2
          }
        } else { sb += s.charAt(i); i += 1 }
      }
      i += 1 // closing quote
      sb.toString
    }
    def readValue(): String = {
      skipWs()
      if (i < s.length && s.charAt(i) == '"') readString()
      else {
        // non-string value: number/bool/null, or a nested object/array
        // returned as raw text — the depth scan must not count braces
        // inside nested STRING literals
        val start = i
        var depth = 0
        while (i < s.length && (depth > 0 ||
            (s.charAt(i) != ',' && s.charAt(i) != '}'))) {
          val c = s.charAt(i)
          if (c == '"') { readString(); () }
          else {
            if (c == '{' || c == '[') depth += 1
            else if (c == '}' || c == ']') depth -= 1
            i += 1
          }
        }
        s.substring(start, i).trim
      }
    }
    while (i < s.length) {
      skipWs()
      if (i >= s.length || s.charAt(i) == '}') return out.result()
      val k = readString()
      skipWs()
      i += 1 // ':'
      out += (k -> readValue())
      skipWs()
      if (i < s.length && s.charAt(i) == ',') i += 1
    }
    out.result()
  }
}
