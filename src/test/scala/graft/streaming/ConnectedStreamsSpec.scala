package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.SparkSuite
import ConnectedStreams._

/** Connected-streams / broadcast-state, late-data side output, and
  * foreachBatch window top-n (the §2.7 window-rank streaming shape).
  */
class ConnectedStreamsSpec extends SparkSuite {
  import spark.implicits._

  test("control stream updates per-key threshold for the data stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tagged]
    val out = input.toDS().groupByKey(_.key)
      .transformWithState(new ThresholdProcessor(defaultThreshold = 10),
        TimeMode.None(), OutputMode.Update())
    val name = s"ctl_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt")).start()
    try {
      // default threshold 10: only 50 passes
      input.addData(Seq(
        Tagged("a", isControl = false, 0, 5),
        Tagged("a", isControl = false, 0, 50)))
      q.processAllAvailable()
      // control lowers the threshold to 1: 5 passes now
      input.addData(Seq(
        Tagged("a", isControl = true, 1, 0),
        Tagged("a", isControl = false, 0, 5)))
      q.processAllAvailable()
      val rows = spark.table(name).as[Flagged].collect().toSeq
      assert(rows.map(f => (f.value, f.threshold)).toSet ==
        Set((50L, 10L), (5L, 1L)))
    } finally q.stop()
  }

  test("late-data side channel splits rows behind the watermark") {
    val df = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), "on-time"),
      (Timestamp.valueOf("2024-01-01 08:00:00"), "late")
    ).toDF("ts", "tag")
    val (onTime, late) = LateData.sideOutputLate(df, "ts",
      Timestamp.valueOf("2024-01-01 09:00:00"))
    assert(onTime.select("tag").as[String].collect().toSeq == Seq("on-time"))
    assert(late.select("tag").as[String].collect().toSeq == Seq("late"))
  }

  test("foreachBatch window top-n over finalized windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long)]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val agg = input.toDS().toDF("ts", "user", "v")
      .withWatermark("ts", "5 seconds")
      .groupBy(window($"ts", "60 seconds"), $"user")
      .agg(sum($"v").as("s"))
      .select($"window.start".cast("long").as("ws"), $"user", $"s")
    val q = agg.writeStream
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // rank within each finalized window, keep top-1 per window
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("ws")).orderBy(col("s").desc, col("user"))
        batch.select(col("ws"), col("user"), col("s"),
            row_number().over(w).as("rn"))
          .filter(col("rn") === 1)
          .collect()
          .foreach(r => results += ((r.getLong(0), r.getString(1), r.getLong(2))))
        ()
      }
      .start()
    try {
      def ts(sec: Long) = new Timestamp(sec * 1000)
      input.addData(Seq((ts(10), "u1", 5L), (ts(20), "u2", 9L)))
      q.processAllAvailable()
      input.addData(Seq((ts(100), "u1", 1L))) // closes window [0,60)
      q.processAllAvailable()
      assert(results.toSeq == Seq((0L, "u2", 9L)))
    } finally q.stop()
  }
}
