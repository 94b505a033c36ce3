package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Source/sink surface (SURVEY.md §2.1): rate source (datagen parity),
  * file-stream sink + source with manifest commit (the reference's file
  * sink / continuous-monitoring file source), and the noop (blackhole)
  * sink. The parquet scan path itself is exercised by every oracle query.
  */
class SourceSinkSpec extends SparkSuite {
  import spark.implicits._

  test("rate source streams monotonically increasing rows (datagen parity)") {
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", 50).load()
      .select($"value")
      .writeStream.format("memory").queryName("rate_sink")
      .option("checkpointLocation", tmpDir("ckpt"))
      .start()
    try {
      val until = System.currentTimeMillis() + 20000
      while (spark.table("rate_sink").count() < 10 &&
        System.currentTimeMillis() < until) Thread.sleep(200)
      val vals = spark.table("rate_sink").as[Long].collect().sorted.toSeq
      assert(vals.size >= 10)
      assert(vals == (vals.min to vals.max)) // dense sequence, no gaps
    } finally q.stop()
  }

  test("file stream sink writes exactly-once manifest; file source reads it back") {
    implicit val sqlCtx = spark.sqlContext
    val outDir = tmpDir("filesink")
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("id", "tag")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", tmpDir("ckpt"))
      .start()
    try {
      input.addData(Seq((1L, "a"), (2L, "b")))
      q.processAllAvailable()
      input.addData(Seq((3L, "c")))
      q.processAllAvailable()
    } finally q.stop()
    // batch read-back honors the sink's commit manifest
    val rows = spark.read.parquet(outDir).as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // _spark_metadata manifest exists (two-phase-commit analogue)
    assert(new java.io.File(outDir, "_spark_metadata").exists())
  }

  test("noop sink (blackhole parity) consumes a stream without output") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val q = input.toDS().writeStream.format("noop")
      .option("checkpointLocation", tmpDir("ckpt")).start()
    try {
      input.addData(Seq(1L, 2L, 3L))
      q.processAllAvailable()
      assert(q.lastProgress == null || q.exception.isEmpty)
    } finally q.stop()
  }
}
