package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Offline state inspection — the engine's analogue of the reference's
  * State Processor API (flink-state-processing-api/.../SavepointReader.java:59):
  * Spark's `statestore` reader opens a checkpoint's state store without
  * the query running, the same "read operator state from a savepoint"
  * capability (read-only here; the reference can also rewrite).
  */
class StateReaderSpec extends SparkSuite {
  import spark.implicits._

  test("statestore format reads a stopped query's aggregation state") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("ckpt_reader")
    val input = MemoryStream[(String, Long)]
    val agg = input.toDS().toDF("k", "v").groupBy($"k").agg(sum($"v").as("s"))
    val q = agg.writeStream.format("memory")
      .queryName(s"sr_${System.nanoTime()}")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try {
      input.addData(Seq(("a", 5L), ("b", 7L), ("a", 3L)))
      q.processAllAvailable()
    } finally q.stop()

    // offline read: the keyed aggregation state survives in the store
    // the value struct carries the aggregation BUFFER fields (sum), not
    // the output aliases — exactly the savepoint-reader view of state
    val state = StateReader.store(spark, ckpt)
      .select($"key.k".as("k"), $"value".getField("sum").as("s"))
      .as[(String, Long)].collect().toMap
    assert(state == Map("a" -> 8L, "b" -> 7L))
  }

  test("StateReader reads an OuterJoinProcessor's MapStates offline") {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import OuterJoin._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("ckpt_oj")
    val input = MemoryStream[JoinInput[String, String, Long]]
    val joined = input.toDS().groupByKey(_.key)
      .transformWithState(
        new OuterJoinProcessor[String, String, Long](FullOuter,
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.scalaLong),
        TimeMode.None(), OutputMode.Update())
    val q = joined.writeStream.format("memory")
      .queryName(s"oj_${System.nanoTime()}")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      input.addData(Seq(
        JoinInput.addLeft[String, String, Long]("k1", "l1"),
        JoinInput.addLeft[String, String, Long]("k1", "l1"), // count 2
        JoinInput.addRight[String, String, Long]("k1", 42L),
        JoinInput.addLeft[String, String, Long]("k2", "solo")))
      q.processAllAvailable()
    } finally q.stop()

    // each MapState var is addressable by name, the savepoint-reader way:
    // (grouping key, map user-key, count) — payload → reference count
    val left = StateReader.stateVar(spark, ckpt, "left")
      .select($"key.value".as("k"), $"user_map_key.value".as("payload"),
        $"user_map_value.value".as("n"))
      .as[(String, String, Long)].collect().toSet
    assert(left == Set(("k1", "l1", 2L), ("k2", "solo", 1L)))

    val right = StateReader.stateVar(spark, ckpt, "right")
      .select($"key.value".as("k"), $"user_map_key.value".as("payload"),
        $"user_map_value.value".as("n"))
      .as[(String, Long, Long)].collect().toSet
    assert(right == Set(("k1", 42L, 1L)))
  }
}
