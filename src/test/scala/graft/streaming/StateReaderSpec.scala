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
    val state = spark.read.format("statestore").load(ckpt)
      .select($"key.k".as("k"), $"value".getField("sum").as("s"))
      .as[(String, Long)].collect().toMap
    assert(state == Map("a" -> 8L, "b" -> 7L))
  }
}
