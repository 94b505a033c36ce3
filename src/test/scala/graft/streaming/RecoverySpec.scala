package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Exactly-once / checkpoint recovery (§2.10 checkpointing row — Spark's
  * WAL + state-store commit replaces the reference's barrier snapshots)
  * and the two-input coGroup surface (DataStream.coGroup:748).
  */
class RecoverySpec extends SparkSuite {
  import spark.implicits._

  test("query restart from checkpoint resumes state, no duplicates in sink") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("ckpt")
    val input = MemoryStream[(String, Long)]
    // complete-mode count over a checkpointed state store: the count must
    // survive a stop + restart from the same checkpoint.
    val name = s"rec_${System.nanoTime()}"
    def startMem() = input.toDS().toDF("k", "v")
      .groupBy($"k").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .start()

    val q1 = startMem()
    try {
      input.addData(Seq(("a", 1L), ("a", 2L)))
      q1.processAllAvailable()
      assert(spark.table(name).as[(String, Long)].collect().toSet == Set(("a", 2L)))
    } finally q1.stop()

    // restart from the same checkpoint: prior counts must survive
    val q2 = startMem()
    try {
      input.addData(Seq(("a", 3L), ("b", 9L)))
      q2.processAllAvailable()
      val rows = spark.table(name).as[(String, Long)].collect().toSet
      assert(rows == Set(("a", 3L), ("b", 1L))) // a: 2 recovered + 1 new
    } finally q2.stop()
  }

  test("coGroup: per-key grouped sides processed together (batch)") {
    val left = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDS()
    val right = Seq(("a", 10L), ("c", 30L)).toDS()
    val out = left.groupByKey(_._1).cogroup(right.groupByKey(_._1)) {
      (key, ls, rs) =>
        Iterator.single((key, ls.map(_._2).sum, rs.map(_._2).sum))
    }.collect().toSet
    assert(out == Set(("a", 3L, 10L), ("b", 3L, 0L), ("c", 0L, 30L)))
  }
}
