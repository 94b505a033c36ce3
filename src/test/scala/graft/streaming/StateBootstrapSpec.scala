package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import StateBootstrap._

/** State Processor write-side semantics (SavepointWriter /
  * bootstrapWith): batch-built initial state, continuation across the
  * handover, and the full stop→read→REWRITE→boot successor loop.
  */
class StateBootstrapSpec extends SparkSuite {
  import spark.implicits._

  private def run(bootstrap: org.apache.spark.sql.Dataset[BInit],
      batches: Seq[Seq[BIn]], ckpt: String): Map[String, (Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[BIn]
    val out = StateBootstrap.agg(input.toDS(), bootstrap)
    val name = s"sb_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[BOut].collect()
      .groupBy(_.key).map { case (k, rows) =>
        val last = rows.maxBy(_.n)
        k -> (last.n, last.cents)
      }
  }

  test("a batch-built bootstrap frame seeds keyed state before batch one") {
    val boot = Seq(BInit("a", 5L, 100L)).toDS()
    val fin = run(boot, Seq(Seq(BIn("a", 10L), BIn("b", 1L))),
      tmpDir("sb_seed"))
    // a continues from (5,100); b starts empty
    assert(fin == Map("a" -> ((6L, 110L)), "b" -> ((1L, 1L))))
  }

  test("stop, read, rewrite, boot: the savepoint-rewrite loop") {
    val ckpt1 = tmpDir("sb_phase1")
    val fin1 = run(spark.emptyDataset[BInit],
      Seq(Seq(BIn("a", 10L), BIn("a", 20L), BIn("b", 7L))), ckpt1)
    assert(fin1 == Map("a" -> ((2L, 30L)), "b" -> ((1L, 7L))))

    // offline read of the stopped query's accumulator state
    val state = StateBootstrap.readAccState(spark, ckpt1)
    assert(state.collect().toSet ==
      Set(BInit("a", 2L, 30L), BInit("b", 1L, 7L)))

    // REWRITE: drop key b, double a's cents (schema-compatible state
    // migration, expressed declaratively on the read frame)
    val rewritten = state.filter($"key" =!= "b")
      .select($"key", $"n", ($"cents" * 2).as("cents")).as[BInit]

    val fin2 = run(rewritten, Seq(Seq(BIn("a", 1L), BIn("b", 2L))),
      tmpDir("sb_phase2"))
    // a continues from the REWRITTEN (2,60); b restarts from empty
    assert(fin2 == Map("a" -> ((3L, 61L)), "b" -> ((1L, 2L))))
  }

  test("queryable state: point reads of a RUNNING query's live state") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("sb_live")
    val input = MemoryStream[BIn]
    val out = StateBootstrap.agg(input.toDS(), spark.emptyDataset[BInit])
    val q = out.writeStream.format("memory")
      .queryName(s"sbl_${System.nanoTime()}")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      input.addData(Seq(BIn("a", 10L), BIn("b", 5L)))
      q.processAllAvailable()
      // the query is STILL RUNNING: point-read key a's committed state
      def readA() = StateReader.point(spark, ckpt, "acc", "a")
        .select($"value.n", $"value.cents").as[(Long, Long)].collect().toSeq
      assert(q.isActive && readA() == Seq((1L, 10L)))
      // a later batch becomes visible at its commit (read-committed)
      input.addData(Seq(BIn("a", 7L)))
      q.processAllAvailable()
      assert(q.isActive && readA() == Seq((2L, 17L)))
      // absent key: empty, not an error
      assert(StateReader.point(spark, ckpt, "acc", "zzz").isEmpty)
    } finally q.stop()
  }
}
