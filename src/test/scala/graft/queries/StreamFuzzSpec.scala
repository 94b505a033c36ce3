package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions.col

/** The streaming differential-fuzz layer ([[StreamFuzzGen]]) in CI
  * form: every seeded case runs BOTH ways on this engine — incremental
  * (MemoryStream replay → watermark → append-mode window aggregate,
  * state-store-backed) and one-shot batch (the identical transform on
  * the batch frame) — and the results must be row-for-row equal. A
  * divergence would expose incremental-execution bugs (watermark
  * arithmetic, state eviction, window assignment) that batch-only
  * fuzzing cannot reach. The cross-engine half runs via
  * `graft.StreamFuzzDump` + `dev/check.py` (DuckDB restatements of the
  * same cases), and three shape-representative seeds are permanent
  * driver-gated rows (StreamFuzzQueries).
  */
class StreamFuzzSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("generator is deterministic per seed and covers both window kinds") {
    for (s <- Seq(1L, 7L, 4242L))
      assert(StreamFuzzGen.gen(s) == StreamFuzzGen.gen(s))
    val cases = (1L to 24L).map(StreamFuzzGen.gen)
    assert(cases.exists(_.isHop) && cases.exists(!_.isHop))
    assert(cases.exists(_.keys.length == 2))
    assert(cases.map(_.filterSql).distinct.length > 4)
  }

  test("promoted seeds cover tumble+1key, hop, and composite-key shapes") {
    val shapes = StreamFuzzQueries.seeds.map(StreamFuzzGen.gen)
    assert(shapes.exists(c => !c.isHop && c.keys.length == 1))
    assert(shapes.exists(_.isHop))
    assert(shapes.exists(c => !c.isHop && c.keys.length == 2))
  }

  test("incremental streaming replay matches the one-shot batch plan per seed") {
    val batchEv = Q.t(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp").as("ts"), col("event_type"),
        col("value"))
    for (seed <- 1L to 16L) {
      val c = StreamFuzzGen.gen(seed)
      def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
        // compare window_start as text: the replay casts to
        // timestamp_ntz for the DuckDB convention, the batch side stays
        // TIMESTAMP — same instant, different Spark type
        val cols = col("window_start").cast("string").as("ws") +:
          (c.keys.map(k => col(k._2)) ++ c.aggs.map(a => col(a._2)))
        df.select(cols: _*).collect().map(_.toString).sorted.toSeq
      }
      val expected = canon(c(batchEv))
      val actual = canon(StreamQueries.streamFuzzReplay(spark, dir, c))
      assert(actual == expected,
        s"seed $seed diverged between incremental and batch execution:\n" +
          s"filter=${c.filterSql} keys=${c.keys} win=${c.winMinutes}/" +
          s"${c.slideMinutes}m aggs=${c.aggs}\n" +
          s"batch=${expected.length} rows, stream=${actual.length} rows")
    }
  }
}
