package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The lookup-join differential-fuzz layer ([[LookupFuzzGen]]) in CI
  * form: per seed, the deterministic fake store (clean-miss /
  * transient-fail / permanent-fail key classes) drives THREE routes —
  * the sync [[graft.operators.LookupJoin]] path (LRU cache + miss-retry
  * wrapper), and the [[graft.operators.AsyncOps]] ordered and unordered
  * paths (future ladder per invocation via AsyncRetryStrategies) — and
  * all three must equal the closed-form CASE restatement. Cache
  * evictions, partitioning, concurrent ladders, and completion order
  * must not be observable in the result. The cross-engine half:
  * promoted seeds run as `q_fuzz_lookup_*` against the same CASE in
  * DuckDB.
  */
class LookupFuzzSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("generator is deterministic and covers its arms") {
    for (s <- Seq(1L, 7L, 4242L))
      assert(LookupFuzzGen.gen(s) == LookupFuzzGen.gen(s))
    val cs = (1L to 24L).map(LookupFuzzGen.gen)
    assert(cs.map(_.cacheSize).distinct.length == 3)
    assert(cs.exists(_.failMod > 3) && cs.exists(_.maxRetries == 0))
    assert(cs.map(_.keyMod).distinct.length == 3)
  }

  test("promoted seeds cover eviction-heavy and permanent-failure shapes") {
    val shapes = FuzzQueries.lookupSeeds.map(LookupFuzzGen.gen)
    assert(shapes.exists(_.cacheSize == 1))
    assert(shapes.exists(c => c.failMod > c.maxRetries + 1))
  }

  test("sync, ordered-async, and unordered-async lookup routes match the closed form per seed") {
    for (seed <- 1L to 6L) {
      val c = LookupFuzzGen.gen(seed)
      val expected = Q.t(spark, dir, "events")
        .filter(expr(c.filterSql))
        .select(col("event_id"), (col("user_id") % c.keyMod).as("k"))
        .withColumn("v",
          when(col("k") % c.dimMod =!= c.dimRes &&
            col("k") % c.failMod <= c.maxRetries,
            col("k") * 31 + 7).otherwise(lit(-1L)))
        .collect().map(_.toString).sorted.toSeq
      val sync = LookupFuzzGen.replay(spark, dir, c)
        .collect().map(_.toString).sorted.toSeq
      assert(sync == expected,
        s"lookup seed $seed SYNC diverged: keyMod=${c.keyMod} " +
          s"dim=k%${c.dimMod}!=${c.dimRes} fail=k%${c.failMod} " +
          s"retries=${c.maxRetries} cache=${c.cacheSize} " +
          s"(expected=${expected.length}, got=${sync.length})")
      for (ordered <- Seq(true, false)) {
        val async = LookupFuzzGen.replayAsync(spark, dir, c, ordered)
          .collect().map(_.toString).sorted.toSeq
        assert(async == expected,
          s"lookup seed $seed ASYNC(ordered=$ordered) diverged " +
            s"(expected=${expected.length}, got=${async.length})")
      }
    }
  }
}
