package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The CDC-dialect differential-fuzz layer ([[CdcFuzzGen]]) in CI form:
  * per seed, ONE simulated PK-collision table history renders in all
  * FOUR changelog-JSON dialects (debezium / canal / maxwell / ogg), each
  * decodes through its [[graft.sources.ChangelogJson]] parser, and the
  * order-insensitive net-count folds must all CONVERGE — to each other
  * and to the batch last-image restatement. A dialect parser that
  * mis-reconstructs an UPDATE_BEFORE (canal/maxwell merge `old`'s
  * changed-fields-only image over `data`), mis-routes an op code, or
  * drops a batched `data` row diverges from the other three. The
  * cross-engine half: promoted seeds run as `q_fmt_canal` /
  * `q_fmt_maxwell` / `q_fmt_ogg` against DuckDB restatements.
  */
class CdcFuzzSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private val dialects = Seq("debezium", "canal", "maxwell", "ogg")

  test("generator is deterministic and covers its arms") {
    for (s <- Seq(1L, 7L, 4242L))
      assert(CdcFuzzGen.gen(s) == CdcFuzzGen.gen(s))
    val cs = (1L to 24L).map(CdcFuzzGen.gen)
    assert(cs.map(_.pkMod).distinct.length > 2)
    assert(cs.map(_.filterSql).distinct.length > 4)
    assert(cs.exists(_.canalBatchMax > 1) && cs.exists(_.canalBatchMax == 1))
  }

  test("promoted seeds exercise canal batching and distinct shapes") {
    assert(CdcFuzzGen.gen(FuzzQueries.cdcSeeds("canal")).canalBatchMax >= 2)
    assert(FuzzQueries.cdcSeeds.values.toSeq.distinct.length == 3)
  }

  test("all four dialect parsers converge to the batch last-image state per seed") {
    for (seed <- 1L to 8L) {
      val c = CdcFuzzGen.gen(seed)
      // batch restatement: last event row per key survives unless
      // delete-marked (the simulation's skip rule's fixed point)
      val expected = Q.t(spark, dir, "events")
        .filter(expr(c.filterSql))
        .select((col("user_id") % c.pkMod).as("pk"),
          col("event_id").as("ev"),
          expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("cents"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("pk")).orderBy(col("ev").desc)))
        .filter(col("rn") === 1 && !(col("ev") % c.delMod === c.delRes))
        .select(col("pk"), col("ev"), col("cents"))
        .collect().map(_.toString).sorted.toSeq
      for (d <- dialects) {
        val actual = CdcFuzzGen.replay(spark, dir, c, d)
          .collect().map(_.toString).sorted.toSeq
        assert(actual == expected,
          s"cdc seed $seed dialect $d diverged: filter=${c.filterSql} " +
            s"pkMod=${c.pkMod} del=ev%${c.delMod}=${c.delRes} " +
            s"batchMax=${c.canalBatchMax} " +
            s"(batch=${expected.length} rows, parsed=${actual.length})")
        // production-consumer route (decode → Changelog.materialize by
        // PK/seq) — one-op-per-envelope dialects only; see
        // replayMaterialized's canal note
        if (d != "canal") {
          val mat = CdcFuzzGen.replayMaterialized(spark, dir, c, d)
            .collect().map(_.toString).sorted.toSeq
          assert(mat == expected,
            s"cdc seed $seed dialect $d MATERIALIZE route diverged " +
              s"(batch=${expected.length} rows, materialized=${mat.length})")
        }
      }
    }
  }
}
