package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The CEP differential-fuzz layer ([[CepFuzzGen]]) in CI form: every
  * seeded pattern runs BOTH ways on this engine — through the NFA
  * (CEP.batch under SkipToNext) and as the equivalent LEAD window plan
  * built from the SAME predicate SQL fragments — and the match sets
  * must be equal. A divergence would expose NFA bugs (branch pruning,
  * within-window arithmetic, skip-strategy anchoring) the five
  * hand-written q_cep_* rows can't reach. The cross-engine half runs
  * via `graft.StreamFuzzDump ... cep` + `dev/check.py`, and two
  * shape-representative seeds are permanent driver-gated rows
  * (`q_fuzz_cep_*`).
  */
class CepFuzzSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("generator is deterministic and covers its arms") {
    for (s <- Seq(1L, 7L, 4242L))
      assert(CepFuzzGen.gen(s) == CepFuzzGen.gen(s))
    val cs = (1L to 24L).map(CepFuzzGen.gen)
    assert(cs.exists(_.steps.length == 2) && cs.exists(_.steps.length == 3))
    assert(cs.exists(_.withinMinutes.isEmpty) &&
      cs.exists(_.withinMinutes.isDefined))
    val arms = cs.flatMap(_.steps).map(_.getClass.getSimpleName).toSet
    assert(arms.size >= 3, s"step arms drawn: $arms")
  }

  test("NFA matches equal the LEAD window restatement per seed") {
    for (seed <- 1L to 12L) {
      val c = CepFuzzGen.gen(seed)
      val k = c.steps.length
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      var o = Q.t(spark, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"),
          col("event_type"),
          expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("cents"))
      for (i <- 1 until k) {
        o = o.withColumn(s"event_type_$i", lead(col("event_type"), i).over(w))
          .withColumn(s"event_id_$i", lead(col("event_id"), i).over(w))
          .withColumn(s"cents_$i", lead(col("cents"), i).over(w))
          .withColumn(s"us_$i", lead(col("us"), i).over(w))
      }
      val preds = c.steps.zipWithIndex.map { case (p, i) =>
        p.sql(if (i == 0) "" else s"_$i")
      } ++ c.withinMinutes.map(m =>
        s"us_${k - 1} <= us + ${m * 60000000L}")
      val expected = o.filter(preds.map(p => s"($p)").mkString(" AND "))
        .select(col("user_id"), col("event_id").as("a_id"),
          col(s"event_id_${k - 1}").as("z_id"))
        .collect().map(_.toString).sorted.toSeq
      val actual = CepQueries.cepFuzzReplay(spark, dir, c)
        .collect().map(_.toString).sorted.toSeq
      assert(actual == expected,
        s"cep seed $seed diverged: steps=${c.steps} " +
          s"within=${c.withinMinutes} " +
          s"(lead-plan=${expected.length} rows, nfa=${actual.length})")
    }
  }
}
