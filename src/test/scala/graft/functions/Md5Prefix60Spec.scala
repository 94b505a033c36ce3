package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSuite

/** Native 60-bit md5 prefix: bit-identity with the composed
  * conv(substring(md5, 1, 15), 16, 10) form the DuckDB oracles mirror.
  */
class Md5Prefix60Spec extends SparkSuite {
  import spark.implicits._

  test("matches conv(substring(md5(s),1,15),16,10) on random strings") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(500)(rnd.alphanumeric.take(rnd.nextInt(30)).mkString) :+
      "" :+ "a b c" :+ "ünïcode ✓"
    val df = rows.toDF("s")
    val out = df.select(
        Md5Prefix60($"s").as("native"),
        conv(substring(md5($"s"), 1, 15), 16, 10).cast(LongType).as("composed"))
      .as[(Long, Long)].collect()
    out.foreach { case (n, c) => assert(n == c) }
    // 60-bit: always non-negative
    assert(out.forall(_._1 >= 0))
  }

  test("non-string input fails at analysis, not mid-job") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(3).select(Md5Prefix60($"id").as("h")).collect()
    }
    assert(e.getMessage.contains("graft_md5_prefix60"))
  }

  test("null input yields null and codegen stays whole-stage") {
    val df = spark.range(4)
      .select(when($"id" % 2 === 0, concat(lit("w"), $"id")).as("s"))
      .select(Md5Prefix60($"s").as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
    val got = df.as[Option[Long]].collect()
    assert(got.count(_.isEmpty) == 2 && got.count(_.isDefined) == 2)
  }
}
