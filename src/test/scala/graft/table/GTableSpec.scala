package graft.table

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** The fluent Table facade must produce the same results as the direct
  * DataFrame plan (it IS the same plan).
  */
class GTableSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("select/filter/groupBy/orderBy/fetch chain") {
    val t = GTable(Tables.load(spark, sf, "orders"))
    val got = t
      .filter($"o_totalprice" > 1000)
      .groupBy($"o_orderstatus")
      .select($"o_orderstatus", count(lit(1)).as("n"))
      .orderBy($"o_orderstatus")
      .fetch(2)
      .toDF.as[(String, Long)].collect().toSeq
    val want = Tables.load(spark, sf, "orders")
      .filter($"o_totalprice" > 1000)
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy($"o_orderstatus").limit(2)
      .as[(String, Long)].collect().toSeq
    assert(got == want)
  }

  test("joins and set ops") {
    val c = GTable(Tables.load(spark, sf, "customer"))
    val n = GTable(Tables.load(spark, sf, "nation"))
    val joined = c.join(n, $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name")
    assert(joined.toDF.count() == Tables.load(spark, sf, "customer").count())
    val a = c.select($"c_nationkey".as("k"))
    val b = GTable(Tables.load(spark, sf, "supplier")).select($"s_nationkey".as("k"))
    assert(a.intersect(b).toDF.count() == a.toDF.intersect(b.toDF).count())
    assert(a.minus(b).toDF.count() == a.toDF.except(b.toDF).count())
  }

  test("tumble group-window through the facade") {
    val e = GTable(Tables.load(spark, sf, "events"))
    val got = e.window(Tumble($"ts", "1 hour"), $"event_type")
      .select($"window.start".as("ws"), $"event_type", count(lit(1)).as("n"))
      .orderBy($"ws", $"event_type")
      .toDF.count()
    val want = Tables.load(spark, sf, "events")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1))).count()
    assert(got == want)
  }

  test("over-window builder") {
    val o = GTable(Tables.load(spark, sf, "orders"))
    val w = GOver.partitionBy($"o_orderstatus").orderBy($"o_orderkey").unboundedPreceding
    val got = o.select($"o_orderkey", sum($"o_totalprice").over(w).as("run"))
      .toDF.count()
    assert(got == Tables.load(spark, sf, "orders").count())
  }
}
