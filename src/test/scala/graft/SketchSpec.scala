package graft

import org.apache.spark.sql.functions._

/** Sketch operators (the "novel sketch" class of custom operators): Bloom
  * filter and count-min sketch via DataFrameStatFunctions, and the
  * HLL++ cardinality estimate every agg query can use. Each sketch is
  * built distributed (one pass, mergeable partial sketches — the same
  * partial/final shape as the reference's two-stage aggregation).
  */
class SketchSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bloom filter membership: no false negatives, bounded fp rate") {
    val orders = Tables.load(spark, sf, "orders")
    val bf = orders.stat.bloomFilter($"o_orderkey", expectedNumItems = 2000, fpp = 0.01)
    val keys = orders.select($"o_orderkey").as[Long].collect()
    assert(keys.forall(bf.mightContain)) // no false negatives, ever
    val misses = (1000000L to 1002000L).count(bf.mightContain)
    assert(misses < 100) // ~1% fpp with margin
  }

  test("count-min sketch overestimates but never underestimates") {
    val li = Tables.load(spark, sf, "lineitem")
    val cms = li.stat.countMinSketch($"l_returnflag", eps = 0.01,
      confidence = 0.99, seed = 42)
    val exact = li.groupBy($"l_returnflag").count()
      .as[(String, Long)].collect().toMap
    exact.foreach { case (flag, n) =>
      val est = cms.estimateCount(flag)
      assert(est >= n && est <= n + (0.02 * cms.totalCount()).toLong,
        s"flag $flag exact=$n est=$est")
    }
  }

  test("hll++ estimate within configured relative error") {
    val li = Tables.load(spark, sf, "lineitem")
    val exact = li.select(countDistinct($"l_orderkey")).as[Long].head()
    val est = li.select(approx_count_distinct($"l_orderkey", 0.02)).as[Long].head()
    assert(math.abs(est - exact).toDouble / exact < 0.1)
  }
}
