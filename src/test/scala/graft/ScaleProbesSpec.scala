package graft

import graft.queries.ScaleProbes

/** The TPC scale-law probe machinery (queries/ScaleProbes): replication
  * is exact (8× rows, replica-disjoint keys), plan stability asserts run
  * at both factors, and the probe restores the 1× views for whatever
  * runs next in the session.
  */
class ScaleProbesSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("replication grows tables exactly factor-fold with disjoint keys") {
    Tables.registerAll(spark, dir)
    val base = spark.table("lineitem").count()
    val baseOrders = spark.table("orders").count()
    val baseKeys = spark.table("orders")
      .select("o_orderkey").distinct().count()
    ScaleProbes.registerReplicated(spark, dir, 8)
    try {
      assert(spark.table("lineitem").count() == 8 * base)
      assert(spark.table("orders").count() == 8 * baseOrders)
      // key shift keeps replicas join-disjoint: distinct keys also 8×
      assert(spark.table("orders")
        .select("o_orderkey").distinct().count() == 8 * baseKeys)
      // nation stays a fixed dim
      assert(spark.table("nation").count() ==
        Tables.load(spark, dir, "nation").count())
    } finally Tables.registerAll(spark, dir)
  }

  test("8x probes run all shapes without plan flips and restore 1x views") {
    Tables.registerAll(spark, dir)
    val base = spark.table("lineitem").count()
    for (name <- Seq("b_tpch_scale8", "b_tpcds_scale8")) {
      val out = SparkEntry.benchOnly(name)(spark, dir).collect()
      // one row per shape; the plan-stability requires inside the probe
      // have already passed if we got here
      assert(out.nonEmpty && out.forall(_.getLong(0) >= 0L),
        s"$name returned ${out.toSeq}")
    }
    // the probe re-registered the originals on its way out
    assert(spark.table("lineitem").count() == base)
  }

  test("64x second-octave probe runs without plan flips at sf0.001") {
    Tables.registerAll(spark, dir)
    val out = SparkEntry.benchOnly("b_tpch18_scale64")(spark, dir).collect()
    assert(out.length == 1 && out.head.getLong(0) >= 0L,
      s"b_tpch18_scale64 returned ${out.toSeq}")
    // 64× replication really is 64-fold (the generator is factor-generic,
    // but the second octave is the first caller above 8)
    ScaleProbes.registerReplicated(spark, dir, 64)
    try assert(spark.table("lineitem").count() ==
      64 * Tables.load(spark, dir, "lineitem").count())
    finally Tables.registerAll(spark, dir)
  }
}
