package graft

/** DataStream-verb parity (§1.1 DataStream row, §3.3): the typed Dataset
  * surface covers map/flatMap/filter/keyBy(reduce/mapGroups)/union/
  * partitioning verbs 1:1 — pinned here as executable documentation.
  */
case class Click(user: String, n: Long)

class DataStreamVerbsSpec extends SparkSuite {
  import spark.implicits._

  test("map/flatMap/filter/keyBy-reduce/union chain") {
    val ds = Seq("a:1", "b:2", "a:3", "c:4").toDS()
    // map + filter (DataStream.map:599 / filter)
    val parsed = ds.map { s => val Array(u, n) = s.split(":"); (u, n.toLong) }
      .filter(_._2 > 1)
    // keyBy + reduce (KeyedStream.reduce)
    val reduced = parsed.groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, a._2 + b._2))
      .map(_._2)
    assert(reduced.collect().toSet == Set(("b", 2L), ("a", 3L), ("c", 4L)))
    // flatMap (DataStream.flatMap)
    val exploded = ds.flatMap(_.split(":").toSeq)
    assert(exploded.count() == 8)
    // union (DataStream.union:1280) + rebalance/rescale analogues
    val unioned = parsed.union(Seq(("z", 9L)).toDS()).repartition(2)
    assert(unioned.rdd.getNumPartitions == 2)
    assert(unioned.count() == 4)
    // keyBy + mapGroups (KeyedStream.process batch analogue)
    val processed = parsed.groupByKey(_._1)
      .mapGroups { (k, it) => Click(k, it.map(_._2).max) }
    assert(processed.collect().map(c => c.user -> c.n).toMap ==
      Map("b" -> 2L, "a" -> 3L, "c" -> 4L))
  }

  test("physical partitioning verbs (DataStream.shuffle/rescale/global/partitionCustom/broadcast)") {
    import org.apache.spark.sql.functions._
    val ds = (1L to 100L).toDF("id")
    // shuffle/rebalance/rescale → round-robin repartition to a width
    val rebalanced = ds.repartition(5)
    assert(rebalanced.rdd.getNumPartitions == 5)
    // global → everything to one partition
    assert(ds.repartition(1).rdd.getNumPartitions == 1)
    // partitionCustom → hash-partition by an expression; co-partitioned
    // rows land together (the custom Partitioner contract)
    val custom = ds.repartition(4, col("id") % 4)
    val partOf = custom.withColumn("p", spark_partition_id())
      .select((col("id") % 4).as("k"), col("p")).distinct().collect()
    assert(partOf.groupBy(_.getLong(0)).forall(_._2.length == 1))
    // broadcast → replicate the small side to every task (broadcast join)
    val joined = ds.join(broadcast(Seq((1L, "one")).toDF("id", "name")), "id")
    assert(joined.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    assert(joined.count() == 1)
  }
}
