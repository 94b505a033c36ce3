package graft

import org.apache.spark.sql.functions._

/** Format coverage (§2.1 formats row): csv, json, orc, parquet round-trips
  * through the engine's load path. (spark-avro / spark-protobuf connector
  * jars are not in this distribution — avro/protobuf are listed as
  * non-available formats rather than silently skipped.)
  */
class FormatsSpec extends SparkSuite {
  import spark.implicits._

  private def sample = Seq(
    (1L, "alpha", 1.5, true),
    (2L, "beta", -0.25, false),
    (3L, "gamma,delta", 0.0, true) // embedded delimiter exercises quoting
  ).toDF("id", "name", "score", "flag")

  test("csv round-trip with header and quoting") {
    val dir = tmpDir("csv")
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(sample.schema).csv(dir)
    assert(back.orderBy($"id").collect().toSeq ==
      sample.orderBy($"id").collect().toSeq)
  }

  test("json round-trip preserves types via explicit schema") {
    val dir = tmpDir("json")
    sample.write.mode("overwrite").json(dir)
    val back = spark.read.schema(sample.schema).json(dir)
    assert(back.orderBy($"id").collect().toSeq ==
      sample.orderBy($"id").collect().toSeq)
  }

  test("orc round-trip") {
    val dir = tmpDir("orc")
    sample.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.orderBy($"id").collect().toSeq ==
      sample.orderBy($"id").collect().toSeq)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = tmpDir("part")
    sample.withColumn("part", $"id" % 2).write
      .mode("overwrite").partitionBy("part").parquet(dir)
    val pruned = spark.read.parquet(dir).filter($"part" === 1)
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(scan.contains("PartitionFilters: [isnotnull(part"),
      s"no partition pruning in: $scan")
    assert(pruned.count() == 2) // ids 1 and 3
  }
}
