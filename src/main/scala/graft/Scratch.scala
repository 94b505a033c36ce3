package graft

import org.apache.spark.sql.SparkSession

/** Dev-only harness: drives the driver contract surfaces locally. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = SparkEntry.entry(spark)
    println("[scratch] entry rows = " + e.count())
    e.show(5, truncate = false)
    println("[scratch] queries declared = " + SparkEntry.queries.size)
    println("[scratch] oracles declared = " + SparkEntry.oracleSql.size)
    spark.stop()
  }
}
