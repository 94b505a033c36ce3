package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. These are the inputs for every
  * `SparkEntry.queries` entry and for the DuckDB oracle, so the load path must
  * stay a plain parquet scan — Catalyst then gets full pushdown (filters,
  * column pruning) into the file source.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS) which Spark's TimestampType
    // (microseconds) cannot represent; read the raw int64 and truncate to
    // micros. DuckDB oracle side mirrors this with
    // make_timestamp(epoch_ns(ts) // 1000).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.functions._
      // timestamp_ntz so parquet output carries isAdjustedToUTC=false, the
      // same representation DuckDB's make_timestamp(epoch_ns(ts)//1000) has.
      // integer DIV, not `/`: epoch-nanos exceed double's 53-bit mantissa,
      // so floating division is off by up to ±1µs.
      raw.withColumn(
        "ts",
        timestamp_micros(expr("ts DIV 1000L")).cast("timestamp_ntz"))
    } else raw
  }

  /** Register each table as a temp view so `spark.sql` queries can mirror the
    * DuckDB oracle SQL verbatim.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
