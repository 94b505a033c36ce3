package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Offline checkpoint-state inspection — the engine's State Processor API
  * analogue (flink-state-processing-api/.../SavepointReader.java:59,
  * ExistingSavepoint.readKeyedState): open a stopped query's checkpoint
  * and read operator state as a DataFrame, without the query running.
  *
  * Spark-first: the built-in `statestore` batch source already reads a
  * checkpoint's state-store files; this utility wraps its option surface
  * (operator id, store name, transformWithState state variable,
  * stream-stream join side) so callers address state the way the
  * reference addresses savepoint state by uid + state name. Read-only —
  * the reference can also rewrite savepoints, a documented non-goal.
  *
  * Scale: the read is a normal distributed parquet-ish scan of the state
  * files (one partition per shuffle partition of the stateful operator),
  * so inspecting a 1000-partition store parallelizes like any other scan.
  */
object StateReader {

  /** Raw state rows (key/value structs) of `operatorId`'s default store. */
  def store(spark: SparkSession, checkpoint: String,
      operatorId: Int = 0, storeName: Option[String] = None,
      batchId: Option[Long] = None): DataFrame = {
    var r = spark.read.format("statestore")
      .option("operatorId", operatorId.toString)
    storeName.foreach(n => r = r.option("storeName", n))
    batchId.foreach(b => r = r.option("batchId", b.toString))
    r.load(checkpoint)
  }

  /** One state variable of a `transformWithState` operator — e.g. the
    * OuterJoinProcessor's "left"/"right" MapStates — as key/value rows.
    */
  def stateVar(spark: SparkSession, checkpoint: String, varName: String,
      operatorId: Int = 0, batchId: Option[Long] = None): DataFrame = {
    var r = spark.read.format("statestore")
      .option("operatorId", operatorId.toString)
      .option("stateVarName", varName)
    batchId.foreach(b => r = r.option("batchId", b.toString))
    r.load(checkpoint)
  }

  /** A stream-stream join's buffered side ("left" or "right"). */
  def joinSide(spark: SparkSession, checkpoint: String, side: String,
      operatorId: Int = 0): DataFrame =
    spark.read.format("statestore")
      .option("operatorId", operatorId.toString)
      .option("joinSide", side)
      .load(checkpoint)

  /** Queryable state (`KeyedStream.asQueryableState`,
    * flink-queryable-state/ QueryableStateClient.getKvState): external
    * point reads of a key's LIVE state while the query keeps running.
    * Spark mapping: a committed micro-batch's state files are immutable,
    * so the `statestore` source reads the last-committed image
    * concurrently with the running query — the same read-committed
    * visibility the reference's client gives (it too serves the last
    * consistent snapshot, not mid-record mutations). The lookup is a
    * pruned scan + key filter rather than an index probe: fine for
    * dashboards/debug (the reference deprecated the feature for hot
    * paths as well); a serving-grade path belongs in an external store
    * fed by the changelog.
    */
  def point(spark: SparkSession, checkpoint: String, varName: String,
      key: Any, operatorId: Int = 0): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    stateVar(spark, checkpoint, varName, operatorId)
      .filter(col("key.value") === lit(key))
  }
}
