package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Q
import graft.streaming.Changelog

/** Upsert-materializing file sink — the engine's analogue of the
  * reference's upsert table sinks (upsert-kafka's keyed compaction,
  * `flink-connectors/flink-connector-kafka/.../table/UpsertKafkaDynamicTableFactory.java`;
  * changelog → last-row-per-key materialization is
  * `StreamExecChangelogNormalize`'s contract run at the storage layer):
  * a keyed changelog stream lands as a queryable parquet table holding
  * exactly the LAST version of each key, with Delete changes removing
  * the key.
  *
  * Spark-first shape: `foreachBatch` + hash-bucketed dynamic partition
  * overwrite. The table directory is laid out as `__bucket=N/` parquet
  * partitions (`buckets` fixed at table creation). Each micro-batch:
  *
  *   1. folds the batch's changes to one winner per key (greatest
  *      `seqCol` wins — foreachBatch hands an UNORDERED DataFrame, so
  *      upsert order must be data, not arrival; the reference's
  *      SinkUpsertMaterializer keys on exactly such a user-provided
  *      ordering when its input order is lost by exchanges),
  *   2. reads back ONLY the buckets containing changed keys (partition
  *      pruning on `__bucket=`),
  *   3. anti-joins the changed keys out, unions the non-delete winners,
  *      and rewrites those buckets atomically via dynamic partition
  *      overwrite.
  *
  * At 100 TB: write amplification per batch is `|touched buckets| ×
  * bucket size`, not table size — size `buckets` so a bucket ≈ one
  * comfortable task (e.g. 1 GiB); batch cost is then proportional to the
  * batch's key spread, and reads stay plain parquet scans with no
  * log-structured merge debt (deletes are resolved at write time, the
  * compact-on-write end of the Hudi/Delta design space).
  */
object UpsertSink {

  val BucketCol = "__bucket"

  /** Merge one (micro-)batch of changes into the table at `dir`.
    * `changes` must carry `keyCols`, `seqCol`, and optionally
    * [[Changelog.RowKindCol]] (absent = every row an upsert); all other
    * columns are the payload. Returns the number of buckets rewritten.
    */
  def mergeBatch(spark: SparkSession, changes: DataFrame,
      keyCols: Seq[String], seqCol: String, dir: String,
      buckets: Int): Int = {
    require(keyCols.nonEmpty, "mergeBatch needs at least one key column")
    val kindCol = Changelog.RowKindCol
    val hasKind = changes.columns.contains(kindCol)
    val kind = if (hasKind) col(kindCol) else lit(Changelog.Insert)
    // 1. one winner per key: greatest seq (ties: delete loses — a
    //    delete+reinsert at the same version must keep the row)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol).desc,
        (kind === Changelog.Delete).cast("int").asc)
    val winners = changes
      .withColumn("__kind", kind)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .drop((if (hasKind) Seq(kindCol) else Nil): _*)
      .withColumn(BucketCol,
        pmod(xxhash64(keyCols.map(col): _*), lit(buckets)).cast("int"))
      .localCheckpoint(true) // winners feed three consumers below
    val touched = winners.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).sorted // ≤ `buckets` ints on the driver
    val payloadCols = winners.columns
      .filterNot(c => c == "__kind").toSeq // includes BucketCol
    val upserts = winners.filter(col("__kind") =!= Changelog.Delete)
      .select(payloadCols.map(col): _*)
    val path = new java.io.File(dir)
    if (!path.exists() || path.listFiles() == null ||
        !path.listFiles().exists(_.getName.startsWith(s"$BucketCol="))) {
      upserts.write.partitionBy(BucketCol).mode("append").parquet(dir)
      release(winners)
      return touched.length
    }
    // 2. read only the touched buckets (directory partition pruning)
    val existing = spark.read.parquet(dir)
      .filter(col(BucketCol).isin(touched.toSeq: _*))
    // 3. drop changed keys, add new versions, rewrite those buckets only.
    //    Materialize BEFORE the write: the merge reads the same parquet
    //    dir the overwrite replaces (localCheckpoint cuts that cycle),
    //    and the per-bucket row counts below must not recompute the join.
    val merged = existing
      .join(winners.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(upserts)
      .localCheckpoint(true)
    val nonEmpty = merged.groupBy(col(BucketCol)).count()
      .collect().map(_.getInt(0)).toSet
    merged.write.partitionBy(BucketCol).mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(dir)
    // dynamic overwrite only replaces partitions PRESENT in the output —
    // a bucket whose last key was deleted has no rows and must be
    // cleared explicitly or its stale file survives
    touched.filterNot(nonEmpty).foreach { b =>
      Q.deleteRecursively(
        java.nio.file.Paths.get(dir, s"$BucketCol=$b"))
    }
    release(winners); release(merged)
    touched.length
  }

  /** Unpersist a localCheckpoint's backing RDD — batch-scoped frames in
    * a long-running stream must not wait for the ContextCleaner. Shared
    * with ConnectorDdl's copy-on-write DML: one idiom, one place to fix
    * when a Spark version changes the plan shape.
    */
  private[graft] def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Start the streaming upsert sink: every micro-batch merges via
    * [[mergeBatch]]. Exactly-once to the reader: dynamic partition
    * overwrite replaces whole bucket directories, so a replayed batch
    * converges to the same table (the merge is idempotent on (key, seq)).
    */
  def start(changes: DataFrame, keyCols: Seq[String], seqCol: String,
      dir: String, buckets: Int, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch.sparkSession, batch, keyCols, seqCol, dir, buckets)
        ()
      }
      .start()

  /** Read the materialized table (bucket column dropped). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).drop(BucketCol)
}
