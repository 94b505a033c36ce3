package graft.sources

import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Hadoop SequenceFile source/sink — the engine's analogue of the
  * reference's sequence-file format
  * (flink-formats/flink-sequence-file/.../SequenceFileWriterFactory.java:
  * a BulkWriter of Writable key/value pairs for the file sink). Needs no
  * format jar: the Writable classes ship with spark-core's Hadoop client.
  *
  * Layout mirrors the reference's writer contract — one (key, value)
  * Writable pair per record:
  *   - key: `LongWritable` from a caller-named numeric key column;
  *   - value: `Text` holding the row serialized as JSON (the pluggable
  *     SerializationSchema seam; JSON keeps it schema-evolvable and
  *     cross-tool readable).
  *
  * Scale shape: write is a map-only `saveAsSequenceFile` (one file per
  * partition, no shuffle — repartition first to size files); read is a
  * splittable `sequenceFile` scan (SequenceFiles have sync markers, so
  * big files split across tasks) followed by a codegen'd `from_json`
  * projection. Column pruning happens post-parse — for a scan-heavy
  * workload prefer parquet; this format exists for interop with
  * Hadoop-native pipelines, as in the reference.
  */
object SequenceFileIO {

  // default to_json truncates timestamps to millis; this format keeps
  // micros (the repo's tables carry micros derived from nanos) AND the
  // zone offset, so files round-trip across sessions with different
  // spark.sql.session.timeZone settings
  private val jsonOpts =
    Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")

  /** Write `df` as a SequenceFile of (keyCol: LongWritable, row-JSON: Text).
    * The key column must be non-null (a Writable key has no null form).
    */
  def write(df: DataFrame, path: String, keyCol: String): Unit =
    df.select(col(keyCol).cast("long"),
        to_json(struct(df.columns.map(col): _*), jsonOpts))
      .rdd
      .map { r =>
        require(!r.isNullAt(0),
          s"SequenceFileIO.write: key column '$keyCol' is NULL for row ${r.getString(1)}")
        (new LongWritable(r.getLong(0)), new Text(r.getString(1)))
      }
      .saveAsSequenceFile(path)

  /** Read a SequenceFile written by [[write]] back into a DataFrame with
    * the given schema (the key is embedded in the JSON value, so the
    * schema round-trips complete rows).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    import spark.implicits._
    val values: Dataset[String] = spark.sparkContext
      .sequenceFile[Long, String](path)
      .map(_._2)
      .toDS()
    values.select(from_json(col("value"), schema, jsonOpts).as("r"))
      .select(col("r.*"))
  }

  /** Read only the keys — a pushdown-style fast path for key scans (no
    * JSON parse; the Text payload is never deserialized).
    */
  def readKeys(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.sequenceFile[Long, String](path).map(_._1).toDF("key")
  }
}
