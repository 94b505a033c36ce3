package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder, LogicalTypes}
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink — the engine's analogue of the
  * reference's avro format (flink-formats/flink-avro/.../
  * AvroFileFormatFactory.java / AvroWriterFactory): Avro object container
  * files of GenericRecords, one per partition, splittable on read (Avro
  * sync markers).
  *
  * The spark-avro DataSource module is absent in this environment, but
  * the core Avro runtime (avro + avro-mapred) ships with Spark itself —
  * so the (de)serialization goes through avro-mapred's Hadoop
  * `AvroKeyInputFormat`/`AvroKeyOutputFormat` with an explicit
  * StructType↔Schema mapping. Supported types: the Avro primitive set
  * (boolean/int/long/float/double/string/bytes), timestamp-micros and
  * date logical types, nullable unions, arrays, and nested structs —
  * Spark's own avro mapping for the same shapes.
  *
  * Scale shape: write is map-only (no shuffle; one container file per
  * partition — repartition first to size files); read is a splittable
  * scan followed by a per-partition record→row conversion. Schema and
  * rows travel as serializable primitives (the Avro Schema itself is not
  * Serializable — executors re-parse it from its JSON string).
  */
object AvroIO {

  // ------------------------------------------------------------- schema

  /** StructType → Avro record schema (nullable fields become
    * union(null, T) with null default, Spark's avro convention).
    */
  def toAvroSchema(st: StructType, recordName: String = "row"): Schema = {
    val fields = st.fields.map { f =>
      val base = fieldSchema(f.dataType, recordName + "_" + f.name)
      val sch =
        if (f.nullable) Schema.createUnion(
          java.util.List.of(Schema.create(Schema.Type.NULL), base))
        else base
      new Schema.Field(f.name, sch,
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(recordName, null, "graft", false, fields.toList.asJava)
  }

  private def fieldSchema(dt: DataType, name: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case ArrayType(et, containsNull) =>
      val elem = fieldSchema(et, name + "_item")
      Schema.createArray(
        if (containsNull) Schema.createUnion(
          java.util.List.of(Schema.create(Schema.Type.NULL), elem))
        else elem)
    case st: StructType => toAvroSchema(st, name)
    case other => throw new IllegalArgumentException(
      s"unsupported type for avro: ${other.simpleString}")
  }

  // -------------------------------------------------------------- write

  def write(df: DataFrame, path: String): Unit = {
    val st = df.schema
    val schemaJson = toAvroSchema(st).toString
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    df.rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      it.map(r => (new AvroKey[GenericRecord](toRecord(r, st, schema)),
        NullWritable.get()))
    }.saveAsNewAPIHadoopFile(path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  private def toRecord(r: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name, if (r.isNullAt(i)) null else toAvro(r.get(i), f.dataType,
        nonNull(schema.getField(f.name).schema())))
    }
    rec
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def toAvro(v: Any, dt: DataType, s: Schema): Any = (v, dt) match {
    case (t: java.sql.Timestamp, TimestampType) =>
      t.getTime * 1000L + (t.getNanos / 1000) % 1000
    case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (xs: scala.collection.Seq[_], ArrayType(et, _)) =>
      val elem = nonNull(s.getElementType)
      xs.map(x => if (x == null) null else toAvro(x, et, elem)).asJava
    case (row: Row, st: StructType) => toRecord(row, st, s)
    case (n: java.lang.Number, IntegerType | ShortType | ByteType) => n.intValue()
    case (other, _) => other
  }

  // --------------------------------------------------------------- read

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val rdd = spark.sparkContext.newAPIHadoopFile(
        path, classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable])
      .mapPartitions(_.map(kv => fromRecord(kv._1.datum(), schema)))
    spark.createDataFrame(rdd, schema)
  }

  private def fromRecord(rec: GenericRecord, st: StructType): Row =
    Row.fromSeq(st.fields.toSeq.map(f => fromAvro(rec.get(f.name), f.dataType)))

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (s: CharSequence, StringType) => s.toString
    // write widens short/byte to Avro INT — narrow back on read
    case (i: java.lang.Integer, ShortType) => i.shortValue()
    case (i: java.lang.Integer, ByteType) => i.byteValue()
    case (l: java.lang.Long, TimestampType) =>
      val t = new java.sql.Timestamp(Math.floorDiv(l, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(l, 1000000L) * 1000L).toInt)
      t
    case (i: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.toLong))
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (xs: java.util.Collection[_], ArrayType(et, _)) =>
      xs.asScala.toSeq.map(x => fromAvro(x, et))
    case (rec: GenericRecord, st: StructType) => fromRecord(rec, st)
    case (other, _) => other
  }
}
