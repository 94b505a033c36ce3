package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.Changelog

/** Changelog-encoding JSON formats — the reference's CDC format family
  * (flink-formats/flink-json: `debezium-json`
  * DebeziumJsonDeserializationSchema, `canal-json`
  * CanalJsonDeserializationSchema; maxwell/ogg are the same envelope
  * idea): a JSON envelope stream describing row-level inserts, updates
  * and deletes decodes into the engine's changelog shape — payload
  * columns plus [[Changelog.RowKindCol]] — and from there composes with
  * everything downstream (Changelog.materialize, the upsert sink, the
  * retract aggregates).
  *
  * Pure projections (from_json + a per-envelope explode of 1–2 changelog
  * rows): no shuffle, scale-free; the downstream consumer decides the
  * keyed work.
  */
object ChangelogJson {

  private def changeStruct(kind: Column, row: Column): Column =
    struct(kind.cast(ByteType).as("kind"), row.as("row"))

  /** Decode `debezium-json` envelopes: `{"before":…, "after":…, "op":
    * "c"|"r"|"u"|"d", "ts_ms": n}`. `op=u` expands to the -U/+U pair
    * (the reference emits UPDATE_BEFORE from `before` unless dropped by
    * `debezium-json.schema-include`-style config); `op=c`/`r` (create /
    * snapshot read) emit +I from `after`; `op=d` emits -D from `before`.
    * Output: payload columns + `__rowkind` + `ts_ms` (the envelope's
    * order hint, usable as the materialize seq).
    */
  def debezium(json: DataFrame, valueCol: String,
      payload: StructType): DataFrame = {
    val env = StructType(Seq(
      StructField("before", payload), StructField("after", payload),
      StructField("op", StringType), StructField("ts_ms", LongType)))
    val e = from_json(col(valueCol), env)
    val changes =
      when(e.getField("op").isin("c", "r"),
        array(changeStruct(lit(Changelog.Insert), e.getField("after"))))
      .when(e.getField("op") === "u", array(
        changeStruct(lit(Changelog.UpdateBefore), e.getField("before")),
        changeStruct(lit(Changelog.UpdateAfter), e.getField("after"))))
      .when(e.getField("op") === "d",
        array(changeStruct(lit(Changelog.Delete), e.getField("before"))))
      .otherwise(raise_error(concat(lit("debezium-json: unknown op "),
        e.getField("op"))))
    json.select(explode(changes).as("c"), e.getField("ts_ms").as("ts_ms"))
      .select(col("c.kind").as(Changelog.RowKindCol), col("c.row.*"),
        col("ts_ms"))
  }

  /** Decode `canal-json` envelopes: `{"type": "INSERT"|"UPDATE"|
    * "DELETE", "data": [row…], "old": [changedFieldsOldValues…],
    * "ts": n}`. `data` carries one or more rows per envelope; for
    * UPDATE, `old[i]` holds ONLY the changed fields' old values, so the
    * UPDATE_BEFORE row is `old[i]` merged over `data[i]` field-wise —
    * exactly the reference's deserializer contract.
    */
  def canal(json: DataFrame, valueCol: String,
      payload: StructType): DataFrame = {
    val env = StructType(Seq(
      StructField("type", StringType),
      StructField("data", ArrayType(payload)),
      StructField("old", ArrayType(payload)),
      StructField("ts", LongType)))
    val e = from_json(col(valueCol), env)
    val exploded = json
      .select(e.getField("type").as("t"), e.getField("ts").as("ts_ms"),
        posexplode(e.getField("data")).as(Seq("i", "row")),
        e.getField("old").as("old"))
    def mergedBefore: Column = {
      // old[i] has non-null values only for changed fields
      val o = element_at(col("old"), col("i") + 1)
      struct(payload.fieldNames.toSeq.map(f =>
        coalesce(o.getField(f), col("row").getField(f)).as(f)): _*)
    }
    val changes =
      when(col("t") === "INSERT",
        array(changeStruct(lit(Changelog.Insert), col("row"))))
      .when(col("t") === "UPDATE", array(
        changeStruct(lit(Changelog.UpdateBefore), mergedBefore),
        changeStruct(lit(Changelog.UpdateAfter), col("row"))))
      .when(col("t") === "DELETE",
        array(changeStruct(lit(Changelog.Delete), col("row"))))
      .otherwise(raise_error(concat(lit("canal-json: unknown type "),
        col("t"))))
    exploded.select(explode(changes).as("c"), col("ts_ms"))
      .select(col("c.kind").as(Changelog.RowKindCol), col("c.row.*"),
        col("ts_ms"))
  }

  /** Decode `maxwell-json` envelopes (MaxwellJsonDeserializationSchema):
    * like canal but one row per envelope — `{"type": "insert"|"update"|
    * "delete", "data": {row}, "old": {changedFieldsOldValues}, "ts": n}`;
    * the UPDATE_BEFORE image is `old` merged over `data`.
    */
  def maxwell(json: DataFrame, valueCol: String,
      payload: StructType): DataFrame = {
    val env = StructType(Seq(
      StructField("type", StringType), StructField("data", payload),
      StructField("old", payload), StructField("ts", LongType)))
    val e = from_json(col(valueCol), env)
    val data = e.getField("data")
    def mergedBefore: Column =
      struct(payload.fieldNames.toSeq.map(f =>
        coalesce(e.getField("old").getField(f), data.getField(f)).as(f)): _*)
    val changes =
      when(e.getField("type") === "insert",
        array(changeStruct(lit(Changelog.Insert), data)))
      .when(e.getField("type") === "update", array(
        changeStruct(lit(Changelog.UpdateBefore), mergedBefore),
        changeStruct(lit(Changelog.UpdateAfter), data)))
      .when(e.getField("type") === "delete",
        array(changeStruct(lit(Changelog.Delete), data)))
      .otherwise(raise_error(concat(lit("maxwell-json: unknown type "),
        e.getField("type"))))
    json.select(explode(changes).as("c"), e.getField("ts").as("ts_ms"))
      .select(col("c.kind").as(Changelog.RowKindCol), col("c.row.*"),
        col("ts_ms"))
  }

  /** Decode `ogg-json` envelopes (OggJsonDeserializationSchema —
    * Oracle GoldenGate): `{"before":…, "after":…, "op_type": "I"|"U"|
    * "D", "op_ts": "yyyy-MM-dd HH:mm:ss.ffffff"}`. `I` emits +I from
    * `after`; `U` the -U/+U pair from full before/after images (ogg
    * ships complete rows, no partial-old merge); `D` emits -D from
    * `before`. `op_ts` (the source-database commit time) parses to
    * epoch-millis `ts_ms` for use as the materialize seq.
    */
  def ogg(json: DataFrame, valueCol: String,
      payload: StructType): DataFrame = {
    val env = StructType(Seq(
      StructField("before", payload), StructField("after", payload),
      StructField("op_type", StringType), StructField("op_ts", StringType)))
    val e = from_json(col(valueCol), env)
    val changes =
      when(e.getField("op_type") === "I",
        array(changeStruct(lit(Changelog.Insert), e.getField("after"))))
      .when(e.getField("op_type") === "U", array(
        changeStruct(lit(Changelog.UpdateBefore), e.getField("before")),
        changeStruct(lit(Changelog.UpdateAfter), e.getField("after"))))
      .when(e.getField("op_type") === "D",
        array(changeStruct(lit(Changelog.Delete), e.getField("before"))))
      .otherwise(raise_error(concat(lit("ogg-json: unknown op_type "),
        e.getField("op_type"))))
    json.select(explode(changes).as("c"),
        unix_millis(to_timestamp(e.getField("op_ts"),
          "yyyy-MM-dd HH:mm:ss.SSSSSS")).as("ts_ms"))
      .select(col("c.kind").as(Changelog.RowKindCol), col("c.row.*"),
        col("ts_ms"))
  }
}
