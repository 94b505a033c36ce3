package graft.sources

import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.streaming.Changelog

class ChangelogJsonSpec extends SparkSuite {
  import spark.implicits._

  private val payload = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("debezium-json: c/u/d decode to +I, -U/+U pair, -D") {
    val env = Seq(
      """{"after":{"id":1,"v":"a"},"op":"c","ts_ms":10}""",
      """{"before":{"id":1,"v":"a"},"after":{"id":1,"v":"b"},"op":"u","ts_ms":20}""",
      """{"before":{"id":2,"v":"x"},"op":"d","ts_ms":30}""",
      """{"after":{"id":3,"v":"s"},"op":"r","ts_ms":40}""").toDF("value")
    val got = ChangelogJson.debezium(env, "value", payload)
      .as[(Byte, Long, String, Long)].collect().toSet
    assert(got == Set(
      (Changelog.Insert, 1L, "a", 10L),
      (Changelog.UpdateBefore, 1L, "a", 20L),
      (Changelog.UpdateAfter, 1L, "b", 20L),
      (Changelog.Delete, 2L, "x", 30L),
      (Changelog.Insert, 3L, "s", 40L)))
    // end-to-end: the parsed changelog materializes to the net state
    val fin = Changelog.materialize(
      ChangelogJson.debezium(env, "value", payload), Seq("id"), "ts_ms")
      .select($"id", $"v").as[(Long, String)].collect().toSet
    assert(fin == Set((1L, "b"), (3L, "s")))
  }

  test("canal-json: multi-row data; UPDATE merges partial old over data") {
    val env = Seq(
      """{"type":"INSERT","data":[{"id":1,"v":"a"},{"id":2,"v":"b"}],"ts":10}""",
      // old carries ONLY the changed field (v); id comes from data
      """{"type":"UPDATE","data":[{"id":1,"v":"a2"}],"old":[{"v":"a"}],"ts":20}""",
      """{"type":"DELETE","data":[{"id":2,"v":"b"}],"ts":30}""").toDF("value")
    val got = ChangelogJson.canal(env, "value", payload)
      .as[(Byte, Long, String, Long)].collect().toSet
    assert(got == Set(
      (Changelog.Insert, 1L, "a", 10L),
      (Changelog.Insert, 2L, "b", 10L),
      (Changelog.UpdateBefore, 1L, "a", 20L), // merged old: id from data
      (Changelog.UpdateAfter, 1L, "a2", 20L),
      (Changelog.Delete, 2L, "b", 30L)))
  }

  test("maxwell-json: single-row envelopes with partial old merge") {
    val env = Seq(
      """{"type":"insert","data":{"id":1,"v":"a"},"ts":10}""",
      """{"type":"update","data":{"id":1,"v":"a2"},"old":{"v":"a"},"ts":20}""",
      """{"type":"delete","data":{"id":1,"v":"a2"},"ts":30}""").toDF("value")
    val got = ChangelogJson.maxwell(env, "value", payload)
      .as[(Byte, Long, String, Long)].collect().toSet
    assert(got == Set(
      (Changelog.Insert, 1L, "a", 10L),
      (Changelog.UpdateBefore, 1L, "a", 20L),
      (Changelog.UpdateAfter, 1L, "a2", 20L),
      (Changelog.Delete, 1L, "a2", 30L)))
  }

  test("ogg-json: I/U/D decode with op_ts commit-time parsing") {
    val env = Seq(
      """{"after":{"id":1,"v":"a"},"op_type":"I","op_ts":"2024-01-01 00:00:01.000000"}""",
      """{"before":{"id":1,"v":"a"},"after":{"id":1,"v":"b"},"op_type":"U","op_ts":"2024-01-01 00:00:02.000000"}""",
      """{"before":{"id":2,"v":"x"},"op_type":"D","op_ts":"2024-01-01 00:00:03.000000"}""").toDF("value")
    val base = 1704067200000L // 2024-01-01T00:00:00Z in UTC session tz
    val got = ChangelogJson.ogg(env, "value", payload)
      .as[(Byte, Long, String, Long)].collect().toSet
    assert(got == Set(
      (Changelog.Insert, 1L, "a", base + 1000L),
      (Changelog.UpdateBefore, 1L, "a", base + 2000L),
      (Changelog.UpdateAfter, 1L, "b", base + 2000L),
      (Changelog.Delete, 2L, "x", base + 3000L)))
    val fin = Changelog.materialize(
      ChangelogJson.ogg(env, "value", payload), Seq("id"), "ts_ms")
      .select($"id", $"v").as[(Long, String)].collect().toSet
    assert(fin == Set((1L, "b")))
  }

  test("unknown op is a loud error") {
    val env = Seq("""{"after":{"id":1,"v":"a"},"op":"z","ts_ms":1}""").toDF("value")
    val e = intercept[Exception] {
      ChangelogJson.debezium(env, "value", payload).collect()
    }
    assert(e.getMessage.contains("unknown op") ||
      e.getCause != null && e.getCause.getMessage.contains("unknown op"))
  }
}
