package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import JsonConstructors._

/** JSON constructor semantics: escaping, NULL ON NULL vs ABSENT ON NULL,
  * IS JSON constraints, aggregate forms, and the SQL registration.
  */
class JsonConstructorsSpec extends SparkSuite {
  import spark.implicits._

  test("jsonScalar escapes control characters, quotes and backslashes") {
    val df = Seq("a\"b\\c\n\td", "x").toDF("s")
    val out = df.select(jsonScalar($"s")).as[String].collect().toSet
    assert(out == Set("\"a\\\"b\\\\c\\n\\td\"", "\"x\""))
  }

  test("jsonObject NULL ON NULL vs ABSENT ON NULL") {
    val df = Seq((1L, Some("v")), (2L, None)).toDF("id", "v")
    val rows = df.select($"id",
        jsonObject(Seq(lit("k") -> $"v")).as("nn"),
        jsonObject(Seq(lit("k") -> $"v"), nullOnNull = false).as("ab"))
      .as[(Long, String, String)].collect()
    val out = rows.map { case (i, a, b) => i -> ((a, b)) }.toMap
    assert(out(1L) == (("{\"k\":\"v\"}", "{\"k\":\"v\"}")))
    assert(out(2L) == (("{\"k\":null}", "{}")))
  }

  test("IS JSON constraints") {
    val df = Seq(("{\"a\":1}", "[1,2]", "17", "nope")).toDF("o", "a", "s", "bad")
    val r = df.select(
      isJson($"o", "object"), isJson($"o", "array"), isJson($"a", "array"),
      isJson($"s", "scalar"), isJson($"bad"), isJson($"o"))
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)].head()
    assert(r == ((true, false, true, true, false, true)))
  }

  test("jsonArrayAgg sorts elements and skips nulls; empty group is []") {
    val df = Seq(("g", Some("b")), ("g", None), ("g", Some("a"))).toDF("g", "v")
    val out = df.groupBy($"g").agg(jsonArrayAgg($"v").as("j"))
      .as[(String, String)].head()
    assert(out == (("g", "[\"a\",\"b\"]")))
    val empty = Seq(("g", Option.empty[String])).toDF("g", "v")
      .groupBy($"g").agg(jsonArrayAgg($"v").as("j")).as[(String, String)].head()
    assert(empty._2 == "[]")
  }

  test("jsonObjectAgg sorts by key and serializes null values") {
    val df = Seq(("g", "b", Some(2L)), ("g", "a", Some(1L)), ("g", "c", None))
      .toDF("g", "k", "v")
    val out = df.groupBy($"g").agg(jsonObjectAgg($"k", $"v").as("j"))
      .as[(String, String)].head()
    assert(out._2 == "{\"a\":1,\"b\":2,\"c\":null}")
  }

  test("SQL registration: is_json and json_object") {
    JsonConstructors.register(spark)
    val r = spark.sql(
      """SELECT json_object('k', 5, 'name', 'x"y') AS o,
        |       is_json('{"a":1}', 'object') AS io,
        |       is_json('zzz') AS bad""".stripMargin)
      .as[(String, Boolean, Boolean)].head()
    assert(r == (("{\"k\":5,\"name\":\"x\\\"y\"}", true, false)))
  }

  test("JSON_STRING serializes scalars; SQL NULL stays NULL") {
    JsonConstructors.register(spark)
    val df = Seq((Some("a\"b"), Some(7L)), (None, None))
      .toDF("s", "n")
    val rows = df.select(jsonString($"s"), jsonString($"n"))
      .as[(Option[String], Option[String])].collect().toSet
    assert(rows == Set((Some("\"a\\\"b\""), Some("7")), (None, None)))
    assert(spark.sql("SELECT json_string('x'), json_string(CAST(NULL AS STRING))")
      .as[(String, Option[String])].head() == (("\"x\"", None)))
  }
}
