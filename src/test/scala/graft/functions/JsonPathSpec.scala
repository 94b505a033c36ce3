package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSuite

/** SQL/JSON path semantics — Flink's JSON_EXISTS/JSON_VALUE/JSON_QUERY
  * defaults (BuiltInFunctionDefinitions.java:2339-2397): NULL ON EMPTY /
  * NULL ON ERROR, FALSE ON ERROR for EXISTS, WITHOUT ARRAY WRAPPER, lax
  * vs strict mode.
  */
class JsonPathSpec extends AnyFunSuite with SparkSuite {

  private def u(s: String): UTF8String = UTF8String.fromString(s)
  private def jv(j: String, p: String, onEmpty: String = null, onError: String = null): String = {
    val r = JsonPathUtil.jsonValue(u(j), u(p),
      if (onEmpty == null) null else u(onEmpty),
      if (onError == null) null else u(onError))
    if (r == null) null else r.toString
  }
  private def jq(j: String, p: String, w: Int = 0): String = {
    val r = JsonPathUtil.jsonQuery(u(j), u(p), w)
    if (r == null) null else r.toString
  }
  private def je(j: String, p: String): Boolean = JsonPathUtil.jsonExists(u(j), u(p))

  private val doc = """{"a":{"b":7,"s":"x"},"arr":[1,2,3],"nul":null,"objs":[{"v":1},{"v":2}]}"""

  test("JSON_VALUE scalar extraction, text without quotes") {
    assert(jv(doc, "$.a.b") == "7")
    assert(jv(doc, "$.a.s") == "x")
    assert(jv(doc, "$.arr[2]") == "3")
  }

  test("JSON_VALUE NULL ON EMPTY default and DEFAULT ... ON EMPTY") {
    assert(jv(doc, "$.missing") == null)
    assert(jv(doc, "$.missing", onEmpty = "dflt") == "dflt")
    // an ERROR (not EMPTY) must NOT take the onEmpty default
    assert(jv("not json", "$.a", onEmpty = "dflt") == null)
    assert(jv("not json", "$.a", onEmpty = "dflt", onError = "err") == "err")
  }

  test("JSON_VALUE non-scalar result is the error behavior") {
    assert(jv(doc, "$.a") == null)
    assert(jv(doc, "$.a", onEmpty = "e", onError = "err") == "err")
  }

  test("JSON_VALUE of JSON null is SQL NULL") {
    assert(jv(doc, "$.nul") == null)
  }

  test("JSON_EXISTS found/empty/error") {
    assert(je(doc, "$.a.b"))
    assert(je(doc, "$.nul")) // present (JSON null is a value)
    assert(!je(doc, "$.missing"))
    assert(!je("not json", "$.a")) // FALSE ON ERROR default
  }

  test("strict mode: structural miss is an error; lax is empty") {
    assert(!je(doc, "strict $.missing"))
    assert(jv(doc, "strict $.missing", onEmpty = "e", onError = "err") == "err")
    assert(jv(doc, "lax $.missing", onEmpty = "e", onError = "err") == "e")
    // strict index out of bounds → error
    assert(jv(doc, "strict $.arr[9]", onEmpty = "e", onError = "err") == "err")
    assert(jv(doc, "lax $.arr[9]", onEmpty = "e", onError = "err") == "e")
  }

  test("lax member access auto-unwraps arrays; lax index on scalar is singleton") {
    // $.objs.v in lax mode unwraps the array → two results → error for VALUE
    assert(jv(doc, "$.objs.v", onEmpty = "e", onError = "err") == "err")
    assert(jq(doc, "$.objs.v", 1) == "[1,2]") // WITH ARRAY WRAPPER collects them
    assert(jv(doc, "$.a.b[0]") == "7") // lax: scalar as singleton array
  }

  test("JSON_QUERY wrappers") {
    assert(jq(doc, "$.a") == """{"b":7,"s":"x"}""")
    assert(jq(doc, "$.arr") == "[1,2,3]")
    assert(jq(doc, "$.a.b") == null) // scalar WITHOUT wrapper → NULL ON ERROR
    assert(jq(doc, "$.a.b", 1) == "[7]") // WITH wrapper
    assert(jq(doc, "$.arr", 2) == "[1,2,3]") // conditional: container kept as-is
    assert(jq(doc, "$.a.b", 2) == "[7]") // conditional: scalar wrapped
    assert(jq(doc, "$.missing") == null)
    // NULL ON EMPTY applies BEFORE wrapping: empty is NULL, not []
    assert(jq(doc, "$.missing", 1) == null)
    assert(jq(doc, "$.missing", 2) == null)
  }

  test("json_query wrapper argument validated at analysis time") {
    JsonFunctions.register(spark)
    // string wrapper-mode literal accepted
    assert(spark.sql(s"SELECT json_query('$doc', '$$.a.b', 'with')")
      .head().getString(0) == "[7]")
    // bad literal rejected at analysis, not a runtime ClassCastException
    val e = intercept[Exception] {
      spark.sql(s"SELECT json_query('$doc', '$$.a.b', 'sideways')").collect()
    }
    assert(e.getMessage.contains("without/with/conditional"))
  }

  test("bracket field access and wildcards") {
    assert(jv(doc, "$['a']['b']") == "7")
    assert(jq(doc, "$.arr[*]", 1) == "[1,2,3]")
    assert(jq(doc, "$.a.*", 1) == """[7,"x"]""")
  }

  test("SQL registration + codegen end-to-end") {
    JsonFunctions.register(spark)
    val row = spark.sql(
      s"""SELECT json_value('$doc', '$$.a.b') AS v,
         |  json_value('$doc', '$$.missing', 'd', 'e') AS dv,
         |  json_exists('$doc', '$$.a.b') AS ex,
         |  json_query('$doc', '$$.arr') AS q""".stripMargin).head()
    assert(row.getString(0) == "7")
    assert(row.getString(1) == "d")
    assert(row.getBoolean(2))
    assert(row.getString(3) == "[1,2,3]")
  }

  test("Column DSL over a DataFrame (codegen path, null inputs)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, """{"k":10}"""),
      (2L, """{"j":20}"""),
      (3L, null.asInstanceOf[String])).toDF("id", "j")
    val out = df.select(
      $"id",
      JsonFunctions.jsonValue($"j", lit("$.k")).as("v"),
      JsonFunctions.jsonExists($"j", lit("$.k")).as("e"))
      .orderBy($"id").collect()
    assert(out(0).getString(1) == "10" && out(0).getBoolean(2))
    assert(out(1).getString(1) == null && !out(1).getBoolean(2))
    assert(out(2).isNullAt(1) && out(2).isNullAt(2)) // NULL input → NULL
  }
}
