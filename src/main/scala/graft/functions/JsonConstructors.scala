package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JSON constructor functions — the reference's JSON_OBJECT / IS_JSON /
  * JSON_OBJECTAGG / JSON_ARRAYAGG built-ins
  * (flink-table-common/.../functions/BuiltInFunctionDefinitions.java:
  * 2324 jsonObject, 2406 jsonObjectAgg, 2416 jsonArray, 2442 jsonArrayAgg,
  * 2455 isJson).
  *
  * Spark-first composition: JSON_OBJECT/JSON_ARRAY are `concat`/
  * `concat_ws` trees over the scalar serializer [[JsonScalar]] — every
  * piece stays inside whole-stage codegen, no variadic fallback
  * expression. The aggregates compose `collect_list` + `array_sort` +
  * `transform`, so partial aggregation is Spark's own; elements/entries
  * are emitted in sorted order (the reference's agg order is
  * arrival-nondeterministic — sorting makes results reproducible and
  * cross-engine comparable).
  *
  * NULL handling follows the reference defaults: JSON_OBJECT and
  * JSON_OBJECTAGG default NULL ON NULL (null values serialize as JSON
  * null), JSON_ARRAYAGG defaults ABSENT ON NULL (collect_list already
  * skips nulls).
  */
object JsonConstructors {

  /** JSON text of one scalar: strings quoted+escaped, numbers/booleans in
    * literal form, NULL → the 4-char text `null` (never SQL NULL — the
    * composition layer decides ABSENT vs NULL ON NULL).
    */
  case class JsonScalar(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = false
    override def prettyName: String = "json_scalar"

    private def quoted: Boolean = child.dataType match {
      case _: NumericType | BooleanType => false
      case _ => true
    }

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) UTF8String.fromString("null")
      else if (quoted) JsonConstructors.escapeJsonStr(String.valueOf(v))
      else UTF8String.fromString(v.toString)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val c = child.genCode(ctx)
      val serialize =
        if (quoted) s"graft.functions.JsonConstructors.escapeJsonStr(String.valueOf(${c.value}))"
        else s"org.apache.spark.unsafe.types.UTF8String.fromString(String.valueOf(${c.value}))"
      ev.copy(code =
        code"""
           |${c.code}
           |org.apache.spark.unsafe.types.UTF8String ${ev.value} =
           |  ${c.isNull}
           |    ? org.apache.spark.unsafe.types.UTF8String.fromString("null")
           |    : $serialize;
         """.stripMargin, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** JSON-escape a string into its quoted literal form. */
  def escapeJsonStr(in: String): UTF8String = {
    val sb = new java.lang.StringBuilder(in.length + 2)
    sb.append('"')
    var i = 0
    while (i < in.length) {
      in.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
    UTF8String.fromString(sb.toString)
  }

  /** IS JSON [VALUE|OBJECT|ARRAY|SCALAR] — constraint encoded 0/1/2/3. */
  case class IsJson(child: Expression, constraint: Int) extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = true
    override def prettyName: String = "is_json"
    override protected def nullSafeEval(v: Any): Any =
      JsonConstructors.isJsonText(v.asInstanceOf[UTF8String], constraint)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.JsonConstructors.isJsonText($v, $constraint);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def isJsonText(s: UTF8String, constraint: Int): Boolean =
    try {
      val node = mapper.readTree(s.toString)
      if (node == null) false
      else constraint match {
        case 1 => node.isObject
        case 2 => node.isArray
        case 3 => !node.isContainerNode
        case _ => true
      }
    } catch { case _: Exception => false }

  // ---- Column API -------------------------------------------------------

  def jsonScalar(c: Column): Column =
    Bridge.column(JsonScalar(Bridge.expression(c)))

  /** JSON_STRING(v) — the reference's name
    * (BuiltInFunctionDefinitions.java:2397) for scalar JSON
    * serialization; SQL NULL input serializes to SQL NULL per the
    * reference (unlike the internal jsonScalar building block).
    */
  def jsonString(c: Column): Column =
    when(c.isNull, lit(null).cast(StringType)).otherwise(jsonScalar(c))

  /** JSON_OBJECT(KEY k VALUE v, ...): keys serialize in written order.
    * `nullOnNull = false` is ABSENT ON NULL (entries with NULL values are
    * omitted via concat_ws, which skips SQL NULLs).
    */
  def jsonObject(pairs: Seq[(Column, Column)], nullOnNull: Boolean = true): Column = {
    val entries = pairs.map { case (k, v) =>
      val entry = concat(jsonScalar(k), lit(":"), jsonScalar(v))
      if (nullOnNull) entry else when(v.isNull, lit(null)).otherwise(entry)
    }
    concat(lit("{"), concat_ws(",", entries: _*), lit("}"))
  }

  /** JSON_ARRAY(v1, v2, ...) — ABSENT ON NULL default as the reference. */
  def jsonArray(values: Seq[Column], nullOnNull: Boolean = false): Column = {
    val elems = values.map { v =>
      if (nullOnNull) jsonScalar(v)
      else when(v.isNull, lit(null)).otherwise(jsonScalar(v))
    }
    concat(lit("["), concat_ws(",", elems: _*), lit("]"))
  }

  def isJson(c: Column, what: String = "value"): Column = {
    val k = what.toLowerCase match {
      case "value" => 0
      case "object" => 1
      case "array" => 2
      case "scalar" => 3
      case other => throw new IllegalArgumentException(s"IS JSON $other")
    }
    Bridge.column(IsJson(Bridge.expression(c), k))
  }

  /** JSON_ARRAYAGG(v): elements sorted (deterministic form of the
    * reference's arrival-order agg), nulls absent (the default).
    */
  def jsonArrayAgg(c: Column): Column =
    concat(lit("["),
      array_join(transform(array_sort(collect_list(c)), x => jsonScalar(x)), ","),
      lit("]"))

  /** JSON_OBJECTAGG(k VALUE v): entries sorted by key then value; null
    * values serialize as JSON null (NULL ON NULL default).
    */
  def jsonObjectAgg(k: Column, v: Column): Column =
    concat(lit("{"),
      array_join(
        transform(array_sort(collect_list(struct(k.as("k"), v.as("v")))),
          s => concat(jsonScalar(s.getField("k")), lit(":"), jsonScalar(s.getField("v")))),
        ","),
      lit("}"))

  /** SQL registration: IS_JSON(s [, 'object'|'array'|'scalar']) and
    * JSON_OBJECT(k1, v1, k2, v2, ...) (NULL ON NULL form).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      FunctionIdentifier("is_json"),
      new ExpressionInfo(classOf[IsJson].getName, "is_json"),
      (cs: Seq[Expression]) => cs match {
        case Seq(a) => IsJson(a, 0)
        case Seq(a, Literal(s: UTF8String, StringType)) =>
          val k = s.toString.toLowerCase match {
            case "value" => 0
            case "object" => 1
            case "array" => 2
            case "scalar" => 3
            case other => throw new IllegalArgumentException(s"IS JSON $other")
          }
          IsJson(a, k)
        case _ => throw new IllegalArgumentException(
          "is_json expects (json) or (json, 'value'|'object'|'array'|'scalar' literal)")
      })
    reg.registerFunction(
      FunctionIdentifier("json_string"),
      new ExpressionInfo(classOf[JsonScalar].getName, "json_string"),
      (cs: Seq[Expression]) => {
        require(cs.length == 1, "json_string expects 1 argument")
        import org.apache.spark.sql.catalyst.expressions.{If, IsNull}
        If(IsNull(cs.head), Literal.create(null, StringType), JsonScalar(cs.head))
      })
    reg.registerFunction(
      FunctionIdentifier("json_object"),
      new ExpressionInfo(classOf[JsonScalar].getName, "json_object"),
      (cs: Seq[Expression]) => {
        require(cs.nonEmpty && cs.length % 2 == 0,
          "json_object expects an even number of arguments: k1, v1, k2, v2, ...")
        // registry builders must return resolved-shape catalyst trees, so
        // compose Concat/ConcatWs directly rather than via the Column API
        import org.apache.spark.sql.catalyst.expressions.{Concat, ConcatWs}
        val entries = cs.grouped(2).map { p =>
          Concat(Seq(JsonScalar(p(0)), Literal(":"), JsonScalar(p(1))))
        }.toSeq
        Concat(Seq(Literal("{"), ConcatWs(Literal(",") +: entries), Literal("}")))
      })
  }
}
