package graft.functions

import java.util.concurrent.ConcurrentHashMap

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL/JSON path functions — the reference's JSON_EXISTS / JSON_VALUE /
  * JSON_QUERY built-ins (flink-table-common/.../functions/
  * BuiltInFunctionDefinitions.java:2339,2361,2379), which Spark lacks as
  * native functions (`get_json_object` has different path + null
  * semantics). Native Catalyst expressions with whole-stage codegen,
  * following the SplitIndex pattern.
  *
  * Supported path grammar (the subset the reference's own docs exercise):
  *
  *   path     := [('lax'|'strict') ' '] '$' step*
  *   step     := '.' name | '.*' | '[' int ']' | '[*]' | "['" name "']"
  *
  * SQL/JSON standard behaviors implemented (as in Calcite, which the
  * reference delegates to):
  *   - lax mode (default): structural errors → empty result; member access
  *     auto-unwraps arrays; an index step treats a non-array as a
  *     singleton array ($[0] == $).
  *   - strict mode: structural errors are errors (surface per ON ERROR).
  *   - JSON_EXISTS: empty → FALSE, found → TRUE, error → FALSE
  *     (FALSE ON ERROR default); NULL input → NULL.
  *   - JSON_VALUE: RETURNING VARCHAR; empty → onEmpty (default NULL);
  *     error, multi-result, or non-scalar result → onError (default NULL);
  *     JSON null scalar → SQL NULL.
  *   - JSON_QUERY: WITHOUT ARRAY WRAPPER default (scalar result → error
  *     behavior), 'with'/'conditional' wrapper variants; empty/error →
  *     NULL; output is compact JSON text.
  */
object JsonPathUtil {

  sealed trait Step
  final case class Field(name: String) extends Step
  case object AllFields extends Step
  final case class Index(i: Int) extends Step
  case object AllElems extends Step
  final case class ParsedPath(strict: Boolean, steps: List[Step])

  /** Structural/syntax error carrier — caught at the function boundary and
    * mapped to the ON ERROR behavior, never propagated to the caller.
    */
  final class PathError(msg: String) extends RuntimeException(msg) {
    override def fillInStackTrace(): Throwable = this
  }

  private val mapper = new ObjectMapper()
  private val pathCache = new ConcurrentHashMap[String, ParsedPath]()

  def parsePath(raw: String): ParsedPath = {
    val cached = pathCache.get(raw)
    if (cached != null) return cached
    var s = raw.trim
    var strict = false
    if (s.startsWith("strict ")) { strict = true; s = s.substring(7).trim }
    else if (s.startsWith("lax ")) { s = s.substring(4).trim }
    if (!s.startsWith("$")) throw new PathError(s"path must start with $$: $raw")
    var i = 1
    val steps = List.newBuilder[Step]
    while (i < s.length) {
      s.charAt(i) match {
        case '.' =>
          i += 1
          if (i < s.length && s.charAt(i) == '*') { steps += AllFields; i += 1 }
          else {
            val start = i
            while (i < s.length && s.charAt(i) != '.' && s.charAt(i) != '[') i += 1
            if (i == start) throw new PathError(s"empty member name in $raw")
            steps += Field(s.substring(start, i))
          }
        case '[' =>
          val end = s.indexOf(']', i)
          if (end < 0) throw new PathError(s"unclosed [ in $raw")
          val inner = s.substring(i + 1, end).trim
          if (inner == "*") steps += AllElems
          else if ((inner.startsWith("'") && inner.endsWith("'") && inner.length >= 2) ||
                   (inner.startsWith("\"") && inner.endsWith("\"") && inner.length >= 2))
            steps += Field(inner.substring(1, inner.length - 1))
          else
            try steps += Index(inner.toInt)
            catch { case _: NumberFormatException =>
              throw new PathError(s"bad index '$inner' in $raw") }
          i = end + 1
        case c => throw new PathError(s"unexpected '$c' in $raw")
      }
    }
    val p = ParsedPath(strict, steps.result())
    // unbounded growth is impossible in practice (paths are query literals)
    if (pathCache.size < 10000) pathCache.put(raw, p)
    p
  }

  /** Evaluate a path over a JSON document. Returns the matched nodes;
    * throws PathError on strict-mode structural errors or malformed input.
    */
  def evalPath(json: String, path: ParsedPath): Seq[JsonNode] = {
    val root =
      try mapper.readTree(json)
      catch { case e: Exception => throw new PathError(s"bad json: ${e.getMessage}") }
    if (root == null) throw new PathError("bad json: empty input")
    var current: Seq[JsonNode] = Seq(root)
    path.steps.foreach { step =>
      current = current.flatMap(applyStep(_, step, path.strict))
    }
    current
  }

  private def applyStep(node: JsonNode, step: Step, strict: Boolean): Seq[JsonNode] =
    step match {
      case Field(name) =>
        if (node.isObject) {
          val v = node.get(name)
          if (v != null) Seq(v)
          else if (strict) throw new PathError(s"no member $name")
          else Seq.empty
        } else if (node.isArray && !strict) {
          // lax member access auto-unwraps arrays (SQL/JSON standard)
          import scala.jdk.CollectionConverters._
          node.elements().asScala.toSeq.flatMap(applyStep(_, step, strict))
        } else if (strict) throw new PathError("member access on non-object")
        else Seq.empty
      case AllFields =>
        if (node.isObject) {
          import scala.jdk.CollectionConverters._
          node.elements().asScala.toSeq
        } else if (strict) throw new PathError(".* on non-object")
        else Seq.empty
      case Index(i) =>
        if (node.isArray) {
          if (i >= 0 && i < node.size()) Seq(node.get(i))
          else if (strict) throw new PathError(s"index $i out of bounds")
          else Seq.empty
        } else if (!strict) {
          // lax: non-array behaves as singleton array
          if (i == 0) Seq(node)
          else Seq.empty
        } else throw new PathError("index on non-array")
      case AllElems =>
        if (node.isArray) {
          import scala.jdk.CollectionConverters._
          node.elements().asScala.toSeq
        } else if (!strict) Seq(node)
        else throw new PathError("[*] on non-array")
    }

  private def scalarText(n: JsonNode): UTF8String =
    if (n.isNull) null
    else if (n.isTextual) UTF8String.fromString(n.asText())
    else UTF8String.fromString(n.toString) // number/boolean literal form

  // ---- function-boundary entry points (called from eval and codegen) ----

  def jsonExists(json: UTF8String, path: UTF8String): Boolean =
    try evalPath(json.toString, parsePath(path.toString)).nonEmpty
    catch { case _: PathError => false } // FALSE ON ERROR default

  def jsonValue(json: UTF8String, path: UTF8String,
      onEmpty: UTF8String, onError: UTF8String): UTF8String =
    try {
      val rs = evalPath(json.toString, parsePath(path.toString))
      if (rs.isEmpty) onEmpty
      else if (rs.size > 1 || rs.head.isContainerNode) onError
      else scalarText(rs.head)
    } catch { case _: PathError => onError }

  /** wrapper: 0 = without, 1 = with (unconditional), 2 = conditional.
    * An empty path result is NULL ON EMPTY in every wrapper mode (the
    * standard applies ON EMPTY before wrapping — Calcite/the reference
    * return NULL, not `[]`).
    */
  def jsonQuery(json: UTF8String, path: UTF8String, wrapper: Int): UTF8String =
    try {
      val rs = evalPath(json.toString, parsePath(path.toString))
      wrapper match {
        case 1 =>
          if (rs.isEmpty) null
          else UTF8String.fromString(rs.mkString("[", ",", "]"))
        case 2 =>
          if (rs.isEmpty) null
          else if (rs.size == 1 && rs.head.isContainerNode)
            UTF8String.fromString(rs.head.toString)
          else UTF8String.fromString(rs.mkString("[", ",", "]"))
        case _ =>
          if (rs.isEmpty) null
          else if (rs.size == 1 && rs.head.isContainerNode)
            UTF8String.fromString(rs.head.toString)
          else null // scalar / multi result without wrapper → NULL ON ERROR
      }
    } catch { case _: PathError => null }
}

/** JSON_EXISTS(json, path) → BOOLEAN. */
case class JsonExists(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "json_exists"
  override protected def nullSafeEval(json: Any, path: Any): Any =
    JsonPathUtil.jsonExists(json.asInstanceOf[UTF8String], path.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (j, p) =>
      s"${ev.value} = graft.functions.JsonPathUtil.jsonExists($j, $p);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** JSON_VALUE(json, path, defaultOnEmpty, defaultOnError) → VARCHAR.
  * The 2-arg SQL form fills NULL literals (NULL ON EMPTY / NULL ON ERROR,
  * the reference's defaults); the 4-arg form is DEFAULT ... ON EMPTY/ERROR.
  */
case class JsonValue(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_value"

  // defaults may legitimately be NULL — bypass the null-intolerant
  // QuaternaryExpression contract for the two default-value children.
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val j = first.eval(input)
    val p = second.eval(input)
    if (j == null || p == null) return null
    JsonPathUtil.jsonValue(j.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String],
      third.eval(input).asInstanceOf[UTF8String],
      fourth.eval(input).asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val j = first.genCode(ctx)
    val p = second.genCode(ctx)
    val e = third.genCode(ctx)
    val r = fourth.genCode(ctx)
    ev.copy(code =
      code"""
         |${j.code}
         |${p.code}
         |boolean ${ev.isNull} = true;
         |org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
         |if (!${j.isNull} && !${p.isNull}) {
         |  ${e.code}
         |  ${r.code}
         |  ${ev.value} = graft.functions.JsonPathUtil.jsonValue(
         |    ${j.value}, ${p.value},
         |    ${e.isNull} ? null : ${e.value},
         |    ${r.isNull} ? null : ${r.value});
         |  ${ev.isNull} = ${ev.value} == null;
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

/** JSON_QUERY(json, path, wrapper) → VARCHAR; wrapper is a literal int
  * (0 without / 1 with / 2 conditional array wrapper).
  */
case class JsonQuery(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_query"
  override protected def nullSafeEval(json: Any, path: Any, wrapper: Any): Any =
    JsonPathUtil.jsonQuery(json.asInstanceOf[UTF8String],
      path.asInstanceOf[UTF8String], wrapper.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (j, p, w) => {
      s"""
         |${ev.value} = graft.functions.JsonPathUtil.jsonQuery($j, $p, $w);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): Expression = copy(first = a, second = b, third = c)
}

object JsonFunctions {
  private def nullStr = Literal.create(null, StringType)

  def jsonExists(json: Column, path: Column): Column =
    Bridge.column(JsonExists(Bridge.expression(json), Bridge.expression(path)))

  def jsonValue(json: Column, path: Column): Column =
    Bridge.column(JsonValue(Bridge.expression(json), Bridge.expression(path),
      nullStr, nullStr))

  def jsonValue(json: Column, path: Column, onEmpty: Column, onError: Column): Column =
    Bridge.column(JsonValue(Bridge.expression(json), Bridge.expression(path),
      Bridge.expression(onEmpty), Bridge.expression(onError)))

  def jsonQuery(json: Column, path: Column): Column =
    Bridge.column(JsonQuery(Bridge.expression(json), Bridge.expression(path),
      Literal(0)))

  def jsonQuery(json: Column, path: Column, wrapper: String): Column = {
    val w = wrapper.toLowerCase match {
      case "without" => 0
      case "with" => 1
      case "conditional" => 2
      case other => throw new IllegalArgumentException(s"wrapper: $other")
    }
    Bridge.column(JsonQuery(Bridge.expression(json), Bridge.expression(path),
      Literal(w)))
  }

  /** SQL registration: JSON_EXISTS(j, p), JSON_VALUE(j, p [, onEmpty,
    * onError]), JSON_QUERY(j, p).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      FunctionIdentifier("json_exists"),
      new ExpressionInfo(classOf[JsonExists].getName, "json_exists"),
      (cs: Seq[Expression]) => {
        require(cs.length == 2, "json_exists expects 2 arguments")
        JsonExists(cs(0), cs(1))
      })
    reg.registerFunction(
      FunctionIdentifier("json_value"),
      new ExpressionInfo(classOf[JsonValue].getName, "json_value"),
      (cs: Seq[Expression]) => cs match {
        case Seq(a, b) => JsonValue(a, b, nullStr, nullStr)
        case Seq(a, b, c, d) => JsonValue(a, b, c, d)
        case _ => throw new IllegalArgumentException("json_value expects 2 or 4 arguments")
      })
    reg.registerFunction(
      FunctionIdentifier("json_query"),
      new ExpressionInfo(classOf[JsonQuery].getName, "json_query"),
      (cs: Seq[Expression]) => cs match {
        case Seq(a, b) => JsonQuery(a, b, Literal(0))
        case Seq(a, b, c) =>
          // validate the wrapper argument at analysis time: an integer
          // 0..2 or a 'without'/'with'/'conditional' string literal —
          // anything else would ClassCastException at runtime otherwise
          c match {
            case Literal(i: Int, _) if i >= 0 && i <= 2 => JsonQuery(a, b, c)
            case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
              val w = s.toString.toLowerCase match {
                case "without" => 0
                case "with" => 1
                case "conditional" => 2
                case other => throw new IllegalArgumentException(
                  s"json_query wrapper must be without/with/conditional, got '$other'")
              }
              JsonQuery(a, b, Literal(w))
            case other => throw new IllegalArgumentException(
              "json_query wrapper argument must be an integer 0..2 or a " +
                s"'without'/'with'/'conditional' literal, got $other")
          }
        case _ => throw new IllegalArgumentException("json_query expects 2 or 3 arguments")
      })
  }
}
