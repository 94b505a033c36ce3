package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Flink-exact `SPLIT_INDEX(str, sep, index)` as a native Catalyst
  * expression with whole-stage codegen — the reference's splitIndex
  * built-in (flink-table-common/.../functions/BuiltInFunctionDefinitions.java:1286):
  *
  *   - `sep` is a literal delimiter (not a regex);
  *   - `index` is 0-based;
  *   - out-of-range index → NULL (not an error, not empty string);
  *   - any NULL argument → NULL; negative index → NULL.
  *
  * Spark's `element_at(split(s, re), i)` differs on all four points
  * (regex, 1-based, error/NULL configurable), which is why this is a
  * custom `Expression` rather than a composition — the preferred shape
  * for engine extensions: codegen-friendly, no UDF serialization, usable
  * from both the Column DSL and SQL (via `GraftFunctions.register`).
  */
case class SplitIndex(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_split_index"

  override protected def nullSafeEval(str: Any, sep: Any, idx: Any): Any =
    SplitIndexUtil.splitIndex(str.asInstanceOf[UTF8String],
      sep.asInstanceOf[UTF8String], idx.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, d, i) => {
      s"""
         |${ev.value} = graft.functions.SplitIndexUtil.splitIndex($s, $d, $i);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SplitIndexUtil {
  /** Literal (non-regex) split, 0-based extract, null when out of range.
    * Walks delimiter occurrences with indexOf/substring — no regex engine,
    * no JVM String allocation (UTF8String.split would treat the separator
    * as a regex, which Flink's SPLIT_INDEX does not).
    */
  def splitIndex(str: UTF8String, sep: UTF8String, idx: Int): UTF8String = {
    if (idx < 0) return null
    if (sep.numBytes() == 0) return if (idx == 0) str else null
    var start = 0
    var remaining = idx
    while (remaining > 0) {
      val p = str.indexOf(sep, start)
      if (p < 0) return null
      start = p + sep.numChars()
      remaining -= 1
    }
    val end = str.indexOf(sep, start)
    if (end < 0) str.substring(start, str.numChars())
    else str.substring(start, end)
  }
}

object GraftFunctions {
  /** Column-DSL entry point. */
  def splitIndex(str: Column, sep: Column, index: Column): Column =
    Bridge.column(SplitIndex(
      Bridge.expression(str),
      Bridge.expression(sep),
      Bridge.expression(index)))

  /** SQL registration: `SELECT split_index(s, ',', 2)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("split_index"),
      new ExpressionInfo(classOf[SplitIndex].getName, "split_index"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "split_index expects 3 arguments")
        SplitIndex(children(0), children(1), children(2))
      })
  }
}
