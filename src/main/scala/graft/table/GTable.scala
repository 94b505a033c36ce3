package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fluent Table API — the engine's analogue of the reference's `Table`
  * verb surface (flink-table-api-java/.../Table.java: select:129,
  * filter:199, groupBy:234, join/leftOuterJoin, unionAll, orderBy,
  * fetch/offset, window(Tumble/Slide/Session/Over)). A thin, zero-cost
  * facade over DataFrame: every verb just builds the same Catalyst plan a
  * direct DataFrame call would, so nothing is lost to the optimizer —
  * the point is source-level familiarity for a reference user switching
  * engines.
  */
case class GTable(df: DataFrame) {

  def select(cols: Column*): GTable = GTable(df.select(cols: _*))
  def as(alias: String): GTable = GTable(df.as(alias))
  def filter(cond: Column): GTable = GTable(df.filter(cond))
  def where(cond: Column): GTable = filter(cond)

  def groupBy(cols: Column*): GGroupedTable = GGroupedTable(df, cols)

  def distinct(): GTable = GTable(df.distinct())

  def join(right: GTable, cond: Column): GTable = GTable(df.join(right.df, cond))
  def join(right: GTable, cond: Column, joinType: String): GTable =
    GTable(df.join(right.df, cond, joinType))
  def leftOuterJoin(right: GTable, cond: Column): GTable = join(right, cond, "left")
  def rightOuterJoin(right: GTable, cond: Column): GTable = join(right, cond, "right")
  def fullOuterJoin(right: GTable, cond: Column): GTable = join(right, cond, "full")

  def unionAll(other: GTable): GTable = GTable(df.unionAll(other.df))
  def union(other: GTable): GTable = GTable(df.unionAll(other.df).distinct())
  def intersect(other: GTable): GTable = GTable(df.intersect(other.df))
  def intersectAll(other: GTable): GTable = GTable(df.intersectAll(other.df))
  def minus(other: GTable): GTable = GTable(df.except(other.df))
  def minusAll(other: GTable): GTable = GTable(df.exceptAll(other.df))

  def orderBy(cols: Column*): GTable = GTable(df.orderBy(cols: _*))
  def fetch(n: Int): GTable = GTable(df.limit(n))
  def offset(n: Int): GTable = GTable(df.offset(n))
  def limit(offset: Int, fetch: Int): GTable = GTable(df.offset(offset).limit(fetch))

  /** Group-window entry (Table.window(TumbleWith...) parity). */
  def window(w: GWindow, key: Column*): GGroupedTable =
    GGroupedTable(df, w.toColumn +: key)

  def addColumns(cols: (String, Column)*): GTable =
    GTable(cols.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) })
  def renameColumns(renames: (String, String)*): GTable =
    GTable(renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) })
  def dropColumns(cols: String*): GTable = GTable(df.drop(cols: _*))

  def toDF: DataFrame = df
}

case class GGroupedTable(df: DataFrame, keys: Seq[Column]) {
  /** Table.select on a grouped table = aggregate. The reference's
    * groupBy().select lists the keys explicitly while Spark's agg()
    * prepends them implicitly — key references in the select list are
    * therefore dropped before delegating.
    */
  def select(aggs: Column*): GTable = {
    val keyStrs = keys.map(_.toString).toSet
    val realAggs = aggs.filterNot(a => keyStrs.contains(a.toString))
    if (realAggs.isEmpty) GTable(df.select(keys: _*).distinct())
    else GTable(df.groupBy(keys: _*).agg(realAggs.head, realAggs.tail: _*))
  }
  def aggregate(aggs: Column*): GTable = select(aggs: _*)
}

/** Group-window specs — Tumble/Slide/Session over an event-time column
  * (the reference's Tumble.over(...).on(...).as(...) builders, §2.5).
  */
sealed trait GWindow { def toColumn: Column }
case class Tumble(timeCol: Column, size: String) extends GWindow {
  def toColumn: Column = window(timeCol, size)
}
case class Slide(timeCol: Column, size: String, slide: String) extends GWindow {
  def toColumn: Column = window(timeCol, size, slide)
}
case class Session(timeCol: Column, gap: String) extends GWindow {
  def toColumn: Column = session_window(timeCol, gap)
}

/** Over-window builder (Table.window(Over...) parity, §2.6). */
object GOver {
  def partitionBy(cols: Column*): GOverBuilder = GOverBuilder(cols, Nil)
}
case class GOverBuilder(partition: Seq[Column], order: Seq[Column]) {
  def orderBy(cols: Column*): GOverBuilder = copy(order = cols)
  def preceding(n: Long): org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy(partition: _*).orderBy(order: _*)
      .rowsBetween(-n, Window.currentRow)
  def unboundedPreceding: org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy(partition: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
}

object GTable {
  def fromParquet(spark: org.apache.spark.sql.SparkSession, path: String): GTable =
    GTable(spark.read.parquet(path))
}
