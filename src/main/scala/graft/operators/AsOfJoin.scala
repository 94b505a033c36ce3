package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — the reference's `FOR SYSTEM_TIME AS OF` /
  * StreamExecTemporalJoin
  * (/root/reference/flink-table/flink-table-runtime/src/main/java/org/apache/flink/table/runtime/operators/join/temporal/TemporalRowTimeJoinOperator.java:78):
  * each left row joins the latest right row with the same key and
  * right.ts <= left.ts.
  *
  * Spark has no built-in as-of join. The scalable batch form used here is
  * the union + carry-forward pattern: tag both sides, union, then one
  * window sort per key with `last(right_payload, ignoreNulls)` over
  * ROWS UNBOUNDED PRECEDING. Cost = one shuffle on the key + an
  * in-partition sort — O(n log n) per key and no key-cardinality blow-up,
  * unlike the naive join+filter+rank (O(left × right) per key). This is
  * also exactly the versioned-state lookup the streaming operator
  * maintains incrementally.
  *
  * Right rows sort before left rows at equal timestamps, making the match
  * inclusive (right.ts <= left.ts), matching DuckDB/pandas ASOF semantics.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      versioned (build) side
    * @param keyCol     equi-join key column name (same name both sides)
    * @param tsCol      event-time column name (same name both sides)
    * @param rightCols  right-side payload columns to carry
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      rightCols: Seq[String]): DataFrame =
    asOf(left, right, Seq(keyCol), tsCol, rightCols)

  /** Composite-key form — the reference's join spec allows a conjunction
    * of equi-conditions (StreamExecTemporalJoin.java:77, extracted by
    * EventTimeTemporalJoinRewriteRule.java); all key columns together
    * form the partition of the carry-forward window.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, rightCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "asOf needs at least one key column")
    val leftCols = left.columns.toSeq
    val payload = struct(rightCols.map(col): _*)

    val taggedLeft = left.withColumn("__side", lit(1))
    val taggedRight = right
      .select((keyCols.map(col) :+ col(tsCol) :+ payload.as("__payload")): _*)
      .withColumn("__side", lit(0))

    // missing columns (payload on the left, left attrs on the right)
    // union as NULLs
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out = leftCols.map(col) ++
      rightCols.map(c => col("__match").getField(c).as(s"r_$c"))
    matched.select(out: _*)
  }
}
