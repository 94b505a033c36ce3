package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog layer: the engine's analogue of the reference's dynamic-table
  * row kinds (flink-core/src/main/java/org/apache/flink/types/RowKind.java:
  * +I :31, -U :40, +U :49, -D :52) carried as an explicit `__rowkind`
  * BYTE column on DataFrames, plus the planner-ish helpers that the
  * reference implements as exec nodes:
  *
  *   - `dropUpdateBefore`  ≈ StreamExecDropUpdateBefore.java:55 (strip -U
  *     rows for upsert sinks);
  *   - `upsertToRetract`   ≈ StreamExecChangelogNormalize.java:77 (turn an
  *     upsert stream into a full retract stream, batch form);
  *   - `materialize`       — fold a bounded changelog to its final table
  *     (the semantic ground truth used by the streaming operator specs).
  *
  * Spark has no first-class changelog; Structured Streaming output modes
  * (Append/Update/Complete) cover the sink side, and the stateful
  * operators in this package emit `__rowkind`-tagged rows for the rest.
  */
object Changelog {
  val RowKindCol = "__rowkind"

  val Insert: Byte = 0       // +I
  val UpdateBefore: Byte = 1 // -U
  val UpdateAfter: Byte = 2  // +U
  val Delete: Byte = 3       // -D

  /** Is this row an addition (accumulate) or a retraction (subtract)? */
  def isAdd(kind: Byte): Boolean = kind == Insert || kind == UpdateAfter

  /** StreamExecDropUpdateBefore: upsert sinks don't need -U rows. */
  def dropUpdateBefore(df: DataFrame): DataFrame =
    df.filter(col(RowKindCol) =!= UpdateBefore)

  /** Tag an insert-only DataFrame with +I row kinds. */
  def asInsertOnly(df: DataFrame): DataFrame =
    df.withColumn(RowKindCol, lit(Insert))

  /** Fold a bounded changelog (ordered by `seqCol`) down to the final
    * table state per key: the last +I/+U row per key, unless it was
    * deleted afterwards. Used by specs to check that an operator's emitted
    * changelog materializes to the expected table.
    */
  def materialize(df: DataFrame, keyCols: Seq[String], seqCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    df.filter(col(RowKindCol) =!= UpdateBefore)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(RowKindCol) =!= Delete)
      .drop("__rn", RowKindCol)
  }
}
