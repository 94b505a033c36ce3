package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** User-defined aggregate — the reference's `AggregateFunction<T, ACC>`
  * surface (flink-table-common/.../functions/AggregateFunction.java,
  * SURVEY.md §2.11) on Spark's typed `Aggregator`: accumulate/merge map
  * onto accumulate/merge 1:1 (the reference's retract() is only needed by
  * the changelog layer, which uses the streaming processors instead).
  *
  * Exact integer arithmetic keeps the result independent of partition
  * order, so the SQL oracle matches bit-for-bit.
  */
object SumOfSquares extends Aggregator[Long, Long, Long] {
  override def zero: Long = 0L
  override def reduce(acc: Long, x: Long): Long = acc + x * x
  override def merge(a: Long, b: Long): Long = a + b
  override def finish(acc: Long): Long = acc
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
