package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite
import ChangelogInference._

/** The mini changelog-mode inference must classify plan shapes the way
  * the reference's FlinkChangelogModeInferenceProgram does: map-like →
  * insert-only/Append; unwindowed agg → updating/Update; watermarked
  * window agg → insert-only with Append legal.
  */
class ChangelogInferenceSpec extends SparkSuite {
  import spark.implicits._

  private def stream = {
    implicit val sqlCtx = spark.sqlContext
    MemoryStream[(Timestamp, String, Long)].toDS().toDF("ts", "k", "v")
  }

  test("project/filter chain is insert-only, Append legal") {
    val inf = infer(stream.filter($"v" > 0).select($"k", $"v" * 2))
    assert(inf.kind == InsertOnly)
    assert(inf.defaultMode == OutputMode.Append())
    assert(!inf.needsRowKind)
  }

  test("unwindowed aggregate is updating, needs rowkind") {
    val inf = infer(stream.groupBy($"k").agg(sum($"v")))
    assert(inf.kind == Updating)
    assert(inf.legalModes.contains(OutputMode.Update()))
    assert(inf.needsRowKind)
  }

  test("watermarked tumbling window aggregate may Append") {
    val inf = infer(
      stream.withWatermark("ts", "10 seconds")
        .groupBy(window($"ts", "1 minute"), $"k").agg(sum($"v")))
    assert(inf.kind == InsertOnly)
    assert(inf.legalModes.contains(OutputMode.Append()))
  }

  test("session window aggregate may Append") {
    val inf = infer(
      stream.withWatermark("ts", "10 seconds")
        .groupBy(session_window($"ts", "30 seconds"), $"k").agg(count(lit(1))))
    assert(inf.kind == InsertOnly)
    assert(inf.legalModes.contains(OutputMode.Append()))
  }

  test("join of two append streams stays insert-only") {
    implicit val sqlCtx = spark.sqlContext
    val a = MemoryStream[(Timestamp, Long)].toDS().toDF("a_ts", "id")
    val b = MemoryStream[(Timestamp, Long)].toDS().toDF("b_ts", "id2")
    val inf = infer(a.join(b, $"id" === $"id2"))
    assert(inf.kind == InsertOnly)
  }
}
