package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SessionWindow, TimeWindow}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.streaming.OutputMode

/** Mini changelog-mode inference — the engine's version of the reference's
  * FlinkChangelogModeInferenceProgram
  * (flink-table-planner/.../plan/optimize/program/FlinkChangelogModeInferenceProgram.scala),
  * which decides per query whether edges carry inserts only or updates/
  * retractions, and which sink mode is legal (SURVEY.md §4.1 — "no
  * Catalyst analogue; our engine must implement a mini version").
  *
  * Walks the analyzed logical plan:
  *   - unwindowed streaming Aggregate → result is an update stream →
  *     Update (or Complete) output; downstream operators must handle
  *     -U/+U, i.e. need the __rowkind convention of [[Changelog]];
  *   - windowed/watermarked Aggregate → results finalize on watermark →
  *     Append is legal;
  *   - dedup/limit (Deduplicate nodes surface as Aggregate/Window in the
  *     analyzed plan) follow the same rule;
  *   - plain map-like plans (Project/Filter/Join of append sources) →
  *     insert-only append stream.
  */
object ChangelogInference {

  /** What a plan edge carries — mirrors the reference's ModifyKindSet
    * (insert-only vs updating).
    */
  sealed trait StreamKind
  case object InsertOnly extends StreamKind
  case object Updating extends StreamKind

  case class Inference(kind: StreamKind, legalModes: Seq[OutputMode]) {
    def needsRowKind: Boolean = kind == Updating
    def defaultMode: OutputMode = legalModes.head
  }

  def infer(df: DataFrame): Inference = {
    val plan = df.queryExecution.analyzed
    val aggs = plan.collect { case a: Aggregate => a }
    val updatingAgg = aggs.exists(a => !isWindowed(a))
    val hasFlatMapGroupsWithState = plan.collect {
      case f: FlatMapGroupsWithState => f
      case t if t.nodeName.contains("TransformWithState") => t
    }.nonEmpty

    if (updatingAgg)
      Inference(Updating, Seq(OutputMode.Update(), OutputMode.Complete()))
    else if (hasFlatMapGroupsWithState)
      // arbitrary stateful op: emission contract is the processor's;
      // Update is the safe default (the reference treats these as
      // potentially-updating unless declared insert-only)
      Inference(Updating, Seq(OutputMode.Update()))
    else if (aggs.nonEmpty)
      // all aggregates windowed on event time → finalized by watermark
      Inference(InsertOnly, Seq(OutputMode.Append(), OutputMode.Update()))
    else
      Inference(InsertOnly, Seq(OutputMode.Append()))
  }

  /** A grouped aggregate whose keys include a time window (window/
    * session_window struct) finalizes per-window — the analogue of the
    * reference's window-agg exec nodes being insert-only producers.
    */
  private def isWindowed(a: Aggregate): Boolean =
    a.groupingExpressions.exists(isWindowExpr)

  /** Structural detection (not toString matching, which would misclassify a
    * user column literally named "window"): either the grouping expression
    * contains a TimeWindow/SessionWindow node, or it references the
    * attribute the TimeWindowing/SessionWindowing analyzer rules produced —
    * recognizable by the spark.timeWindow / spark.sessionWindow metadata
    * marker those rules attach.
    */
  private def isWindowExpr(e: Expression): Boolean =
    e.exists {
      case _: TimeWindow | _: SessionWindow => true
      case attr: Attribute =>
        attr.metadata.contains("spark.timeWindow") ||
          attr.metadata.contains("spark.sessionWindow")
      case _ => false
    }
}
