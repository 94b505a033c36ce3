package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window => WindowNode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.streaming._
import org.apache.spark.sql.types._

/** Streaming SQL rank-pattern recognition — the engine's analogue of the
  * reference's planner rules that turn the idiomatic
  * `ROW_NUMBER() OVER (PARTITION BY k ORDER BY s) <= n` filter into a
  * dedicated streaming operator instead of a (stream-illegal) window:
  *
  *   - `rn <= n` / `< n` / `= n`  →  StreamExecRank.java:87 → the
  *     retractable top-n diff operator;
  *   - `rn = 1` ordered by a time attribute → StreamExecDeduplicate.java:89
  *     → keep-first (ASC) / keep-last (DESC) dedup.
  *
  * Spark's own analyzer accepts the window+filter plan on a streaming
  * DataFrame but rejects it at query start (non-time window); `rewrite`
  * recognizes the analyzed plan shape, unwraps it to the window's child,
  * and routes it through the matching `transformWithState` processor. The
  * result is a changelog DataFrame: `__rowkind` byte + the child's
  * columns (keep-first emits insert-only rows without the kind column,
  * exactly like the reference's append-only dedup).
  *
  * Input may itself be a changelog (a `__rowkind` column on the child):
  * +I/+U upsert by the unique id column, -D deletes it — the reference's
  * RetractableTopNFunction contract. Append-only inputs need no id column
  * (arrival order synthesizes one, the AppendOnlyTopNFunction case).
  *
  * At scale this is the same shape as the reference: state per key is the
  * key's row set (bounded by retention/TTL upstream), the stream shuffles
  * once on the partition columns, and the emitted diff is O(changed
  * ranks), not O(n) per row.
  */
object StreamingRank {

  private case class RankSpec(
      partitionCols: Seq[String], orderCols: Seq[(String, Boolean)], // (col, asc)
      n: Int, child: LogicalPlan)

  /** Recognize Filter(row_number cmp literal) over Window(row_number) and
    * route to the streaming rank/dedup operator. `idCol` names the unique
    * row id (LongType) used to correlate changelog updates; append-only
    * inputs may omit it.
    */
  def rewrite(df: DataFrame, idCol: String = "id",
      stateTtl: Option[java.time.Duration] = None): DataFrame = {
    val spec = recognize(df.queryExecution.analyzed).getOrElse(
      throw new IllegalArgumentException(
        "not a streaming rank pattern: expected FILTER on " +
          "ROW_NUMBER() OVER (PARTITION BY … ORDER BY …) compared to a literal"))
    val spark = df.sparkSession
    val child = Bridge.ofRows(spark, spec.child)

    val isTimeDedup = spec.n == 1 && spec.orderCols.size == 1 &&
      child.schema(spec.orderCols.head._1).dataType.isInstanceOf[TimestampType]
    val ttl = stateTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
    if (isTimeDedup) {
      if (spec.orderCols.head._2) keepFirstRows(child, spec.partitionCols, ttl)
      else keepLastRows(child, spec.partitionCols, ttl)
    } else topN(child, spec, idCol, ttl)
  }

  // ---------------------------------------------------------- recognition

  private def recognize(plan: LogicalPlan): Option[RankSpec] = {
    // strip projections the user stacked above the filter (drop("rn"), …)
    def stripProjects(p: LogicalPlan): LogicalPlan = p match {
      case Project(exprs, child) if exprs.forall(_.isInstanceOf[Attribute]) =>
        stripProjects(child)
      case other => other
    }
    stripProjects(plan) match {
      case Filter(cond, fChild) =>
        // the rank bound: attr cmp literal (attr must resolve to row_number)
        val bound = cond match {
          case LessThanOrEqual(a: Attribute, Literal(v, IntegerType | LongType)) =>
            Some((a, v.toString.toInt))
          case LessThan(a: Attribute, Literal(v, IntegerType | LongType)) =>
            Some((a, v.toString.toInt - 1))
          case EqualTo(a: Attribute, Literal(v, IntegerType | LongType)) if v.toString.toInt == 1 =>
            Some((a, 1))
          case GreaterThanOrEqual(Literal(v, IntegerType | LongType), a: Attribute) =>
            Some((a, v.toString.toInt))
          case _ => None
        }
        bound.flatMap { case (rnAttr, n) =>
          findRowNumberWindow(stripProjects(fChild), rnAttr.exprId).map {
            case (w, parts, orders) =>
              RankSpec(parts, orders, n, w.child)
          }
        }
      case _ => None
    }
  }

  private def findRowNumberWindow(plan: LogicalPlan, rnId: ExprId)
      : Option[(WindowNode, Seq[String], Seq[(String, Boolean)])] = plan match {
    case w @ WindowNode(windowExprs, partitionSpec, orderSpec, _, _) =>
      val isOurRowNumber = windowExprs.exists {
        case a @ Alias(WindowExpression(_: RowNumber, _), _) => a.exprId == rnId
        case _ => false
      }
      if (!isOurRowNumber) None
      else {
        val parts = partitionSpec.map {
          case a: Attribute => a.name
          case other => return None // non-column partition expr: bail out
        }
        val orders = orderSpec.map {
          case SortOrder(a: Attribute, dir, _, _) => (a.name, dir == Ascending)
          case _ => return None
        }
        Some((w, parts, orders))
      }
    case Project(exprs, child) if exprs.forall(_.isInstanceOf[Attribute]) =>
      findRowNumberWindow(child, rnId)
    case _ => None
  }

  // ------------------------------------------------------------- routing

  private val Kind = Changelog.RowKindCol

  /** NUL-joined partition-column key (the package's composite-key
    * convention; NUL never appears in the column renderings).
    */
  private def keyOf(idxs: Seq[Int]): Row => String =
    r => idxs.map(i => String.valueOf(r.get(i))).mkString("\u0000")

  private def dataSchema(child: DataFrame): StructType =
    StructType(child.schema.fields.filterNot(_.name == Kind))

  private def outSchema(child: DataFrame): StructType =
    StructType(StructField(Kind, ByteType, nullable = false) +:
      dataSchema(child).fields)

  private def groupByPartitionKey(child: DataFrame, partitionCols: Seq[String]) = {
    val idxs = partitionCols.map(child.schema.fieldIndex)
    child.groupByKey(keyOf(idxs))(Encoders.STRING)
  }

  /** rn = 1 ORDER BY ts ASC: first row per key wins — insert-only output. */
  private def keepFirstRows(child: DataFrame, partitionCols: Seq[String],
      ttl: TTLConfig): DataFrame =
    groupByPartitionKey(child, partitionCols)
      .transformWithState(new RowKeepFirstProcessor(child.schema, ttl),
        TimeMode.None(), OutputMode.Update())(Encoders.row(child.schema))

  /** rn = 1 ORDER BY ts DESC: newest row wins — retract-stream output. */
  private def keepLastRows(child: DataFrame, partitionCols: Seq[String],
      ttl: TTLConfig): DataFrame = {
    val out = outSchema(child)
    groupByPartitionKey(child, partitionCols)
      .transformWithState(new RowKeepLastProcessor(child.schema, out, ttl),
        TimeMode.None(), OutputMode.Update())(Encoders.row(out))
  }

  private def topN(child: DataFrame, spec: RankSpec, idCol: String,
      ttl: TTLConfig): DataFrame = {
    val schema = child.schema
    val out = outSchema(child)
    val idIdx = if (schema.fieldNames.contains(idCol)) {
      require(schema(idCol).dataType == LongType,
        s"rank id column $idCol must be LongType")
      schema.fieldIndex(idCol)
    } else {
      require(!schema.fieldNames.contains(Kind),
        s"changelog rank input needs a LongType '$idCol' column to correlate updates")
      -1
    }
    val ord = rowOrdering(schema, spec.orderCols)
    groupByPartitionKey(child, spec.partitionCols)
      .transformWithState(
        new RowTopNProcessor(spec.n, schema, out, idIdx, ord, ttl),
        TimeMode.None(), OutputMode.Update())(Encoders.row(out))
  }

  /** Row ordering over the ORDER BY columns (nulls first on ASC, the
    * Spark default), tie-broken by nothing — callers append the id.
    */
  private def rowOrdering(schema: StructType,
      orderCols: Seq[(String, Boolean)]): Ordering[Row] = {
    val cols = orderCols.map { case (name, asc) => (schema.fieldIndex(name), asc) }
    (a: Row, b: Row) => {
      var i = 0
      var c = 0
      while (c == 0 && i < cols.length) {
        val (idx, asc) = cols(i)
        val (x, y) = (a.get(idx), b.get(idx))
        val cmp =
          if (x == null && y == null) 0
          else if (x == null) -1
          else if (y == null) 1
          else x.asInstanceOf[Comparable[Any]].compareTo(y)
        c = if (asc) cmp else -cmp
        i += 1
      }
      c
    }
  }

  // ---------------------------------------------------------- processors

  /** Append-only keep-first per key (StreamExecDeduplicate keep-first). */
  class RowKeepFirstProcessor(schema: StructType,
      ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, Row, Row] {
    @transient private var seen: ValueState[Boolean] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        Encoders.scalaBoolean, ttl)
    override def handleInputRows(key: String, rows: Iterator[Row],
        timerValues: TimerValues): Iterator[Row] =
      if (seen.exists()) Iterator.empty
      else { seen.update(true); rows.take(1) }
  }

  /** Keep-last per key emitting +I then -U/+U retract pairs. */
  class RowKeepLastProcessor(schema: StructType, out: StructType,
      ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, Row, Row] {
    @transient private var last: ValueState[Row] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[Row]("last", Encoders.row(schema), ttl)
    private def tag(kind: Byte, r: Row): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRow(
        (kind +: r.toSeq).toArray[Any])
    override def handleInputRows(key: String, rows: Iterator[Row],
        timerValues: TimerValues): Iterator[Row] = {
      val outRows = scala.collection.mutable.ArrayBuffer.empty[Row]
      rows.foreach { r =>
        if (last.exists()) {
          outRows += tag(Changelog.UpdateBefore, last.get())
          outRows += tag(Changelog.UpdateAfter, r)
        } else outRows += tag(Changelog.Insert, r)
        last.update(r)
      }
      outRows.iterator
    }
  }

  /** Generic-row retractable top-n: state is the key's id→row map; each
    * change re-ranks and emits the DIFF of the visible top-n
    * (RetractableTopNFunction.java:56 semantics, rank cascades included).
    */
  class RowTopNProcessor(n: Int, schema: StructType, out: StructType,
      idIdx: Int, ord: Ordering[Row], ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, Row, Row] {
    @transient private var rowsState: MapState[Long, Row] = _
    @transient private var nextId: ValueState[Long] = _
    private val kindIdx = schema.fieldNames.indexOf(Changelog.RowKindCol)
    private val dataIdxs =
      schema.fieldNames.indices.filter(i => i != kindIdx)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      rowsState = getHandle.getMapState[Long, Row]("rows",
        Encoders.scalaLong, Encoders.row(schema), ttl)
      nextId = getHandle.getValueState[Long]("nextId",
        Encoders.scalaLong, ttl)
    }

    private def tag(kind: Byte, r: Row): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRow(
        (kind.asInstanceOf[Any] +: dataIdxs.map(r.get)).toArray[Any])

    override def handleInputRows(key: String, rows: Iterator[Row],
        timerValues: TimerValues): Iterator[Row] = {
      val outRows = scala.collection.mutable.ArrayBuffer.empty[Row]
      // in-memory mirror of the key's row set; writes go to both
      val m = scala.collection.mutable.LinkedHashMap.empty[Long, Row]
      rowsState.iterator().foreach { case (id, r) => m(id) = r }
      val fullOrd: Ordering[(Long, Row)] =
        Ordering.fromLessThan { (a, b) =>
          val c = ord.compare(a._2, b._2)
          c < 0 || (c == 0 && a._1 < b._1) // deterministic tie-break by id
        }
      def top(): Seq[(Long, Row)] = m.toSeq.sorted(fullOrd).take(n)

      rows.foreach { r =>
        val kind = if (kindIdx < 0) Changelog.Insert else r.getByte(kindIdx)
        val id =
          if (idIdx >= 0) r.getLong(idIdx)
          else {
            val v = if (nextId.exists()) nextId.get() else 0L
            nextId.update(v + 1L); v
          }
        val before = top()
        if (kind == Changelog.Delete) { m.remove(id); rowsState.removeKey(id) }
        else { m(id) = r; rowsState.updateValue(id, r) }
        val after = top()
        val beforeM = before.toMap
        val afterM = after.toMap
        // leaves and changed-olds retract first (reference emit order)
        before.foreach { case (bid, br) =>
          if (!afterM.contains(bid)) outRows += tag(Changelog.Delete, br)
          else if (afterM(bid) != br) outRows += tag(Changelog.UpdateBefore, br)
        }
        after.foreach { case (aid, ar) =>
          if (!beforeM.contains(aid)) outRows += tag(Changelog.Insert, ar)
          else if (beforeM(aid) != ar) outRows += tag(Changelog.UpdateAfter, ar)
        }
      }
      outRows.iterator
    }
  }
}
