package graft.operators

import org.apache.spark.sql.SparkSession

/** Flink-style SQL hints (`FlinkHints.java`, flink-table-planner
  * `JoinStrategy.java`) for the [[graft.GraftSql]] front door:
  *
  *   - **Join strategy hints** — the reference's `BROADCAST(t)`,
  *     `SHUFFLE_HASH(t)` and `SHUFFLE_MERGE(t)` are ALSO Spark hint
  *     names and pass straight through to Catalyst; `NEST_LOOP(t)`
  *     is Flink-only and rewrites to Spark's `SHUFFLE_REPLICATE_NL`,
  *     the same physical strategy (broadcast-free nested-loop across
  *     replicated partitions).
  *   - **Dynamic table options** — `t` followed by a hint comment
  *     carrying `OPTIONS('k'='v')` (FlinkHints.HINT_NAME_OPTIONS):
  *     per-statement overrides of a
  *     connector table's WITH options. The referenced table must be a
  *     [[ConnectorDdl]]-registered table (the reference likewise
  *     restricts OPTIONS to dynamic tables and gates it behind
  *     `table.dynamic-table-options.enabled`); the hinted scan becomes
  *     a temp view of the table re-read with merged options, spliced in
  *     place of the `t` reference plus its hint comment.
  *   - **STATE_TTL** — rejected loudly: per-operator streaming state
  *     TTL has no SQL-level knob here; the DataFrame-level operators
  *     take TTL config directly (docs/STATE_TTL.md).
  *
  * Hints are block comments, so [[SqlText.quotedSpans]] masks them;
  * this rewriter therefore scans the span list itself for spans opened
  * by the slash-star-plus hint marker and edits right-to-left (string
  * literals inside a hint stay intact, text outside is never touched).
  */
object SqlHints {

  private val NestLoopRe = "(?i)\\bNEST_LOOP\\s*\\(".r
  private val OptionsRe = "(?is)^/\\*\\+\\s*OPTIONS\\s*\\((.*)\\)\\s*\\*/$".r
  private val OptionPairRe =
    "'((?:[^']|'')*)'\\s*=\\s*'((?:[^']|'')*)'".r
  private val TableBeforeRe = "([A-Za-z_][\\w.]*)\\s*$".r

  private val viewSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** One rewrite pass; None when the statement carries no hint this
    * object acts on (plain Spark-native hints fall through untouched).
    */
  def step(spark: SparkSession, text: String): Option[(String, Seq[String])] = {
    val hintSpans = SqlText.quotedSpans(text)
      .filter { case (a, b) => text.regionMatches(a, "/*+", 0, 3) && b - a >= 6 }
    if (hintSpans.isEmpty) return None
    var out = text
    val views = Seq.newBuilder[String]
    var changed = false
    // right-to-left so earlier spans' offsets survive later edits
    hintSpans.reverse.foreach { case (a, b) =>
      val hint = text.substring(a, b)
      if ("(?i)\\bSTATE_TTL\\s*\\(".r.findFirstIn(hint).isDefined)
        sys.error("STATE_TTL hint is not SQL-configurable here: pass TTL " +
          "to the stateful operator directly (docs/STATE_TTL.md)")
      hint match {
        case OptionsRe(pairs) =>
          // the token immediately before the hint must be a registered
          // connector table
          val before = text.substring(0, a)
          val name = TableBeforeRe.findFirstMatchIn(before).map(_.group(1))
            .getOrElse(sys.error(s"OPTIONS hint must follow a table name: $hint"))
          val desc = ConnectorDdl.lookup(spark, name).getOrElse(
            sys.error(s"OPTIONS hint target '$name' is not a connector " +
              "table (the reference likewise restricts dynamic options " +
              "to catalog dynamic tables)"))
          val overrides = OptionPairRe.findAllMatchIn(pairs).map(m =>
            m.group(1).replace("''", "'") -> m.group(2).replace("''", "'"))
            .toMap
          require(overrides.nonEmpty, s"OPTIONS hint carries no pairs: $hint")
          val view = s"${desc.name}__opt${viewSeq.incrementAndGet()}"
          ConnectorDdl.frameWithOptions(spark, name, overrides)
            .createOrReplaceTempView(view)
          views += view
          val nameStart = a - (before.length -
            TableBeforeRe.findFirstMatchIn(before).get.start)
          out = out.substring(0, nameStart) + view + out.substring(b)
          changed = true
        case _ =>
          val rewritten = NestLoopRe.replaceAllIn(hint, "SHUFFLE_REPLICATE_NL(")
          if (rewritten != hint) {
            out = out.substring(0, a) + rewritten + out.substring(b)
            changed = true
          }
      }
    }
    if (changed) Some((out, views.result())) else None
  }
}
