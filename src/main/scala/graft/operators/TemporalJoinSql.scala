package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL front door for the temporal / as-of join — the reference's
  * `JOIN t FOR SYSTEM_TIME AS OF l.ts` idiom
  * (flink-table/flink-table-planner/.../exec/stream/StreamExecTemporalJoin.java:77,
  * rewrite rule EventTimeTemporalJoinRewriteRule.java; grammar in
  * flink-sql-parser's SqlSnapshot). Spark has no temporal-join syntax,
  * so — like [[WindowTvf]] — the statement is rewritten: the
  *
  *   `FROM <left> AS l JOIN <right> FOR SYSTEM_TIME AS OF l.<ts> AS r
  *    ON l.<k> = r.<k>`
  *
  * span is parsed, the as-of join is computed via [[AsOfJoin]] (the
  * union + carry-forward plan: one shuffle on the key, no per-key
  * blow-up), registered as a temp view, and the span plus the alias
  * qualifiers are substituted so the rest of the statement is ordinary
  * SQL: left columns keep their names, right columns surface as
  * `r_<col>` (so `r.x` rewrites to `r_x`), matching the AsOfJoin output
  * contract.
  *
  * Version-time column: the right side's event-time attribute. As in the
  * reference (where it comes from the right table's WATERMARK
  * declaration), it is not part of the join syntax — it defaults to the
  * right column named like the probe-time column and can be overridden
  * with `rightTimeCol`.
  *
  * Match semantics are LEFT (unmatched probes keep NULLs), the AsOfJoin
  * contract. Batch inputs route to [[AsOfJoin]]'s carry-forward plan;
  * streaming inputs to the watermark-driven
  * [[graft.streaming.TemporalJoin.asOfStream]] versioned-state operator
  * (late rows dropped, versions GC'd at the watermark).
  */
object TemporalJoinSql {

  private val JoinRe = (
    """(?is)FROM\s+(\w+)(?:\s+AS)?\s+(\w+)\s+""" +
    """JOIN\s+(\w+)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+(\w+)\.(\w+)(?:\s+AS)?\s+(\w+)\s+""" +
    """ON\s+(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)""").r

  /** Execute a SQL statement containing the FOR SYSTEM_TIME AS OF join. */
  def sql(spark: SparkSession, query: String,
      rightTimeCol: Option[String] = None): DataFrame = {
    val m = JoinRe.findFirstMatchIn(query).getOrElse(
      throw new IllegalArgumentException(
        "no `FROM l [AS] a JOIN r FOR SYSTEM_TIME AS OF a.ts [AS] b ON …` " +
          "span found in statement"))
    val (lt, la, rt) = (m.group(1), m.group(2), m.group(3))
    val (asAlias, tsCol, ra) = (m.group(4), m.group(5), m.group(6))
    require(asAlias == la,
      s"FOR SYSTEM_TIME AS OF must reference the probe side: $asAlias.$tsCol")
    require(la != ra, s"join aliases must differ, got $la twice")
    def keyOf(a: String, c: String, b: String, d: String): (String, String) =
      if (a == la && b == ra) (c, d)
      else if (a == ra && b == la) (d, c)
      else throw new IllegalArgumentException(
        s"ON must equate the two join aliases, got $a.$c = $b.$d")
    val (leftKey, rightKey) =
      keyOf(m.group(7), m.group(8), m.group(9), m.group(10))

    val left = spark.table(lt)
    val right = spark.table(rt)
    require(left.isStreaming == right.isStreaming,
      "temporal join sides must both be batch or both be streaming")
    val rightTs = rightTimeCol.getOrElse {
      require(right.columns.contains(tsCol),
        s"right side $rt has no version-time column '$tsCol'; pass rightTimeCol")
      tsCol
    }

    // align key/ts names across sides through internal columns so the
    // join cores see one name each; dropped from the view
    val left2 = left
      .withColumn("__tj_k", col(leftKey)).withColumn("__tj_t", col(tsCol))
    val right2 = right
      .withColumn("__tj_k", col(rightKey)).withColumn("__tj_t", col(rightTs))
    // batch routes to the union + carry-forward plan; streaming to the
    // watermark-driven versioned-state operator (StreamExecTemporalJoin)
    val joined =
      (if (left.isStreaming)
        graft.streaming.TemporalJoin.asOfStream(
          left2, right2, "__tj_k", "__tj_t", right.columns.toSeq)
      else
        AsOfJoin.asOf(left2, right2, "__tj_k", "__tj_t", right.columns.toSeq))
        .drop("__tj_k", "__tj_t")

    val view = s"__tj_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    joined.createOrReplaceTempView(view)
    val spliced =
      query.substring(0, m.start) + s"FROM $view" + query.substring(m.end)
    // qualifier rewrite over the remaining statement: right alias maps to
    // the r_ namespace, left alias qualifiers drop. Applied only OUTSIDE
    // quoted segments — an `alias.word` sequence inside a string literal
    // ('p.note') or backtick identifier is content, not a reference.
    val dequalified = SqlText.rewriteOutsideQuotes(spliced) { seg =>
      val rewritten = s"""(?i)\\b$ra\\.(\\w+)""".r
        .replaceAllIn(seg, mm => s"r_${mm.group(1)}")
      s"""(?i)\\b$la\\.(\\w+)""".r
        .replaceAllIn(rewritten, mm => mm.group(1))
    }
    try spark.sql(dequalified)
    finally spark.catalog.dropTempView(view)
  }
}
