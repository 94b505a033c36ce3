package graft.operators

import org.apache.spark.sql.SparkSession

import graft.cep.MatchRecognize

/** Statement-level MATCH_RECOGNIZE rewriting — the missing piece between
  * [[graft.cep.MatchRecognize]] (which takes a DataFrame plus the bare
  * clause) and full-statement SQL à la the reference's single parser
  * (flink-table/flink-sql-parser: SqlMatchRecognize under ParserImpl):
  *
  *   `SELECT … FROM <table> MATCH_RECOGNIZE ( … ) [AS <alias>] …`
  *
  * The span is located on quote-masked text, the clause is handed to the
  * batch or streaming MATCH_RECOGNIZE operator by the table's mode, the
  * result is registered as a temp view, and the span collapses to
  * `FROM <view>` (alias qualifiers drop — the operator's output columns
  * are the PARTITION BY columns plus the MEASURES aliases, unqualified).
  */
private[graft] object MatchRecognizeSql {

  private val HeadRe =
    """(?is)FROM\s+(\w+)\s+MATCH_RECOGNIZE\s*\(""".r

  /** Rewrite the statement's first MATCH_RECOGNIZE span WITHOUT
    * executing; None when the statement has none.
    */
  def step(spark: SparkSession, query: String): Option[(String, Seq[String])] = {
    val masked = SqlText.maskQuoted(query)
    HeadRe.findFirstMatchIn(masked).map { m =>
      val before = masked.substring(0, m.start)
      require(before.count(_ == '(') == before.count(_ == ')'),
        "MATCH_RECOGNIZE inside a subquery is not supported: run it as " +
          "the outer statement (or register the subquery as a view first)")
      val tableName = m.group(1)
      // balanced-paren scan for the clause end (masked text: parens in
      // literals don't count)
      var depth = 1
      var i = m.end
      while (depth > 0 && i < masked.length) {
        masked.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        i += 1
      }
      require(depth == 0, "unbalanced parentheses in MATCH_RECOGNIZE clause")
      // optional `AS <alias>` after the closing paren
      val AliasRe = """(?is)^\s+AS\s+(\w+)""".r
      val (alias, spanEnd) = AliasRe.findFirstMatchIn(masked.substring(i)) match {
        case Some(am) => (Some(am.group(1)), i + am.end)
        case None => (None, i)
      }
      // locate the keyword inside the matched head case-insensitively
      // (no toUpperCase over the whole text: locale-dependent case
      // mapping could change string length and shift positions)
      val mrStart = m.start + """(?i)MATCH_RECOGNIZE""".r
        .findFirstMatchIn(masked.substring(m.start, m.end)).get.start
      val clause = query.substring(mrStart, i)
      val df = spark.table(tableName)
      val out =
        if (df.isStreaming) MatchRecognize.streaming(df, clause)
        else MatchRecognize(df, clause)
      val view = s"__mr_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      out.createOrReplaceTempView(view)
      val spliced =
        query.substring(0, m.start) + s"FROM $view" + query.substring(spanEnd)
      val dequalified = alias match {
        case Some(a) => SqlText.rewriteOutsideQuotes(spliced) { seg =>
          // alias.col → col; alias.* → * (the splice removed the AS
          // alias, so a qualified star would not resolve)
          s"""(?i)\\b$a\\.(\\*|\\w+)""".r
            .replaceAllIn(seg, mm => java.util.regex.Matcher
              .quoteReplacement(mm.group(1)))
        }
        case None => spliced
      }
      (dequalified, Seq(view))
    }
  }
}
