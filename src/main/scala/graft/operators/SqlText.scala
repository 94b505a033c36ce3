package graft.operators

/** Quote-aware helpers for the SQL front doors' textual rewrites
  * ([[TemporalJoinSql]], [[WindowTvf]]): a rewrite must never touch the
  * inside of a string literal or quoted identifier, and positional
  * heuristics (paren depth) must not count characters inside them.
  *
  * Quoting rules covered: single-quote strings, double-quote strings/
  * identifiers, backtick identifiers; doubled closing quotes ('') and —
  * for the non-backtick forms — backslash escapes (Spark's default
  * parser accepts \' inside a single-quoted literal). SQL comments
  * (`--` to end of line, bracketed `/* … */`) are masked the same way:
  * an apostrophe inside `-- don't` must not open a bogus quote span
  * that swallows the rest of the statement.
  */
private[graft] object SqlText {

  /** [start, end) spans of quoted regions and comments, delimiters
    * included. An unclosed quote or block comment spans to the end of
    * the string.
    */
  def quotedSpans(s: String): Seq[(Int, Int)] = {
    val spans = Seq.newBuilder[(Int, Int)]
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        var j = i + 2
        while (j < s.length && s.charAt(j) != '\n') j += 1
        spans += ((i, j)) // the newline itself stays outside the span
        i = j
      } else if (ch == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        val close = s.indexOf("*/", i + 2)
        val j = if (close < 0) s.length else close + 2
        spans += ((i, j))
        i = j
      } else if (ch == '\'' || ch == '"' || ch == '`') {
        var j = i + 1
        var closed = false
        while (j < s.length && !closed) {
          val c = s.charAt(j)
          if (c == '\\' && ch != '`' && j + 1 < s.length) j += 2
          else if (c == ch) {
            if (j + 1 < s.length && s.charAt(j + 1) == ch) j += 2
            else { closed = true; j += 1 }
          } else j += 1
        }
        spans += ((i, j))
        i = j
      } else i += 1
    }
    spans.result()
  }

  /** Same-length copy of `s` with every quoted span blanked to spaces —
    * run regexes/position scans on the mask, apply edits to the original
    * (positions line up 1:1).
    */
  def maskQuoted(s: String): String = {
    val out = s.toCharArray
    quotedSpans(s).foreach { case (a, b) =>
      var i = a; while (i < b) { out(i) = ' '; i += 1 }
    }
    new String(out)
  }

  /** Same-length copy with quoted spans filled with a NON-SPACE
    * placeholder: keyword/operator scans that treat whitespace as a
    * separator must not see a blanked literal as separator space (a
    * space-mask lets `\s+WHERE` match straight through a string
    * literal), while quoted content still cannot fake a keyword.
    */
  def maskQuotedOpaque(s: String): String = {
    val out = s.toCharArray
    quotedSpans(s).foreach { case (a, b) =>
      var i = a; while (i < b) { out(i) = 'x'; i += 1 }
    }
    new String(out)
  }

  /** Apply `f` to the segments of `s` outside quoted spans; quoted spans
    * pass through verbatim.
    */
  def rewriteOutsideQuotes(s: String)(f: String => String): String = {
    val out = new StringBuilder
    var last = 0
    quotedSpans(s).foreach { case (a, b) =>
      out ++= f(s.substring(last, a))
      out ++= s.substring(a, b)
      last = b
    }
    out ++= f(s.substring(last))
    out.toString
  }
}
