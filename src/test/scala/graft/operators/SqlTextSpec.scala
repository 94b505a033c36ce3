package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The quote/comment scanner that every SQL front-door rewrite depends
  * on: literals, identifiers, escapes, and both comment forms must mask
  * so rewrites and positional scans never touch their contents.
  */
class SqlTextSpec extends AnyFunSuite {

  test("quoted literals and identifiers mask; the rest passes through") {
    val s = "SELECT 'a.b', \"c d\", `e.f`, g FROM t"
    val m = SqlText.maskQuoted(s)
    assert(m == "SELECT      ,      ,      , g FROM t")
    assert(m.length == s.length)
  }

  test("doubled and backslash-escaped quotes stay inside one span") {
    assert(SqlText.maskQuoted("x 'it''s' y").endsWith(" y"))
    assert(SqlText.maskQuoted("""x 'can\'t' y""").endsWith(" y"))
  }

  test("an apostrophe in a line comment does not open a quote span") {
    val s = "SELECT a -- don't trip\nFROM t WHERE b = 'x'"
    val m = SqlText.maskQuoted(s)
    assert(m.contains("FROM t WHERE b ="))
    assert(!m.contains("don't"))
    assert(!m.contains("'x'"))
  }

  test("block comments mask, including quotes inside them") {
    val s = "SELECT /* who's asking? */ a FROM t"
    val m = SqlText.maskQuoted(s)
    assert(m == "SELECT                     a FROM t")
  }

  test("unclosed block comment spans to end of string") {
    val m = SqlText.maskQuoted("SELECT a /* oops")
    assert(m == "SELECT a        ")
  }

  test("rewriteOutsideQuotes leaves comments and literals verbatim") {
    val s = "p.x -- p.y\n'p.z' p.w"
    val out = SqlText.rewriteOutsideQuotes(s)(seg =>
      seg.replaceAll("""p\.(\w+)""", "$1"))
    assert(out == "x -- p.y\n'p.z' w")
  }
}
