package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

/** Property-based compatibility test for the split_index expression —
  * the expression-level testing strategy SURVEY §5 commits to (and the
  * reference lacks): the UTF8String fast path must agree with a trivial
  * JVM-String model on arbitrary inputs, including unicode, empty
  * separators, repeated separators, and out-of-range indices.
  */
class SplitIndexPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  /** Model: literal split on JVM Strings. */
  private def model(s: String, sep: String, idx: Int): Option[String] = {
    if (idx < 0) return None
    if (sep.isEmpty) return if (idx == 0) Some(s) else None
    // literal (non-regex) split with trailing fields kept
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var p = s.indexOf(sep, start)
    while (p >= 0) {
      parts += s.substring(start, p)
      start = p + sep.length
      p = s.indexOf(sep, start)
    }
    parts += s.substring(start)
    if (idx < parts.length) Some(parts(idx)) else None
  }

  private def impl(s: String, sep: String, idx: Int): Option[String] =
    Option(SplitIndexUtil.splitIndex(
      UTF8String.fromString(s), UTF8String.fromString(sep), idx))
      .map(_.toString)

  private val strGen: Gen[String] = Gen.oneOf(
    Gen.listOf(Gen.oneOf('a', 'b', ',', '|', 'é', '中')).map(_.mkString),
    Gen.alphaNumStr)
  private val sepGen: Gen[String] = Gen.oneOf("", ",", "|", "ab", "é", ",,")

  test("split_index agrees with the String model on arbitrary inputs") {
    check(Prop.forAll(strGen, sepGen, Gen.chooseNum(-2, 8)) {
      (s: String, sep: String, idx: Int) =>
        impl(s, sep, idx) == model(s, sep, idx)
    })
  }

  test("rolling-hash fingerprint stays within [0, 2^31-1)") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(0L, Long.MaxValue / 64))) {
      hs: List[Long] =>
        val folded = hs.foldLeft(0L)((acc, h) => (acc * 31 + h % 2147483647L) % 2147483647L)
        folded >= 0 && folded < 2147483647L
    })
  }
}
