package graft.operators

import graft.SparkSuite

/** BPE-ish pre-tokenizer behavior on inputs richer than the synthetic
  * corpus (which is lowercase words + single spaces): contractions,
  * digit runs, punctuation runs, multi-space gaps.
  */
class TextOpsSpec extends SparkSuite {
  import spark.implicits._

  test("bpeTokenStats splits contractions, digits, punctuation, whitespace") {
    val df = Seq(
      (1L, "don't stop"),            // don | 't | _stop
      (2L, "a  b"),                  // a | two-space run collapses: "a", "  "? -> a | ' '+ | b
      (3L, "x12 3,4!!"),             // x | 12 | _3 | , | 4 | !!
      (4L, "word")                   // word
    ).toDF("doc_id", "text")
    val out = TextOps.bpeTokenStats(df).as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // 1: ["don", "'t", " stop"] -> 3 tokens; subword est ceil(3/4)+ceil(2/4)+ceil(4/4)=1+1+1
    assert(out(1L) == ((3L, 3L)))
    // 2: ["a", " ", "b"]? leftmost-first: "a", then " ?[a-zA-Z]+" fails on
    // "  b" (one optional space, next char space), " +" eats ONE spare
    // space, then " b" -> 3 tokens
    assert(out(2L)._1 == 3L)
    // 3: ["x", "12", " 3", ",", "4", "!!"] -> 6 tokens
    assert(out(3L) == ((6L, 6L)))
    assert(out(4L) == ((1L, 1L)))
  }

  test("bpe subword estimate is ceil(len/4) per trimmed pre-token") {
    val df = Seq((1L, "abcdefgh abc")).toDF("doc_id", "text")
    // tokens: ["abcdefgh", " abc"]; est = ceil(8/4) + ceil(3/4) = 2 + 1
    val (n, est) = TextOps.bpeTokenStats(df).as[(Long, Long, Long)]
      .collect().map(r => (r._2, r._3)).head
    assert(n == 2L && est == 3L)
  }

  test("packSequences: greedy bins per group, oversize doc gets own bin") {
    import org.apache.spark.sql.functions.expr
    val docs = Seq(
      (0L, "a b c"),       // 3 tokens → bin 0 (used 3)
      (1L, "d e"),         // 2 → bin 0 (used 5)
      (2L, "f g h i"),     // 4 > remaining 1 → bin 1 (used 4)
      (3L, "s t u v w x y"), // 7 > budget alone → bin 2, never split
      (4L, "y z"),         // 2 → bin 3 (bin 2's 7 busts any addition)
      (100L, "p q r")      // different group → its own bin 0
    ).toDF("doc_id", "text")
    val out = TextOps.packSequences(docs, budget = 6L,
        groupExpr = expr("doc_id DIV 100"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (0L, 0L, 0L, 3L), (1L, 0L, 0L, 2L), (2L, 0L, 1L, 4L),
      (3L, 0L, 2L, 7L), (4L, 0L, 3L, 2L), (100L, 1L, 0L, 3L)), s"got $out")
  }
}
