package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** The round-8 scale contract of the sorted-index top-n: per-record work
  * is O(n + log m) comparisons and at most two affected ids per diff —
  * NOT the O(m log m) full re-sort the previous layout paid — and the
  * emitted diff matches a brute-force before/after top-n model under
  * random changelogs.
  */
class TopNIndexSpec extends AnyFunSuite {

  test("one change costs O(n + log m) comparisons, not O(m)") {
    def costAt(m: Int): Long = {
      val idx = new TopNIndex[Long](5, Ordering.Long)
      idx.load((0 until m).iterator.map(i => (i.toLong, i.toLong * 2)))
      idx.comparisons = 0
      idx.apply(delete = false, (m / 2).toLong, -1L) // jump into the top-n
      idx.apply(delete = true, (m / 4).toLong, 0L)
      idx.comparisons
    }
    val small = costAt(512)
    val large = costAt(8192)
    // log-scaling: 16× the rows must not cost anywhere near 16× the
    // comparisons (the old full re-sort would be ≥ 16×); allow 2× for
    // the extra ~log2(16) tree levels plus noise
    assert(large <= small * 2, s"cost grew linearly: $small -> $large")
    // absolute bound: a generous constant × (n + log2 m)
    assert(large <= 40 * (5 + 13), s"per-record comparisons too high: $large")
  }

  test("a change touches at most the affected ids (≤ 2 per diff)") {
    val idx = new TopNIndex[Long](3, Ordering.Long)
    idx.load((0 until 100).iterator.map(i => (i.toLong, i.toLong)))
    val enter = idx.apply(delete = false, 50L, -5L) // enters top-3, evicts 2
    assert(enter.size == 2)
    val noop = idx.apply(delete = false, 80L, 80L) // deep outside the top-n
    assert(noop.isEmpty)
    val del = idx.apply(delete = true, 50L, 0L) // leaves, promotes 2 back
    assert(del.size == 2)
  }

  test("random changelogs: diff folds to the brute-force top-n at every step") {
    val rnd = new scala.util.Random(8)
    val n = 3
    val idx = new TopNIndex[Long](n, Ordering.Long)
    val model = scala.collection.mutable.Map.empty[Long, Long]
    val visible = scala.collection.mutable.Map.empty[Long, Long]
    (1 to 2000).foreach { _ =>
      val id = rnd.nextInt(40).toLong
      val del = rnd.nextInt(4) == 0 && model.contains(id)
      val sort = rnd.nextInt(1000).toLong
      if (del) model.remove(id) else model(id) = sort
      idx.apply(del, id, sort).foreach { v =>
        (v.oldSort, v.newSort) match {
          case (Some(_), None) => visible.remove(v.id)
          case (_, Some(ns)) => visible(v.id) = ns
          case _ =>
        }
      }
      val expected = model.toSeq.sortBy { case (i, s) => (s, i) }.take(n).toMap
      assert(visible.toMap == expected, s"after ($del, $id, $sort)")
    }
  }
}
