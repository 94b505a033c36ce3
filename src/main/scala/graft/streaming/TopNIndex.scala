package graft.streaming

import scala.collection.mutable

/** Sorted top-n index — the state shape of the reference's retractable
  * rank operators (flink-table-runtime/.../operators/rank/
  * RetractableTopNFunction.java:56 `treeMap` sorted index + data state;
  * UpdatableTopNFunction.java:71): a per-key ordered set over
  * (sortKey, id), mirrored from a point-addressable MapState once per
  * micro-batch, with per-record O(log m) mutation and O(n) boundary
  * walks.
  *
  * The visible-set diff of one change is at most one retract plus one
  * insert (or the -U/+U pair when the same id stays visible), so
  * per-record work is O(n + log m) — never the O(m log m) full re-sort
  * this replaced — and only the affected ids' row payloads need state
  * reads.
  *
  * CPU cost is observable through `comparisons` so a spec can pin the
  * asymptotics (no full re-sort hiding inside).
  */
final class TopNIndex[S](n: Int, ord: Ordering[S]) {

  /** Ordering comparisons performed — the spec's cost probe. */
  var comparisons: Long = 0L

  private val countingOrd: Ordering[S] = (a: S, b: S) => {
    comparisons += 1
    ord.compare(a, b)
  }
  private val entryOrd: Ordering[(S, Long)] =
    Ordering.Tuple2(countingOrd, Ordering.Long)

  private val tree = mutable.TreeSet.empty[(S, Long)](entryOrd)
  private val byId = mutable.HashMap.empty[Long, S]

  import TopNIndex.Vis

  /** Mirror the persisted index (id → sortKey) — once per micro-batch. */
  def load(entries: Iterator[(Long, S)]): Unit =
    entries.foreach { case (id, s) => byId(id) = s; tree += ((s, id)) }

  def sortOf(id: Long): Option[S] = byId.get(id)
  def size: Int = byId.size

  /** Whether `id` ranks within the visible top-n — O(n) walk. */
  def isVisible(id: Long): Boolean =
    byId.contains(id) && tree.iterator.take(n).exists(_._2 == id)

  private def topIds(): Vector[(Long, S)] =
    tree.iterator.take(n).map { case (s, id) => (id, s) }.toVector

  /** Apply one change (upsert or delete of `id`) and return the visible
    * top-n diff in emit order: retracts first, then the update pair,
    * then inserts (the reference's emit order).
    */
  def apply(delete: Boolean, id: Long, s: S): Seq[Vis[S]] = {
    val before = topIds()
    if (delete) byId.remove(id).foreach(old => tree -= ((old, id)))
    else {
      byId.get(id).foreach(old => tree -= ((old, id)))
      byId(id) = s
      tree += ((s, id))
    }
    val after = topIds()
    val beforeM = before.toMap
    val afterM = after.toMap
    val out = Seq.newBuilder[Vis[S]]
    before.foreach { case (bid, bs) =>
      if (!afterM.contains(bid)) out += Vis(bid, Some(bs), None)
    }
    before.foreach { case (bid, bs) =>
      afterM.get(bid).foreach(as => if (as != bs) out += Vis(bid, Some(bs), Some(as)))
    }
    after.foreach { case (aid, as) =>
      if (!beforeM.contains(aid)) out += Vis(aid, None, Some(as))
    }
    out.result()
  }
}

object TopNIndex {
  /** One visible-set change: `oldSort` present alone = retract (-D);
    * `newSort` alone = insert (+I); both = the same id stayed visible
    * with a new sort key (-U/+U pair).
    */
  final case class Vis[S](id: Long, oldSort: Option[S], newSort: Option[S])
}
