package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Cache lifecycle for consume-once query results: persist intermediates
  * now, release them automatically when an action that actually CONSUMES
  * them completes (success or failure).
  *
  * The dedup/LSH pipeline reuses expensive intermediates (signatures,
  * candidate pairs, candidate shingles) across several branches of one
  * query plan — that wants `persist()` — but the query harness builds a
  * DataFrame and consumes it with exactly one action (Verify's parquet
  * write, Bench's count). A bare `persist()` would pin the blocks for the
  * session lifetime; the listener drops them as soon as the consuming
  * action finishes, so repeated invocations don't accumulate storage.
  *
  * "Consuming" is decided by plan identity: the completed action's
  * analyzed plan must contain one of the cached plans as a subtree
  * (`sameResult`). Unrelated or concurrent actions on the shared session
  * leave the caches alone — releasing on just "the next action anywhere"
  * would silently recompute the whole upstream pipeline once per branch
  * for the real consumer.
  *
  * If no consuming action ever runs, the caller holds the returned
  * [[CacheOnce.Lease]] and can `release()` explicitly; the harness call
  * sites drop the lease because their DataFrame is always consumed.
  */
object CacheOnce {

  /** Handle for one `untilConsumed` registration; `release()` is
    * idempotent and also what the listener itself calls.
    */
  final class Lease private[CacheOnce] (caches: Seq[Dataset[_]]) {
    private val released = new java.util.concurrent.atomic.AtomicBoolean(false)
    @volatile private[CacheOnce] var listener: QueryExecutionListener = _
    /** still registered and holding the cached blocks? */
    def active: Boolean = !released.get()
    def release(): Unit =
      if (released.compareAndSet(false, true)) {
        caches.foreach(_.unpersist(blocking = false))
        caches.head.sparkSession.listenerManager.unregister(listener)
      }
  }

  def untilConsumed(caches: Dataset[_]*): Lease = {
    require(caches.nonEmpty)
    val spark = caches.head.sparkSession
    caches.foreach(_.persist())
    // analyzed (not optimized) plans: the consumer is built from these
    // very Datasets, so its analyzed tree contains them verbatim
    val cachedPlans = caches.map(_.queryExecution.analyzed)
    val lease = new Lease(caches)
    val listener = new QueryExecutionListener {
      private def consumes(qe: QueryExecution): Boolean =
        try qe.analyzed.exists(n => cachedPlans.exists(n.sameResult))
        catch { case _: Exception => false }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = if (consumes(qe)) lease.release()
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = if (consumes(qe)) lease.release()
    }
    lease.listener = listener
    spark.listenerManager.register(listener)
    lease
  }
}
