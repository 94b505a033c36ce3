package graft.operators

import org.apache.spark.storage.StorageLevel

import graft.SparkSuite

/** CacheOnce lifecycle: release is scoped to the action that actually
  * consumes the cached plans — unrelated actions on the shared session
  * must not evict them, and an unconsumed lease is explicitly releasable.
  */
class CacheOnceSpec extends SparkSuite {
  import spark.implicits._

  /** Counts query-completion events; registered AFTER a CacheOnce lease,
    * so once it has seen an action's event, CacheOnce's listener (earlier
    * in bus order) has processed that same event too.
    */
  private class Probe extends org.apache.spark.sql.util.QueryExecutionListener {
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    override def onSuccess(f: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        d: Long): Unit = seen.incrementAndGet()
    override def onFailure(f: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        e: Exception): Unit = seen.incrementAndGet()
  }

  private def awaitEvents(p: Probe, n: Int): Unit = {
    val deadline = System.nanoTime() + 15e9.toLong
    while (p.seen.get() < n && System.nanoTime() < deadline) Thread.sleep(50)
    assert(p.seen.get() >= n, s"listener bus did not deliver $n events")
  }

  test("an unrelated action does not release; the consuming action does") {
    val cached = (1 to 100).toDF("v").filter($"v" % 2 === 0)
    val lease = CacheOnce.untilConsumed(cached)
    val probe = new Probe
    spark.listenerManager.register(probe)
    val consumer = cached.groupBy(($"v" % 10).as("k")).count()

    // unrelated query on the same session — caches must survive it
    assert((201 to 300).toDF("x").count() == 100)
    awaitEvents(probe, 1)
    assert(lease.active, "unrelated action released the caches")
    assert(cached.storageLevel != StorageLevel.NONE)

    // the consuming action (plan contains the cached subtree) releases
    assert(consumer.count() == 5)
    val deadline = System.nanoTime() + 15e9.toLong
    while (lease.active && System.nanoTime() < deadline) Thread.sleep(50)
    assert(!lease.active, "consuming action did not release")
    assert(cached.storageLevel == StorageLevel.NONE)
    spark.listenerManager.unregister(probe)
  }

  test("failed consuming action also releases") {
    val cached = (1 to 10).toDF("v")
    val lease = CacheOnce.untilConsumed(cached)
    val boom = org.apache.spark.sql.functions.udf((i: Int) =>
      if (i > 5) throw new RuntimeException("boom") else i)
    intercept[Exception] { cached.select(boom($"v")).collect() }
    val deadline = System.nanoTime() + 15e9.toLong
    while (lease.active && System.nanoTime() < deadline) Thread.sleep(50)
    assert(!lease.active)
    assert(cached.storageLevel == StorageLevel.NONE)
  }

  test("an unconsumed lease is explicitly releasable (no listener leak)") {
    val cached = (1 to 10).toDF("v")
    val lease = CacheOnce.untilConsumed(cached)
    assert(lease.active && cached.storageLevel != StorageLevel.NONE)
    lease.release() // caller never ran an action — explicit cleanup
    assert(!lease.active)
    assert(cached.storageLevel == StorageLevel.NONE)
    lease.release() // idempotent
    // and the listener really is gone: a consuming action later must not
    // try to double-release (would throw if the listener were leaked and
    // unpersist raced) — just assert it completes
    assert(cached.count() == 10)
  }
}
