package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}

/** Lookup join — the reference's per-row point lookup against an external
  * table (StreamExecLookupJoin.java:79; runtime LookupJoinRunner.java:35,
  * AsyncLookupJoinRunner.java:47, RetryableLookupFunctionDelegator.java;
  * UDF surface LookupFunction / AsyncLookupFunction in
  * flink-table-common).
  *
  * Spark-first shape: `mapPartitions` with one connection per partition
  * and a per-partition LRU cache — the scalable pattern for dimension
  * lookups that are too large or too volatile to broadcast. (When the dim
  * table IS small and static, broadcast join is the right plan and needs
  * nothing from this file.)
  */
object LookupJoin {

  /** User-implemented point-lookup — `open` runs once per partition
    * (connection setup), `lookup` per distinct key (after cache).
    */
  trait LookupFunction[K, V] extends Serializable {
    def open(): Unit = {}
    def lookup(key: K): Option[V]
    def close(): Unit = {}
  }

  /** Clock the cache's TTL is measured on (DefaultLookupCache.java:64,129
    * in flink-table-common — the reference likewise injects a Guava Ticker
    * so expiry is testable without wall-clock sleeps). Production uses
    * [[SystemTicker]]; the differential fuzz injects a [[RowTicker]] so
    * every expiry decision is a pure function of the row sequence.
    */
  trait Ticker extends Serializable {
    /** Advanced once per input row, before its lookup. */
    def advance(): Unit = ()
    def now(): Long
  }

  /** Wall-clock nanos — the production TTL clock. */
  object SystemTicker extends Ticker {
    def now(): Long = System.nanoTime()
  }

  /** Deterministic per-partition logical clock: tick = rows processed so
    * far in this partition (first row = tick 0). Shared by the fuzz's
    * versioned store so served-stale values are exactly restatable.
    */
  final class RowTicker extends Ticker {
    private var t = -1L
    override def advance(): Unit = t += 1
    def now(): Long = t
  }

  /** Retry wrapper (RetryableLookupFunctionDelegator parity): retry a
    * miss/failure up to `maxRetries` times — for lookups against eventually
    * -consistent stores.
    */
  def withRetry[K, V](fn: LookupFunction[K, V], maxRetries: Int): LookupFunction[K, V] =
    new LookupFunction[K, V] {
      override def open(): Unit = fn.open()
      override def close(): Unit = fn.close()
      override def lookup(key: K): Option[V] = {
        var attempt = 0
        var res: Option[V] = None
        while (res.isEmpty && attempt <= maxRetries) {
          res = try fn.lookup(key) catch { case _: Exception => None }
          attempt += 1
        }
        res
      }
    }

  private final class Entry[V](var write: Long, var access: Long,
      var v: Option[V])

  /** Bulk loader for the FULL-cache mode (the reference's CacheLoader,
    * flink-table-runtime .../lookup/fullcache/CacheLoader.java): loads
    * the entire dimension relation; per-row lookups never touch the
    * backend.
    */
  trait AllLoader[K, V] extends Serializable {
    def loadAll(): Map[K, V]
  }

  /** FULL-cache lookup join — the reference's ALL cache mode
    * (LookupFullCache.java:39 + PeriodicCacheReloadTrigger.java:43): the
    * whole dimension loads per partition on the first row and RELOADS
    * whenever `ticker` crosses a `reloadEvery` boundary (a wall-clock
    * period in production; the fuzz's row ticker makes every reload
    * tick — and therefore every served snapshot — a pure function of
    * the row sequence). Between reloads each row is served from the
    * snapshot: misses stay misses and values stay stale until the next
    * reload, the documented ALL-cache contract. One snapshot per
    * partition is the reference's own replication unit (one per task);
    * for a static dim that fits in memory a broadcast join is the right
    * plan — this operator exists for the periodic-refresh case.
    */
  def lookupJoinFullCache[T, K, V](ds: Dataset[T], keyFn: T => K,
      loader: AllLoader[K, V], reloadEvery: Long = Long.MaxValue,
      ticker: Ticker = SystemTicker)(
      implicit outEnc: Encoder[(T, Option[V])]): Dataset[(T, Option[V])] = {
    // fail on the driver: 0 would divide-by-zero per row inside the
    // executor, negative values produce nonsense epochs
    require(reloadEvery > 0,
      s"reloadEvery must be positive (ticker units), got $reloadEvery")
    ds.mapPartitions { rows =>
      var snapshot: Map[K, V] = null
      var epoch = -1L
      rows.map { row =>
        ticker.advance()
        val e =
          if (reloadEvery == Long.MaxValue) 0L
          else ticker.now() / reloadEvery
        if (snapshot == null || e != epoch) {
          snapshot = loader.loadAll()
          epoch = e
        }
        (row, snapshot.get(keyFn(row)))
      }
    }
  }

  /** Left lookup join: each row keeps its lookup result (None for a miss).
    * One `open()` per partition; an LRU cache bounds lookups per partition.
    *
    * TTLs mirror the reference's DefaultLookupCache (flink-table-common
    * DefaultLookupCache.java:55-56, 119-123): `expireAfterWrite` serves a
    * cached — possibly STALE — value until its write is `ttl` old, then
    * re-looks-up; `expireAfterAccess` resets the timer on every served
    * hit. Both are in RAW TICKER UNITS — NANOSECONDS under the default
    * [[SystemTicker]] (use `java.time.Duration.toNanos`, as the
    * reference's Duration-typed DefaultLookupCache builder converts
    * internally), row ticks under the fuzz's [[RowTicker]]. Each
    * partition has its own cache and clock — at scale there is no
    * cross-executor coordination to become a bottleneck, and staleness is
    * bounded per partition exactly as the reference bounds it per task.
    */
  def lookupJoin[T, K, V](ds: Dataset[T], keyFn: T => K,
      fn: LookupFunction[K, V], cacheSize: Int = 10000,
      expireAfterWrite: Long = Long.MaxValue,
      expireAfterAccess: Long = Long.MaxValue,
      ticker: Ticker = SystemTicker)(
      implicit outEnc: Encoder[(T, Option[V])]): Dataset[(T, Option[V])] = {
    val hasTtl =
      expireAfterWrite != Long.MaxValue || expireAfterAccess != Long.MaxValue
    ds.mapPartitions { rows =>
      fn.open()
      val cache = new java.util.LinkedHashMap[K, Entry[V]](16, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[K, Entry[V]]): Boolean =
          size() > cacheSize
      }
      val it = rows.map { row =>
        if (hasTtl) ticker.advance()
        val k = keyFn(row)
        val cached = cache.get(k)
        val now = if (hasTtl) ticker.now() else 0L
        val expired = cached != null && hasTtl &&
          (now - cached.write >= expireAfterWrite ||
            now - cached.access >= expireAfterAccess)
        val v = if (cached != null && !expired) {
          cached.access = now
          cached.v
        } else {
          val r = fn.lookup(k)
          cache.put(k, new Entry(now, now, r))
          r
        }
        (row, v)
      }
      // close() ONCE after the iterator drains (repeated hasNext calls
      // on an exhausted iterator must not re-invoke close)
      new Iterator[(T, Option[V])] {
        private var closed = false
        def hasNext: Boolean = {
          val h = it.hasNext
          if (!h && !closed) { closed = true; fn.close() }
          h
        }
        def next(): (T, Option[V]) = it.next()
      }
    }
  }
}
