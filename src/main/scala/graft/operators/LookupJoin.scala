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

  /** Left lookup join: each row keeps its lookup result (None for a miss).
    * One `open()` per partition; an LRU cache bounds lookups per partition.
    */
  def lookupJoin[T, K, V](ds: Dataset[T], keyFn: T => K,
      fn: LookupFunction[K, V], cacheSize: Int = 10000)(
      implicit outEnc: Encoder[(T, Option[V])]): Dataset[(T, Option[V])] = {
    ds.mapPartitions { rows =>
      fn.open()
      val cache = new java.util.LinkedHashMap[K, Option[V]](16, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[K, Option[V]]): Boolean =
          size() > cacheSize
      }
      val it = rows.map { row =>
        val k = keyFn(row)
        val cached = cache.get(k)
        val v = if (cached != null) cached
        else {
          val r = fn.lookup(k)
          cache.put(k, r)
          r
        }
        (row, v)
      }
      // close() after the iterator drains
      new Iterator[(T, Option[V])] {
        def hasNext: Boolean = {
          val h = it.hasNext
          if (!h) fn.close()
          h
        }
        def next(): (T, Option[V]) = it.next()
      }
    }
  }
}
