package graft.queries

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AsyncOps, LookupJoin}

/** Seeded random generator for LOOKUP-JOIN differential cases — fuzzes
  * [[graft.operators.LookupJoin]] (the reference's LookupJoinRunner +
  * RetryableLookupFunctionDelegator: per-row point lookups with an LRU
  * cache and a retry wrapper) and the async route
  * ([[graft.operators.AsyncOps]] ordered/unordered + AsyncRetryStrategies)
  * with shapes the fixed `q_join_lookup` / `q_async_lookup` rows can't
  * enumerate.
  *
  * The external store is a DETERMINISTIC fake with three key classes,
  * modeling the failure taxonomy a real dimension service has:
  *   - clean miss: keys outside the dim predicate return None (no
  *     retry on the async route; the sync wrapper burns its attempts —
  *     both end at None);
  *   - transient: keys with `k % failMod <= maxRetries` throw on their
  *     first `k % failMod` calls and succeed forever after (sticky
  *     success) — the retry ladder must recover the value;
  *   - permanent: keys with `k % failMod > maxRetries` throw on every
  *     call — every ladder exhausts to a miss.
  * Outcomes are pure functions of the key, so cache hits, evictions
  * (cacheSize down to 1), partitioning, and async completion order
  * cannot change the result — which is exactly what the differential
  * asserts, against a one-line CASE restatement in both engines.
  */
object LookupFuzzGen {

  case class Case(
      seed: Long,
      filterSql: String,
      keyMod: Int,
      dimMod: Int,
      dimRes: Int,
      failMod: Int,
      maxRetries: Int,
      cacheSize: Int) {

    def oracleSql: String =
      s"""WITH e AS (SELECT event_id, user_id,
         |    make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type, value
         |  FROM events),
         |p AS (SELECT event_id, user_id % $keyMod AS k
         |  FROM e WHERE $filterSql)
         |SELECT event_id, k,
         |  CASE WHEN k % $dimMod <> $dimRes AND k % $failMod <= $maxRetries
         |       THEN k * 31 + 7 ELSE -1 END AS v
         |FROM p""".stripMargin
  }

  /** The case for a seed — a pure function of the seed. */
  def gen(seed: Long): Case = {
    val r = new Random(StreamFuzzGen.scramble(seed ^ 0x100c09L))
    val filterSql = StreamFuzzGen.basePredOf(r)
    val keyMod = Seq(5, 11, 101)(r.nextInt(3))
    val dimMod = 2 + r.nextInt(5)
    val dimRes = r.nextInt(dimMod)
    val failMod = 1 + r.nextInt(6)
    val maxRetries = r.nextInt(3)
    val cacheSize = Seq(1, 4, 10000)(r.nextInt(3))
    Case(seed, filterSql, keyMod, dimMod, dimRes, failMod, maxRetries,
      cacheSize)
  }

  /** The deterministic fake store (see object scaladoc). Per-key call
    * counters are per-instance (one per partition after closure
    * deserialization on the sync route; shared across a partition's
    * concurrent ladders on the async route, hence the atomics).
    */
  private class FakeStore(c: Case)
      extends LookupJoin.LookupFunction[Long, Long] {
    @transient private lazy val calls =
      new java.util.concurrent.ConcurrentHashMap[Long,
        java.util.concurrent.atomic.AtomicInteger]()
    override def lookup(k: Long): Option[Long] = {
      if (k % c.dimMod == c.dimRes) return None // clean miss
      val fails = k % c.failMod
      if (fails > c.maxRetries) // permanent failure class
        throw new RuntimeException(s"store unavailable for $k")
      val n = calls.computeIfAbsent(k,
        _ => new java.util.concurrent.atomic.AtomicInteger(0))
        .incrementAndGet()
      if (n <= fails) throw new RuntimeException(s"transient $k #$n")
      Some(k * 31 + 7)
    }
  }

  private def probes(s: SparkSession, dir: String, c: Case) = {
    import s.implicits._
    Q.t(s, dir, "events")
      .filter(expr(c.filterSql))
      .select(col("event_id"), (col("user_id") % c.keyMod).as("k"))
      .as[(Long, Long)]
  }

  /** Sync route: [[LookupJoin.lookupJoin]] with the LRU cache and the
    * miss-retry wrapper ([[LookupJoin.withRetry]] — retries both thrown
    * failures and empty results up to maxRetries).
    */
  def replay(s: SparkSession, dir: String, c: Case): DataFrame = {
    import s.implicits._
    val fn = LookupJoin.withRetry(new FakeStore(c), c.maxRetries)
    LookupJoin.lookupJoin[(Long, Long), Long, Long](
        probes(s, dir, c), _._2, fn, cacheSize = c.cacheSize)
      .map { case ((id, k), v) => (id, k, v.getOrElse(-1L)) }
      .toDF("event_id", "k", "v")
  }

  /** Async route: the same store through [[AsyncOps.withRetry]] (attempt
    * ladder per invocation, 1 ms fixed delay) under ordered or unordered
    * emission; an exhausted ladder recovers to the miss sentinel instead
    * of failing the task — the reference's timeout/side-output choice
    * restated as a recover.
    */
  def replayAsync(s: SparkSession, dir: String, c: Case,
      ordered: Boolean): DataFrame = {
    import s.implicits._
    val store = new FakeStore(c)
    val base = new AsyncOps.AsyncFunction[(Long, Long), (Long, Long, Long)] {
      def invoke(in: (Long, Long))(
          implicit ec: scala.concurrent.ExecutionContext)
          : scala.concurrent.Future[(Long, Long, Long)] =
        scala.concurrent.Future {
          (in._1, in._2, store.lookup(in._2).getOrElse(-1L))
        }
    }
    val retried = AsyncOps.withRetry(base,
      AsyncOps.RetryStrategy.fixedDelay(c.maxRetries + 1, 1L))
    val recovered =
      new AsyncOps.AsyncFunction[(Long, Long), (Long, Long, Long)] {
        def invoke(in: (Long, Long))(
            implicit ec: scala.concurrent.ExecutionContext)
            : scala.concurrent.Future[(Long, Long, Long)] =
          retried.invoke(in).recover { case _ => (in._1, in._2, -1L) }
      }
    val ds = probes(s, dir, c)
    (if (ordered) AsyncOps.orderedAsync(ds, recovered, capacity = 4)
     else AsyncOps.unorderedAsync(ds, recovered, capacity = 4))
      .toDF("event_id", "k", "v")
  }
}
