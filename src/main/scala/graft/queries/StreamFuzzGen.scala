package graft.queries

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seeded random generator for STREAMING differential cases — the
  * streaming-side sibling of [[FuzzGen]] (which fuzzes the batch SQL
  * surface). Each seed deterministically yields a windowed event-time
  * aggregation over the `events` table: a shared filter, tumbling or
  * hopping window, grouping keys, and exact aggregates.
  *
  * The same case drives three executions:
  *   - STREAMING: MemoryStream replay → watermark → window aggregate in
  *     append mode (the incremental, state-store-backed path);
  *   - BATCH: the identical transform on the batch DataFrame (Spark's
  *     one-shot path — `window()` works in both);
  *   - ORACLE: a DuckDB restatement (time_bucket / UNNEST-of-starts)
  *     for promoted permanent rows.
  *
  * Divergence between the first two catches incremental-execution bugs
  * (watermark handling, state eviction, window assignment) that no
  * batch-only fuzz can reach; the third ties promoted seeds into the
  * driver's cross-engine gate. Determinism conventions follow the
  * hand-written stream gates: replay is (event-time, id)-sorted so no
  * row is late, money flows as exact DECIMAL(12,2)/cents-BIGINT, and
  * doubles appear only as a final cast of an exact decimal sum.
  *
  * Reference bar: the windowed-aggregation semantics under test are the
  * reference's group-window operators
  * (flink-table-runtime window aggregate operators; SURVEY §2.5).
  */
object StreamFuzzGen {

  /** One generated case. All SQL fragments are dialect-shared: Spark
    * `expr()` accepts them and the oracle embeds the same text.
    */
  case class Case(
      seed: Long,
      filterSql: String,
      keys: Seq[(String, String)], // (shared SQL expr, output alias)
      winMinutes: Int,
      slideMinutes: Int, // == winMinutes for tumbling
      aggs: Seq[(String, String)]) { // (shared SQL agg expr, alias)

    def isHop: Boolean = slideMinutes != winMinutes

    /** The shared transform: filter → event-time window → aggregates.
      * Works on batch and streaming frames alike; the streaming caller
      * adds the watermark BEFORE applying (watermarks survive filters).
      * Output: window_start, keys..., aggs...
      */
    def apply(ev: DataFrame): DataFrame = {
      val win =
        if (isHop) window(col("ts"), s"$winMinutes minutes", s"$slideMinutes minutes")
        else window(col("ts"), s"$winMinutes minutes")
      val keyCols: Seq[Column] = keys.map { case (e, a) => expr(e).as(a) }
      val aggCols: Seq[Column] = aggs.map { case (e, a) => expr(e).as(a) }
      ev.filter(expr(filterSql))
        .groupBy(win.as("__w") +: keyCols: _*)
        .agg(aggCols.head, aggCols.tail: _*)
        .select(col("__w.start").as("window_start") +:
          (keys.map(k => col(k._2)) ++ aggs.map(a => col(a._2))): _*)
    }

    /** DuckDB restatement for promoted permanent rows. Window starts
      * restate as time_bucket (tumble) or an UNNEST over the covering
      * starts (hop — size/slide covering instances per row).
      */
    def oracleSql: String = {
      val keySel = keys.map { case (e, a) => s"$e AS $a" }
      val aggSel = aggs.map { case (e, a) => s"$e AS $a" }
      val groupN = 1 + keys.length
      val groupBy = (1 to groupN).mkString(", ")
      val base = "SELECT event_id, user_id, " +
        "make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type, value " +
        "FROM events"
      if (!isHop) {
        s"""WITH e AS ($base), f AS (SELECT * FROM e WHERE $filterSql)
           |SELECT time_bucket(INTERVAL $winMinutes MINUTE, ts) AS window_start,
           |  ${(keySel ++ aggSel).mkString(",\n  ")}
           |FROM f GROUP BY $groupBy""".stripMargin
      } else {
        val n = winMinutes / slideMinutes
        val starts = (0 until n).map(k =>
          s"time_bucket(INTERVAL $slideMinutes MINUTE, ts) - INTERVAL ${k * slideMinutes} MINUTE")
        s"""WITH e AS ($base), f AS (SELECT * FROM e WHERE $filterSql)
           |SELECT ws AS window_start,
           |  ${(keySel ++ aggSel).mkString(",\n  ")}
           |FROM f, UNNEST([${starts.mkString(",\n  ")}]) AS u(ws)
           |GROUP BY $groupBy""".stripMargin
      }
    }
  }

  private val eventTypes =
    Seq("click", "purchase", "view", "signup", "error")

  private def pick[T](r: Random, xs: Seq[T]): T = xs(r.nextInt(xs.length))

  /** SplitMix64 finalizer: java.util.Random's seed scrambling is one
    * LCG step, so ADJACENT raw seeds produce correlated first draws —
    * with a power-of-two bound (which reads the high bits) seeds 1..30
    * all drew the same filter arm before this mix.
    */
  private def scramble(s: Long): Long = {
    var z = s + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** The case for a seed — a pure function of the seed. */
  def gen(seed: Long): Case = {
    val r = new Random(scramble(seed))

    // filter: always ends with OR user_id = -1 so the replay's
    // watermark-flush sentinel (user_id = -1, far-future ts) survives
    // any predicate; the batch/oracle sides have no such rows, so the
    // clause is semantically inert there. The sentinel's own window
    // never fires (nothing later advances the watermark past it), so it
    // never reaches output on the streaming side either.
    val basePred = r.nextInt(4) match {
      case 0 =>
        val n = 1 + r.nextInt(3)
        val types = r.shuffle(eventTypes).take(n).sorted
        s"event_type IN (${types.map(t => s"'$t'").mkString(", ")})"
      case 1 =>
        val m = 2 + r.nextInt(5)
        s"(user_id % $m) = ${r.nextInt(m)}"
      case 2 =>
        // events.value spans ~0–330 at every SF (same generator
        // distribution); thresholds stay inside it so the arm keeps rows
        s"CAST(value AS DECIMAL(12,2)) >= ${25 + r.nextInt(200)}.00"
      case 3 =>
        val m = 2 + r.nextInt(4)
        s"((user_id % $m) = ${r.nextInt(m)} OR event_type = '${pick(r, eventTypes)}')"
    }
    val filterSql = s"($basePred) OR user_id = -1"

    val keyPool = Seq(
      ("event_type", "k_type"),
      (s"(user_id % ${Seq(3, 5, 7, 11)(r.nextInt(4))})", "k_user"))
    val keys = r.nextInt(3) match {
      case 0 => Seq(keyPool.head)
      case 1 => Seq(keyPool(1))
      case 2 => keyPool
    }

    val (winMin, slideMin) =
      if (r.nextInt(3) == 0) { // hopping, slide = size/2
        val w = Seq(30, 60, 120)(r.nextInt(3))
        (w, w / 2)
      } else {
        val w = Seq(10, 30, 60, 120)(r.nextInt(4))
        (w, w)
      }

    // exact-arithmetic aggregate pool (cents as BIGINT; the one DOUBLE
    // is a final cast of an exact decimal sum)
    val aggPool = Seq(
      ("COUNT(*)", "n"),
      ("CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)", "sum_value"),
      ("CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT)", "sum_cents"),
      ("MIN(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))", "min_cents"),
      ("MAX(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))", "max_cents"),
      ("CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)", "n_purchase"))
    val nAggs = 1 + r.nextInt(3)
    val aggs = r.shuffle(aggPool).take(nAggs).sortBy(_._2)

    Case(seed, filterSql, keys, winMin, slideMin, aggs)
  }
}
