package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.Q._
import graft.cep.{CEP, Pattern}
import graft.streaming.{AllowedLateness, Changelog, CoGroup, OuterJoin, ProcTimeJoin, ProcessOps, RetractableTopN, SessionWindows, StatefulOps, StreamingRank, TemporalJoin}

/** Streaming oracle parity — driver-visible proof that the stateful
  * streaming operators produce the SAME table a batch query does, through
  * the DuckDB oracle rather than ScalaTest alone.
  *
  * Each query REPLAYS a testdata table through a MemoryStream in several
  * micro-batches, runs the streaming operator under test, accumulates its
  * emitted changelog in a memory sink, and folds that changelog to the
  * end-state table (an order-insensitive multiset reduction: +I/+U count
  * +1, -U/-D count −1; rows with net count 1 survive — equivalent to
  * [[Changelog.materialize]] but needing no emission sequence). The batch
  * oracle never sees the stream: if the operator's incremental state
  * machine is wrong, the fold diverges from the oracle and the row goes
  * red.
  *
  * The driver-side collect feeds the REPLAY HARNESS only (bounded
  * testdata → MemoryStream, the same shape every streaming spec uses);
  * the operator under test runs distributed, keyed state and all. A
  * production job would swap the MemoryStream for a Kafka/file source and
  * drop the fold — the sink IS the changelog consumer there.
  */
object StreamQueries {

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val HdfsProvider =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  /** Split into `n` consecutive chunks (micro-batch boundaries). Each
    * chunk becomes ONE MemoryStream block = one input partition, so
    * per-key arrival order inside a batch follows the chunk's row order.
    */
  private def chunks[T](xs: Seq[T], n: Int): Seq[Seq[T]] = {
    val size = math.max(1, math.ceil(xs.length.toDouble / n).toInt)
    xs.grouped(size).toSeq
  }

  /** Run a streaming Dataset to completion over pre-chunked input,
    * forcing one micro-batch per chunk, and return the sink table
    * (update mode accumulates the changelog; complete mode holds the
    * final state). The per-run checkpoint directory is deleted after the
    * query stops — repeated verify/bench runs must not leak state-store
    * files into the temp dir.
    *
    * `restartAfter = Some(k)` exercises the CHECKPOINT RESUME path (the
    * reference's core exactly-once guarantee — CheckpointCoordinator
    * .java:102 barrier snapshots; Spark's WAL + state-store commit): the
    * query stop()s cleanly after k batches and a NEW query start()s from
    * the same checkpoint — state stores restore, the persisted watermark
    * reloads, and the remaining batches replay through the resumed
    * state. `restartBoundaries` generalizes to SEVERAL stop/restart
    * cycles per replay (recovery from an already-recovered checkpoint —
    * snapshot-plus-changelog restore stacking). The pre-restart sink
    * emissions (all committed — each feed runs processAllAvailable
    * before the stop) accumulate with every later leg's, so a caller's
    * changelog fold sees the complete emission history exactly as an
    * external sink would have.
    */
  private[queries] def runToEnd[T](s: SparkSession, input: MemoryStream[T],
      out: DataFrame, batches: Seq[Seq[T]],
      mode: String = "update", rocks: Boolean = false,
      restartAfter: Option[Int] = None,
      restartBoundaries: Seq[Int] = Nil,
      foreachSink: Option[(DataFrame, Long) => Unit] = None,
      shufflePartitions: Int = 2): DataFrame = {
    val ckpt = java.nio.file.Files.createTempDirectory("qstream_ckpt")
    def freshName() =
      s"qstream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    // clamp to [1, n-1] and dedup: at least one batch per leg. A
    // single-batch replay has no interior boundary to stop at, so the
    // restart request degenerates to the straight-through arm.
    val bounds =
      if (batches.length < 2) Nil
      else (restartAfter.toSeq ++ restartBoundaries)
        .map(k => math.min(math.max(1, k), batches.length - 1))
        .distinct.sorted
    // the restart arm substitutes its own buffering sink; a caller
    // combining the two features would silently lose its sink otherwise
    require(bounds.isEmpty || foreachSink.isEmpty,
      "restart boundaries and foreachSink cannot combine")
    if (bounds.nonEmpty) {
      // The memory sink refuses checkpoint recovery (it is not
      // fault-tolerant), so the restart arm writes through foreachBatch
      // with a batchId-IDEMPOTENT buffer — the exact contract a
      // transactional production sink implements for exactly-once: if
      // recovery ever re-delivers a committed batch, the dedup absorbs
      // it; a LOST batch still surfaces as missing rows in the
      // differential.
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[
        org.apache.spark.sql.Row]()
      val seen = java.util.concurrent.ConcurrentHashMap
        .newKeySet[java.lang.Long]()
      val sinkFn: (DataFrame, Long) => Unit = (df, batchId) =>
        if (seen.add(batchId)) df.collect().foreach(buf.add)
      // legs: batch index ranges split at the boundaries
      val cuts = 0 +: bounds :+ batches.length
      try cuts.sliding(2).foreach { case Seq(from, to) =>
        if (to > from) {
          val q = startReplayQuery(s, out, freshName(), ckpt.toString, mode,
            rocks, foreachBatch = Some(sinkFn),
            shufflePartitions = shufflePartitions)
          try batches.slice(from, to).foreach { b =>
            input.addData(b); q.processAllAvailable()
          }
          finally q.stop()
        }
      }
      finally Q.deleteRecursively(ckpt) // every leg: no ckpt leak on failure
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](buf), out.schema)
    } else {
      val name = freshName()
      val q = startReplayQuery(s, out, name, ckpt.toString, mode, rocks,
        foreachBatch = foreachSink, shufflePartitions = shufflePartitions)
      try batches.foreach { b => input.addData(b); q.processAllAvailable() }
      finally {
        q.stop()
        Q.deleteRecursively(ckpt) // best-effort cleanup
      }
      // with a caller-provided foreachBatch sink (blackhole-count scale
      // probes) nothing accumulates driver-side; the caller reads its
      // own sink state
      if (foreachSink.isDefined) s.emptyDataFrame else s.table(name)
    }
  }

  /** Start one replay query against `ckpt` with the harness's pinned
    * per-query conf (see body comments). Shared by the straight-through
    * (memory sink) and the stop/restart (foreachBatch — the memory sink
    * can't recover a checkpoint) arms of [[runToEnd]].
    */
  private def startReplayQuery(s: SparkSession, out: DataFrame, name: String,
      ckpt: String, mode: String, rocks: Boolean,
      foreachBatch: Option[(DataFrame, Long) => Unit] = None,
      shufflePartitions: Int = 2)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(foreachBatch.isEmpty || mode != "complete",
      "restart arm buffers per-batch emissions; complete mode would " +
        "accumulate one full table per batch")
    // The replay's state fits a handful of partitions; a wide session
    // default (32 on the bench box) only multiplies per-micro-batch task
    // and state-store open/close overhead. The partition count binds at
    // query start, so the override applies to this stream only and the
    // session default is restored for the batch queries that follow.
    // State-store provider is pinned PER QUERY for the same reason:
    // transformWithState requires RocksDB, but every other operator runs
    // on the in-memory HDFSBacked store, which commits far cheaper at
    // replay state sizes — and a leaked session-level RocksDB setting
    // must not tax the queries that don't need it.
    val trackConf =
      "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows"
    // The session conf binds at query START, so the overrides are
    // pinned only across the start() call. The whole set→start→restore
    // window holds Q.streamConfLock: Bench can overlap independent
    // replay gates (SPARK_GRAFT_STREAM_THREADS — serial by default, see
    // the measured tradeoff in Bench.scala), and an unlocked window
    // would let one gate capture another's temporary values as its
    // "previous" state (worst case: a transformWithState gate starting
    // on the HDFS provider and failing). Starts serialize; the long
    // part — the micro-batch replay below — can overlap safely.
    Q.streamConfLock.synchronized {
      val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
      val prevProvider =
        s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      val prevTrack = s.conf.getOption(trackConf)
      def restore(key: String, prev: Option[String]): Unit = prev match {
        case Some(p) => s.conf.set(key, p)
        case None    => s.conf.unset(key)
      }
      // default cap 2: replay state fits a handful of partitions and a
      // wider store only multiplies open/close overhead. The sharded
      // scale probes RAISE this — at 64x key breadth the 2-partition
      // store is the bottleneck and sharding is the production lever.
      val effectiveShards = math.min(prevShuffle.toInt, shufflePartitions)
      // a clamped shard request must be self-describing: a sharded probe
      // recorded on a narrow host would otherwise carry its 8-shard
      // label over an under-sharded measurement
      if (effectiveShards < shufflePartitions)
        System.err.println(s"[runToEnd] requested $shufflePartitions " +
          s"shuffle partitions clamped to $effectiveShards " +
          "(session default is narrower)")
      s.conf.set("spark.sql.shuffle.partitions", effectiveShards.toString)
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        if (rocks) RocksProvider else HdfsProvider)
      // replay state is tiny; per-commit row recounts are pure overhead
      s.conf.set(trackConf, "false")
      // changelog checkpointing: commit uploads the batch's delta instead
      // of a full SST snapshot — replay-sized state pays snapshot cost per
      // store per batch otherwise
      val changelogConf =
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
      val prevChangelog = s.conf.getOption(changelogConf)
      s.conf.set(changelogConf, "true")
      try {
        val base = out.writeStream.outputMode(mode)
          .option("checkpointLocation", ckpt)
        foreachBatch match {
          case Some(fn) => base.foreachBatch(fn).start()
          case None => base.format("memory").queryName(name).start()
        }
      }
      finally {
        s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        restore("spark.sql.streaming.stateStore.providerClass", prevProvider)
        restore(trackConf, prevTrack)
        restore(changelogConf, prevChangelog)
      }
    }
  }

  /** Order-insensitive changelog fold to the end state: net count per
    * full row value must be exactly +1 (present) or 0 (retracted away).
    */
  private def foldChangelog(changes: DataFrame, kindCol: String): DataFrame = {
    val valueCols = changes.columns.filterNot(_ == kindCol).toSeq
    changes
      .withColumn("__sign",
        when(col(kindCol) === Changelog.Insert ||
          col(kindCol) === Changelog.UpdateAfter, 1).otherwise(-1))
      .groupBy(valueCols.map(col): _*)
      .agg(sum(col("__sign")).as("__net"))
      .filter(col("__net") === 1)
      .drop("__net")
  }

  case class Ev(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
      event_type: String, value: Double)

  /** Session-annotated event replayed into the session-coGroup phase. */
  case class SessEv(user_id: Long, event_type: String, value: Double,
      window_start: java.sql.Timestamp, window_time: java.sql.Timestamp)

  /** Change row fed to the upsert sink gate (kind renames to __rowkind). */
  case class UpsCh(user_id: Long, event_id: Long, value: Double,
      seq: Long, kind: Byte)

  /** Per-run scratch dir reaped at JVM exit (shared hook — Q.scratchDir). */
  private def tmpDir(prefix: String): String = Q.scratchDir(prefix)

  /** Epoch MICROS of a micros-precision timestamp (getTime carries the
    * millis; getNanos the sub-second — only its sub-milli part is new).
    */
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** events rows sorted by (micro-ts, event_id) — replay in full-precision
    * event-time order, the shape a rowtime source delivers within the
    * watermark (and the exact ORDER BY every oracle uses; a millisecond
    * sort could diverge on same-ms rows whose ids cross micros order).
    *
    * Memoized per sf dir: fifteen replay queries share one collect+sort
    * instead of re-reading the table each (the testdata is immutable for
    * a Verify/Bench JVM's lifetime; a few MB resident).
    */
  private val sortedEventsCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Ev]]()
  private def sortedEvents(s: SparkSession, dir: String): Seq[Ev] =
    sortedEventsCache.computeIfAbsent(dir, { d =>
      import s.implicits._
      t(s, d, "events")
        .select($"event_id", $"user_id", $"ts".cast("timestamp").as("ts"),
          $"event_type", $"value")
        .as[Ev].collect().toSeq.sortBy(e => (micros(e.ts), e.event_id))
    })

  /** MemoryStream replay for a [[StreamFuzzGen.Case]]: (event-time,
    * id)-sorted events stream through the case's filter → watermark →
    * window aggregate in append mode; a far-future sentinel (user_id
    * = -1 — every generated filter keeps it by construction) advances
    * the watermark past the last real window so the tail flushes. The
    * sentinel's own window never fires, so it leaves no output trace.
    */
  private[queries] def streamFuzzReplay(s: SparkSession, dir: String,
      c: StreamFuzzGen.Case, restartAfter: Option[Int] = None): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = sortedEvents(s, dir)
    val sentinel = Ev(-1L, -1L,
      new java.sql.Timestamp(rows.last.ts.getTime + 10L * 86400000L),
      "click", 0.0)
    val input = MemoryStream[Ev]
    val out = c(input.toDS().toDF().withWatermark("ts", "1 second"))
    runToEnd(s, input, out, chunks(rows, 3) :+ Seq(sentinel),
      mode = "append", rocks = false, restartAfter = restartAfter)
      .select(col("window_start").cast("timestamp_ntz").as("window_start") +:
        (c.keys.map(k => col(k._2)) ++ c.aggs.map(a => col(a._2))): _*)
  }

  /** MemoryStream replay for a [[StreamFuzzGen.DedupCase]]: filtered
    * events replay (ts, event_id)-sorted as TtlIn(key, ts, id) through
    * the case's dedup processor. keep-first emits insert-only firsts;
    * keep-last's -U/+U changelog folds to the final row per key;
    * first_ttl runs on event time with a far-future sentinel key (its
    * own key text, disjoint from every real CAST result) flushing the
    * cleanup timers — its id is negative and drops from the output.
    */
  private[queries] def streamDedupFuzzReplay(s: SparkSession, dir: String,
      c: StreamFuzzGen.DedupCase): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    implicit val ttlEnc = Encoders.product[StatefulOps.TtlIn]
    val rows = t(s, dir, "events")
      .filter(expr(c.filterSql))
      .select(expr(s"CAST(${c.keySql} AS STRING)").as("k"),
        col("ts").cast("timestamp").as("ts"), col("event_id"))
      .as[(String, java.sql.Timestamp, Long)].collect().toSeq
      .sortBy(t => (micros(t._2), t._3))
      .map { case (k, ts, id) => StatefulOps.TtlIn(k, ts, id) }
    val input = MemoryStream[StatefulOps.TtlIn]
    c.mode match {
      case "first" =>
        val out = input.toDS().groupByKey(_.key)
          .transformWithState(
            new StatefulOps.KeepFirstProcessor[String, StatefulOps.TtlIn](
              ttlEnc),
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
        runToEnd(s, input, out.toDF(), chunks(rows, 2), rocks = true)
          .select($"key".as("k"), $"id")
      case "last" =>
        val changes = input.toDS().groupByKey(_.key)
          .transformWithState(
            new StatefulOps.KeepLastProcessor[String, StatefulOps.TtlIn](
              ttlEnc),
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
        val sink = runToEnd(s, input, changes.toDF(), chunks(rows, 2),
          rocks = true)
        foldChangelog(sink.select($"kind", $"key".as("k"),
          $"value.id".as("id")), "kind")
      case "first_ttl" =>
        val sentinel = StatefulOps.TtlIn("\u0000flush",
          new java.sql.Timestamp(rows.last.ts.getTime + 10L * 86400000L),
          -1L)
        val out = input.toDS().withWatermark("ts", "1 second")
          .as[StatefulOps.TtlIn]
          .groupByKey(_.key)
          .transformWithState(
            new StatefulOps.KeepFirstTtlProcessor(c.ttlMinutes * 60000L),
            org.apache.spark.sql.streaming.TimeMode.EventTime(),
            org.apache.spark.sql.streaming.OutputMode.Append())
        runToEnd(s, input, out.toDF(), chunks(rows, 2) :+ Seq(sentinel),
          mode = "append", rocks = true)
          .filter($"id" >= 0)
          .select($"key".as("k"), $"id")
    }
  }

  /** MemoryStream replay for a [[StreamFuzzGen.TopNCase]]: filtered
    * events INSERT (id, sort) per key in two batches, the update-
    * predicate rows UPSERT with sort − delta (rank movement across the
    * visible boundary), the delete-predicate rows remove; the operator's
    * top-n diff changelog folds to the final visible top-n per key.
    */
  private[queries] def streamTopNFuzzReplay(s: SparkSession, dir: String,
      c: StreamFuzzGen.TopNCase,
      restartAfter: Option[Int] = None): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    implicit val chEnc = Encoders.product[RetractableTopN.TopNChange]
    val trips = t(s, dir, "events")
      .filter(expr(c.filterSql))
      .select(expr(s"CAST(${c.keySql} AS STRING)").as("k"),
        col("event_id"), expr(s"CAST(${c.sortSql} AS BIGINT)").as("v"))
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._2)
    val inserts = trips.map { case (k, id, v) =>
      RetractableTopN.TopNChange(Changelog.Insert, k, id, v) }
    val updates = trips.collect {
      case (k, id, v) if id % c.updMod == c.updRes =>
        RetractableTopN.TopNChange(Changelog.UpdateAfter, k, id,
          v - c.updDelta) }
    val deletes = trips.collect {
      case (k, id, v) if id % c.delMod == c.delRes =>
        RetractableTopN.TopNChange(Changelog.Delete, k, id, v) }
    val input = MemoryStream[RetractableTopN.TopNChange]
    val diffs = input.toDS().groupByKey(_.key)
      .transformWithState(
        new RetractableTopN.RetractableTopNProcessor(c.n),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
    val batches = chunks(inserts, 2) ++
      Seq(updates, deletes).filter(_.nonEmpty)
    val sink = runToEnd(s, input, diffs.toDF(), batches, rocks = true,
      restartAfter = restartAfter)
    foldChangelog(sink, "kind")
      .select($"key".as("k"), $"id", $"sort")
  }

  /** Measured scale law for the stateful streaming path — the streaming
    * sibling of [[ScaleProbes]] (batch TPC) and the dedup/ANN probes:
    * the SAME session-window pipeline (SessionWindows.annotate, the
    * heaviest custom transformWithState operator) replays at 1× and 8×
    * event volume. Replicas shift `user_id` (`uid·factor + rep`), so the
    * scale-up grows KEY BREADTH — 8× keys with per-key session history
    * constant, the shape a production stream takes when traffic grows —
    * while the micro-batch count stays fixed (same chunking). The base
    * is the FULL events table (unlike q_stream_session's deterministic
    * third) so that at 8× the per-row/state work dominates the
    * ~2 s/gate micro-batch floor instead of drowning in it; the
    * recorded measurement is the wall-time ratio between the `1` and
    * `8` bench entries, read floor-inclusive. Correctness of the
    * operator itself is gated by `q_stream_session` /
    * `q_fuzz_stream_s*`.
    */
  private def sessionScaleProbe(s: SparkSession, dir: String,
      factor: Int, shards: Int = 2): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = sortedEvents(s, dir)
    val rows =
      if (factor == 1) base
      else base.flatMap(e => (0 until factor).map(rep => e.copy(
        event_id = e.event_id * factor + rep,
        user_id = e.user_id * factor + rep)))
    val maxTs = base.map(_.ts.getTime).max
    val sentinel = Seq(Ev(-1L, -1L,
      new java.sql.Timestamp(maxTs + 3L * 3600000L), "flush", 0.0))
    val input = MemoryStream[Ev]
    val annotated = SessionWindows.annotate(
      input.toDS().toDF().withWatermark("ts", "1 hour"),
      Seq("user_id"), "ts", "1 hour")
    // blackhole-count sink (executor-side count per batch, summed on the
    // driver): the probe measures the OPERATOR's scale law, and a memory
    // sink at 64× was holding 6.4M annotated rows on the driver — sink
    // cost, not operator cost, and super-linear in the recorded curve
    val counter = new java.util.concurrent.atomic.LongAdder
    runToEnd(s, input, annotated, chunks(rows, 2) :+ sentinel, rocks = true,
      foreachSink = Some((df, _) =>
        counter.add(df.filter(col("user_id") >= 0).count())),
      shufflePartitions = shards)
    Seq(counter.sum).toDF("rows")
  }

  /** Bench-only entries (no oracle BY DESIGN — the measurement is the
    * 1×↔8×↔64× wall-time ratio; see [[sessionScaleProbe]]). The 64×
    * point (6.4M events at sf0.1, 64× key breadth through one
    * transformWithState session operator at the same fixed 2-partition
    * replay parallelism) is the streaming sibling of b_tpch18_scale64 —
    * it is SUPPOSED to take minutes; the law it measures is documented
    * in docs/SCALE.md.
    */
  val benchOnly: Map[String, QFn] = Map(
    "b_stream_scale1" -> ((s, dir) => sessionScaleProbe(s, dir, 1)),
    "b_stream_scale8" -> ((s, dir) => sessionScaleProbe(s, dir, 8)),
    "b_stream_scale64" -> ((s, dir) => sessionScaleProbe(s, dir, 64)),
    // the production lever demonstrated: the SAME 64x probe with the
    // state store sharded over 8 partitions instead of 2 — the 64x-keys
    // store stops being the bottleneck and the 1x->64x ratio closes
    // toward linear (measured in docs/SCALE.md)
    "b_stream_scale64_sharded" ->
      ((s, dir) => sessionScaleProbe(s, dir, 64, shards = 8)))

  /** MemoryStream replay for a [[StreamFuzzGen.SessionCase]]: derived
    * key columns → filter → SessionWindows.annotate under the case's
    * gap; a far-future sentinel (user_id = -1, every generated filter
    * keeps it) lands the watermark past max+gap so every real session's
    * timer fires; its own session key is disjoint from all real keys
    * and its row drops on `event_id >= 0`.
    */
  private[queries] def streamSessionFuzzReplay(s: SparkSession, dir: String,
      c: StreamFuzzGen.SessionCase,
      restartAfter: Option[Int] = None,
      restartBoundaries: Seq[Int] = Nil): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = sortedEvents(s, dir)
    val maxTs = rows.last.ts.getTime
    // wm delay 1h, session timers at max+gap: sentinel at
    // max + gap + 3h puts the watermark ≥ max + gap + 2h — past every
    // real session's close with margin
    val sentinel = Ev(-1L, -1L,
      new java.sql.Timestamp(maxTs + (c.gapMinutes + 180L) * 60000L),
      "flush", 0.0)
    val input = MemoryStream[Ev]
    var df = input.toDS().toDF().withWatermark("ts", "1 hour")
    c.keys.foreach { case (e, a) => df = df.withColumn(a, expr(e)) }
    val annotated = SessionWindows.annotate(
      df.filter(expr(c.filterSql)), c.keys.map(_._2), "ts",
      s"${c.gapMinutes} minutes")
    runToEnd(s, input, annotated, chunks(rows, 2) :+ Seq(sentinel),
      rocks = true, restartAfter = restartAfter,
      restartBoundaries = restartBoundaries)
      .filter(col("event_id") >= 0)
      .select(c.keys.map(k => col(k._2)) ++ Seq(col("event_id"),
        col("window_start").cast("timestamp_ntz").as("window_start"),
        col("window_end").cast("timestamp_ntz").as("window_end")): _*)
  }

  /** MemoryStream replay for a [[StreamFuzzGen.SessionDynCase]]:
    * filtered events aggregate under Spark's built-in
    * `session_window(ts, gapExpr)` with a PER-ROW gap (the reference's
    * SessionWindowTimeGapExtractor / dynamic-gap SESSION TVF), in
    * append mode so only CLOSED sessions emit; a far-future sentinel
    * (user_id = -1, every generated filter keeps it; its key is
    * disjoint and its gap may even be non-positive — Spark drops such
    * rows from the aggregate, the watermark advances regardless) lands
    * the watermark past every real session's end. The sentinel's own
    * session, when it exists, is the only one with a negative id sum.
    */
  private[queries] def streamSessionDynFuzzReplay(s: SparkSession, dir: String,
      c: StreamFuzzGen.SessionDynCase,
      restartAfter: Option[Int] = None): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = sortedEvents(s, dir)
    val maxTs = rows.last.ts.getTime
    // gap draws cap at 161 minutes; +360 puts the watermark (1h delay)
    // past max + gap for every arm with margin
    val sentinel = Ev(-1L, -1L,
      new java.sql.Timestamp(maxTs + 360L * 60000L), "flush", 0.0)
    val input = MemoryStream[Ev]
    val df = input.toDS().toDF().withWatermark("ts", "1 hour")
      .filter(expr(c.filterSql))
      .withColumn("k", expr(s"CAST(${c.keySql} AS STRING)"))
      .withColumn("gap_m", expr(s"CAST((${c.gapSql}) AS INT)"))
    val agg = df
      .groupBy(col("k"),
        // session_window's dynamic gap must be CalendarIntervalType
        session_window(col("ts"), expr("make_interval(0, 0, 0, 0, 0, gap_m, 0)")))
      .agg(count(lit(1)).as("n"),
        sum($"event_id").cast("long").as("sum_id"))
      .select($"k",
        $"session_window.start".cast("timestamp_ntz").as("window_start"),
        $"session_window.end".cast("timestamp_ntz").as("window_end"),
        $"n", $"sum_id")
    runToEnd(s, input, agg, chunks(rows, 2) :+ Seq(sentinel),
      mode = "append", rocks = true, restartAfter = restartAfter)
      .filter($"sum_id" >= 0)
  }

  /** Two-phase replay for a [[StreamFuzzGen.SurgeryCase]] — the seeded
    * savepoint read→rewrite→resume loop (State Processor API shapes,
    * randomized): phase 1 runs the pre-cutoff slice through
    * [[graft.streaming.StateBootstrap.agg]] with a retained checkpoint
    * and stops; the checkpoint's "acc" state reads back offline, ONE
    * key is additionally point-read ([[graft.streaming.StateReader]])
    * and must agree with the bulk read; the seeded rewrite bumps
    * matching keys' cents declaratively; phase 2 bootstraps a fresh
    * query from the rewritten frame and streams the post-cutoff slice
    * (optionally through the restart battery). The argmax fold of the
    * running totals must equal the case's batch restatement.
    */
  private[queries] def streamSurgeryFuzzReplay(s: SparkSession, dir: String,
      c: StreamFuzzGen.SurgeryCase,
      restartAfter: Option[Int] = None): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.streaming.{StateBootstrap, StateReader}
    val trips = t(s, dir, "events").filter(expr(c.filterSql))
      .select(expr(s"CAST(${c.keySql} AS STRING)").as("k"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"),
        // ts arrives TIMESTAMP_NTZ; the session is pinned UTC, so the
        // cast is epoch-identical to the oracle's epoch_us
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"), col("event_id"))
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._4)
    val usAll = trips.map(_._3)
    val cut = usAll.min + (usAll.max - usAll.min) * c.cutNum / c.cutDen
    val hist = trips.collect {
      case (k, ce, us, _) if us < cut => StateBootstrap.BIn(k, ce) }
    val rest = trips.collect {
      case (k, ce, us, _) if us >= cut => StateBootstrap.BIn(k, ce) }
    // phase 1 — same conf contract as q_state_bootstrap: RocksDB for
    // transformWithState, changelog checkpointing off so the offline
    // statestore read sees plain snapshots, checkpoint retained
    val ckpt1 = tmpDir(s"q_fuzz_surgery_${c.seed}") + "/ckpt1"
    val in1 = MemoryStream[StateBootstrap.BIn]
    val out1 = StateBootstrap.agg(in1.toDS(),
      s.emptyDataset(Encoders.product[StateBootstrap.BInit]))
    val q1 = Q.streamConfLock.synchronized {
      val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
      val prevProvider =
        s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      s.conf.set("spark.sql.shuffle.partitions", "2")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try out1.writeStream.format("memory")
        .queryName(s"qsf_${java.util.UUID.randomUUID().toString.replace("-", "")}")
        .outputMode("update")
        .option("checkpointLocation", ckpt1).start()
      finally {
        s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        prevProvider match {
          case Some(p) =>
            s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None =>
            s.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      }
    }
    try chunks(hist, 2).foreach { b => in1.addData(b); q1.processAllAvailable() }
    finally q1.stop()
    val boot = StateBootstrap.readAccState(s, ckpt1)
    // welded point-read: the queryable-state path must agree with the
    // bulk savepoint read for a probe key (smallest, deterministic)
    boot.collect().toSeq.sortBy(_.key).headOption.foreach { pr =>
      val got = StateReader.point(s, ckpt1, "acc", pr.key)
        .select(col("value.n"), col("value.cents")).collect()
      require(got.length == 1 && got(0).getLong(0) == pr.n &&
        got(0).getLong(1) == pr.cents,
        s"state point-read diverged for key ${pr.key}: " +
          s"bulk=(${pr.n},${pr.cents}) point=${got.toSeq}")
    }
    // the seeded rewrite, declarative (one projection over the frame)
    implicit val initEnc = Encoders.product[StateBootstrap.BInit]
    val rewritten = boot.toDF()
      .withColumn("cents",
        when(expr(c.rewritePred("key")), col("cents") + c.rwDelta)
          .otherwise(col("cents")))
      .as[StateBootstrap.BInit]
    val in2 = MemoryStream[StateBootstrap.BIn]
    val out2 = StateBootstrap.agg(in2.toDS(), rewritten)
    val sink = runToEnd(s, in2, out2, chunks(rest, 2), rocks = true,
      restartAfter = restartAfter)
    // n is strictly monotone per key: the final state is the argmax row
    sink.groupBy($"key".as("k"))
      .agg(max(struct($"n", $"cents")).as("m"))
      .select($"k", $"m.n".as("n"), $"m.cents".as("sum_cents"))
  }

  /** MemoryStream replay for a [[StreamFuzzGen.RetractCase]]: every
    * filtered event INSERTs its (key, value), the delete-predicate rows
    * RETRACT in a final batch, and the emitted changelog folds to the
    * end state — which must equal the batch aggregate over surviving
    * rows (the case's DuckDB restatement).
    */
  private[queries] def streamRetractFuzzReplay(s: SparkSession, dir: String,
      c: StreamFuzzGen.RetractCase,
      restartAfter: Option[Int] = None,
      miniBatch: Boolean = false): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    implicit val chEnc = Encoders.product[StatefulOps.Change[String, Long]]
    val trips = t(s, dir, "events")
      .filter(expr(c.filterSql))
      .select(expr(s"CAST(${c.keySql} AS STRING)").as("k"),
        expr(s"CAST(${c.valueSql} AS BIGINT)").as("v"), col("event_id"))
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._3)
    val inserts = trips.map { case (k, v, _) =>
      StatefulOps.Change(Changelog.Insert, k, v) }
    val deletes = trips.collect {
      case (k, v, id) if id % c.deleteMod == c.deleteRes =>
        StatefulOps.Change(Changelog.Delete, k, v) }
    val input = MemoryStream[StatefulOps.Change[String, Long]]
    val batches = chunks(inserts, 2) ++
      (if (deletes.nonEmpty) Seq(deletes) else Nil)
    require(!miniBatch || c.op == "sum",
      "mini-batch emission is a RetractSumProcessor mode; force op=sum")
    c.op match {
      case "sum" =>
        val changes = input.toDS().groupByKey(_.key)
          .transformWithState(
            new StatefulOps.RetractSumProcessor[String, Long](miniBatch),
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
        val sink = runToEnd(s, input, changes.toDF(), batches, rocks = true,
          restartAfter = restartAfter)
        foldChangelog(sink.select($"kind", $"value.key".as("k"),
          $"value.sum".as("agg"), $"value.count".as("n")), "kind")
      case mm =>
        val changes = input.toDS().groupByKey(_.key)
          .transformWithState(
            new StatefulOps.RetractMinMaxProcessor[String, Long](
              isMax = mm == "max"),
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
        val sink = runToEnd(s, input, changes.toDF(), batches, rocks = true,
          restartAfter = restartAfter)
        foldChangelog(sink.select($"kind", $"value.key".as("k"),
          $"value.extreme".as("agg"), $"value.count".as("n")), "kind")
    }
  }

  /** MemoryStream replay for a [[StreamFuzzGen.DistinctCase]]: filtered
    * events INSERT (group, value) pairs keyed by the COMPOSITE
    * (group, value % buckets) shard — the split-distinct shape — the
    * delete-predicate rows RETRACT in a final batch, and the signed
    * fold of [[StatefulOps.SplitDistinctProcessor]]'s shard-count
    * changelog per GROUP (the final-stage SUM) must equal the batch
    * COUNT(DISTINCT) over surviving rows. A group whose distinct set
    * empties folds to 0 and drops, matching the oracle's GROUP BY over
    * survivors.
    */
  private[queries] def streamDistinctFuzzReplay(s: SparkSession, dir: String,
      c: StreamFuzzGen.DistinctCase,
      restartAfter: Option[Int] = None): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val trips = t(s, dir, "events")
      .filter(expr(c.filterSql))
      .select(expr(s"CAST(${c.groupSql} AS STRING)").as("g"),
        expr(s"CAST(${c.valueSql} AS BIGINT)").as("v"), col("event_id"))
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._3)
    def shard(v: Long): Int = math.floorMod(v, c.buckets.toLong).toInt
    val inserts = trips.map { case (g, v, _) =>
      StatefulOps.SplitIn(g, shard(v), v, Changelog.Insert) }
    val deletes = trips.collect {
      case (g, v, id) if id % c.deleteMod == c.deleteRes =>
        StatefulOps.SplitIn(g, shard(v), v, Changelog.Delete) }
    val input = MemoryStream[StatefulOps.SplitIn]
    val out = input.toDS().groupByKey(r => s"${r.group}|${r.bucket}")
      .transformWithState(new StatefulOps.SplitDistinctProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
    val sink = runToEnd(s, input, out.toDF(),
      chunks(inserts, 2) ++ (if (deletes.nonEmpty) Seq(deletes) else Nil),
      rocks = true, restartAfter = restartAfter)
    sink.groupBy($"key".as("g"))
      .agg(sum(when(col("kind") === Changelog.Insert ||
          col("kind") === Changelog.UpdateAfter, $"value")
        .otherwise(-$"value")).as("n_distinct"))
      .filter($"n_distinct" > 0)
  }

  /** Tagged join envelope for [[streamJoinFuzzReplay]] (one MemoryStream
    * carries both sides, the micro-batch two-input pattern).
    */
  case class JEnv(k: String, kind: Byte, isLeft: Boolean, id: Long,
      cents: Long)

  /** MemoryStream replay for a [[StreamFuzzGen.JoinCase]]: the parity
    * split's filtered sides replay as inserts in two batches, then the
    * delete-predicate rows retract (right batch, then left); the join
    * processor's changelog folds to the end state — which must equal the
    * batch join over surviving rows (the case's DuckDB restatement).
    * Outer arms run [[graft.streaming.OuterJoin]] (both sides
    * retractable); semi/anti run [[graft.streaming.SemiAntiJoin]]
    * (append-only left, ±1 right counts).
    */
  private[queries] def streamJoinFuzzReplay(s: SparkSession, dir: String,
      c: StreamFuzzGen.JoinCase,
      restartAfter: Option[Int] = None,
      restartBoundaries: Seq[Int] = Nil): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = t(s, dir, "events")
      .select(expr(s"CAST(${c.keySql} AS STRING)").as("k"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"),
        expr(c.leftFilterSql).as("lf"), expr(c.rightFilterSql).as("rf"))
      // rows failing both side filters never replay — push the subset
      // predicate into the scan instead of shipping them to the driver
      .filter(col("lf") || col("rf"))
      .as[(String, Long, Long, Boolean, Boolean)].collect().toSeq
      .sortBy(_._2)
    val lefts = rows.collect {
      case (k, id, cents, lf, _) if id % 2 == 0 && lf => (k, id, cents) }
    val rights = rows.collect {
      case (k, id, _, _, rf) if id % 2 == 1 && rf => (k, id) }
    if (c.isSemiAnti) {
      import graft.streaming.SemiAntiJoin.{JoinInput, JoinOutput, SemiAntiProcessor}
      implicit val outEnc = Encoders.product[JoinOutput]
      val inserts = (lefts.map { case (k, id, _) =>
          (id, JoinInput(k, isLeft = true, id, 1)) } ++
        rights.map { case (k, id) =>
          (id, JoinInput(k, isLeft = false, id, 1)) })
        .sortBy(_._1).map(_._2)
      val deletes = rights.collect {
        case (k, id) if id % c.rDelMod == c.rDelRes =>
          JoinInput(k, isLeft = false, id, -1) }
      val input = MemoryStream[JoinInput]
      val out = input.toDS().groupByKey(_.key)
        .transformWithState(new SemiAntiProcessor(c.joinType == "semi"),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
      val sink = runToEnd(s, input, out.toDF(),
        chunks(inserts, 2) ++ Seq(deletes).filter(_.nonEmpty), rocks = true,
        restartAfter = restartAfter, restartBoundaries = restartBoundaries)
      foldChangelog(sink, "kind")
        .select($"key".as("k"), $"id".as("l_id"))
    } else {
      val inserts = (lefts.map { case (k, id, cents) =>
          JEnv(k, Changelog.Insert, isLeft = true, id, cents) } ++
        rights.map { case (k, id) =>
          JEnv(k, Changelog.Insert, isLeft = false, id, 0L) })
        .sortBy(_.id)
      val lDel = lefts.collect {
        case (k, id, cents) if id % c.lDelMod == c.lDelRes =>
          JEnv(k, Changelog.Delete, isLeft = true, id, cents) }
      val rDel = rights.collect {
        case (k, id) if id % c.rDelMod == c.rDelRes =>
          JEnv(k, Changelog.Delete, isLeft = false, id, 0L) }
      val jt = c.joinType match {
        case "inner" => OuterJoin.Inner
        case "left" => OuterJoin.LeftOuter
        case "right" => OuterJoin.RightOuter
        case "full" => OuterJoin.FullOuter
      }
      val input = MemoryStream[JEnv]
      val ds = input.toDS()
      val left = ds.filter(_.isLeft).map(e => (e.k, e.kind, (e.id, e.cents)))
      val right = ds.filter(!_.isLeft).map(e => (e.k, e.kind, e.id))
      val out = OuterJoin.outerJoin[String, (Long, Long), Long](
        left, right, jt)
      val sink = runToEnd(s, input, out.toDF(),
        chunks(inserts, 2) ++ Seq(rDel, lDel).filter(_.nonEmpty),
        rocks = true, restartAfter = restartAfter,
        restartBoundaries = restartBoundaries)
      foldChangelog(sink.select($"kind", $"key".as("k"),
        $"left._1".as("l_id"), $"left._2".as("l_cents"),
        $"right".as("r_id")), "kind")
    }
  }

  /** Two-sided join envelope for the interval/window join replays. */
  case class IvEnv(k: String, isLeft: Boolean, id: Long,
      ts: java.sql.Timestamp)

  /** Shared input extraction for the two-sided time-join fuzz replays
    * (interval + window join): derived key, (micro-ts, id)-sorted, split
    * by event_id parity into the case's filtered sides.
    */
  private def sideSplitInput(s: SparkSession, dir: String, keySql: String,
      leftFilterSql: String, rightFilterSql: String): Seq[IvEnv] = {
    import s.implicits._
    t(s, dir, "events")
      .select(expr(s"CAST($keySql AS STRING)").as("k"),
        col("event_id"), col("ts").cast("timestamp").as("ts"),
        expr(leftFilterSql).as("lf"), expr(rightFilterSql).as("rf"))
      // rows failing both side filters never replay — push the subset
      // predicate into the scan instead of shipping them to the driver
      .filter(col("lf") || col("rf"))
      .as[(String, Long, java.sql.Timestamp, Boolean, Boolean)]
      .collect().toSeq.sortBy(t => (micros(t._3), t._2))
      .collect {
        case (k, id, ts, lf, _) if id % 2 == 0 && lf =>
          IvEnv(k, isLeft = true, id, ts)
        case (k, id, ts, _, rf) if id % 2 == 1 && rf =>
          IvEnv(k, isLeft = false, id, ts)
      }
  }

  /** MemoryStream replay for a [[StreamFuzzGen.IntervalCase]]: one
    * watermarked stream splits into the two filtered sides, which join
    * under the case's time-range condition (Spark's stream–stream inner
    * join — the IntervalJoinOperator analogue, q_stream_interval's
    * harness generalized). Inner joins emit eagerly on match, so the
    * ascending replay needs no flush sentinel; the watermark + range
    * condition exist to bound state, exactly as in production.
    */
  private[queries] def streamIntervalFuzzReplay(s: SparkSession,
      dir: String, c: StreamFuzzGen.IntervalCase): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = sideSplitInput(s, dir, c.keySql,
      c.leftFilterSql, c.rightFilterSql)
    val input = MemoryStream[IvEnv]
    val ev = input.toDS().withWatermark("ts", "1 hour")
    val lhs = ev.filter($"isLeft")
      .select($"k".as("l_k"), $"id".as("l_id"), $"ts".as("l_ts"))
    val rhs = ev.filter(!$"isLeft")
      .select($"k".as("r_k"), $"id".as("r_id"), $"ts".as("r_ts"))
    val joined = lhs.join(rhs,
        $"l_k" === $"r_k" &&
        expr(s"r_ts >= l_ts + INTERVAL '${c.loMinutes}' MINUTE") &&
        expr(s"r_ts <= l_ts + INTERVAL '${c.hiMinutes}' MINUTE"))
      .select($"l_k".as("k"), $"l_id", $"r_id")
    runToEnd(s, input, joined, chunks(rows, 2), mode = "append")
  }

  /** MemoryStream replay for a [[StreamFuzzGen.WinJoinCase]]: one
    * watermarked stream splits into the two filtered sides, each side
    * assigns tumbling windows, and rows join on (window_start, key) —
    * q_stream_winjoin's harness generalized. Inner equi-joins emit
    * eagerly on match; no sentinel needed.
    */
  private[queries] def streamWinJoinFuzzReplay(s: SparkSession,
      dir: String, c: StreamFuzzGen.WinJoinCase): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = sideSplitInput(s, dir, c.keySql,
      c.leftFilterSql, c.rightFilterSql)
    val input = MemoryStream[IvEnv]
    val ev = input.toDS().withWatermark("ts", "1 hour")
    val win = window(col("ts"), s"${c.winMinutes} minutes")
      .getField("start")
    val lhs = ev.filter($"isLeft")
      .select(win.as("l_ws"), $"k".as("l_k"), $"id".as("l_id"))
    val rhs = ev.filter(!$"isLeft")
      .select(win.as("r_ws"), $"k".as("r_k"), $"id".as("r_id"))
    val joined = lhs.join(rhs,
        $"l_ws" === $"r_ws" && $"l_k" === $"r_k")
      .select($"l_ws".cast("timestamp_ntz").as("window_start"),
        $"l_k".as("k"), $"l_id", $"r_id")
    runToEnd(s, input, joined, chunks(rows, 2), mode = "append")
  }

  /** MemoryStream replay for a [[StreamFuzzGen.OverCase]]: filtered rows
    * replay (micro-ts, id)-sorted as TimedIn(k, ts, v) through the
    * unbounded-preceding over processor under the case's ROWS/RANGE
    * mode; a far-future sentinel key flushes the tail (its own row never
    * emits — the watermark never passes it — and drops on the key
    * filter regardless). Intra-millisecond arrival order is the sorted
    * replay's (micro-ts, id) order, which is exactly the restatement's
    * ROWS ordering; RANGE mode emits per-ms peer groups, so intra-ms
    * order doesn't reach the output at all.
    */
  private[queries] def streamOverFuzzReplay(s: SparkSession,
      dir: String, c: StreamFuzzGen.OverCase): DataFrame =
    overFuzzReplay(s, dir, c.keySql, c.filterSql, c.valueSql,
      new ProcessOps.UnboundedPrecedingOverProcessor(c.rangeMode))

  /** MemoryStream replay for a [[StreamFuzzGen.BoundedOverCase]]: the
    * same envelope/sentinel shape as the unbounded replay, through the
    * ROWS- or RANGE-bounded processor (accumulator + retract-row state)
    * under the case's frame. `restartAfter` threads the checkpoint
    * stop/resume arm — the retained-frame ValueStates and the input
    * buffer MapState must restore mid-replay.
    */
  private[queries] def streamBoundedOverFuzzReplay(s: SparkSession,
      dir: String, c: StreamFuzzGen.BoundedOverCase,
      restartAfter: Option[Int] = None): DataFrame = {
    val proc: ProcessOps.BufferedOverProcessor =
      if (c.rangeMode) new ProcessOps.RangeBoundedOverProcessor(c.rangeMs)
      else new ProcessOps.RowsBoundedOverProcessor(c.nRows)
    overFuzzReplay(s, dir, c.keySql, c.filterSql, c.valueSql, proc,
      restartAfter)
  }

  /** Shared over-aggregate replay body (see the callers' docs): filtered
    * rows replay (micro-ts, id)-sorted as TimedIn(k, ts, v) through the
    * given buffered over processor; a far-future sentinel key flushes
    * the tail (its own row never emits — the watermark never passes it —
    * and drops on the key filter regardless).
    */
  private def overFuzzReplay(s: SparkSession, dir: String, keySql: String,
      filterSql: String, valueSql: String,
      proc: ProcessOps.BufferedOverProcessor,
      restartAfter: Option[Int] = None): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    implicit val outEnc = Encoders.product[ProcessOps.OverOut]
    val rows = t(s, dir, "events")
      .filter(expr(filterSql))
      .select(expr(s"CAST($keySql AS STRING)").as("k"),
        col("ts").cast("timestamp").as("ts"), col("event_id"),
        expr(s"CAST($valueSql AS BIGINT)").as("v"))
      .as[(String, java.sql.Timestamp, Long, Long)]
      .collect().toSeq.sortBy(t => (micros(t._2), t._3))
      .map { case (k, ts, _, v) => ProcessOps.TimedIn(k, ts, v) }
    // a degenerate seed whose filter keeps no rows is vacuously correct
    // (the oracle is empty too) — don't let rows.last throw
    if (rows.isEmpty)
      return s.emptyDataFrame
        .select(lit("").as("k"), lit(0L).as("ts_ms"), lit(0L).as("v"),
          lit(0L).as("moving_sum"), lit(0L).as("n"))
    val flushKey = "\u0000flush"
    val sentinel = ProcessOps.TimedIn(flushKey,
      new java.sql.Timestamp(rows.last.eventTime.getTime + 10L * 86400000L),
      0L)
    val input = MemoryStream[ProcessOps.TimedIn]
    val out = input.toDS().withWatermark("eventTime", "1 hour")
      .groupByKey(_.key)
      .transformWithState(proc,
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Append())
    runToEnd(s, input, out.toDF(), chunks(rows, 2) :+ Seq(sentinel),
      mode = "append", rocks = true, restartAfter = restartAfter)
      .filter($"key" =!= flushKey)
      .select($"key".as("k"), $"ts".as("ts_ms"), $"v",
        $"movingSum".as("moving_sum"), $"n")
  }

  /** Shared input extraction for the THREE temporal replays (typed,
    * Row, static-dim): the case's (key, ts, event_id, cents, probe-arm,
    * version-arm) rows sorted by (micro-ts, id), plus the far-future
    * flush-probe sentinel (probeId = -1; NUL-prefixed key, disjoint from
    * every CAST/CONCAT key the generator can produce). One extraction
    * keeps the triple-path assertion honest: all routes replay literally
    * the same input.
    */
  private def temporalCaseInput(s: SparkSession, dir: String,
      c: StreamFuzzGen.TemporalCase)
      : (Seq[(String, java.sql.Timestamp, Long, Long, Boolean, Boolean)],
         graft.streaming.TemporalJoin.TemporalEvent) = {
    import s.implicits._
    val rows = t(s, dir, "events")
      .select(expr(s"CAST(${c.keySql} AS STRING)").as("k"),
        col("ts").cast("timestamp").as("ts"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"),
        expr(c.probeFilterSql).as("pf"), expr(c.versionFilterSql).as("vf"))
      .as[(String, java.sql.Timestamp, Long, Long, Boolean, Boolean)]
      .collect().toSeq.sortBy(t => (micros(t._2), t._3))
    val sentinel = graft.streaming.TemporalJoin.TemporalEvent("\u0000flush",
      new java.sql.Timestamp(rows.last._2.getTime + 10L * 86400000L),
      isProbe = true, -1L, 0L)
    (rows, sentinel)
  }

  /** MemoryStream replay for a [[StreamFuzzGen.TemporalCase]]: probe and
    * version rows union (micro-ts, event_id)-sorted into the temporal
    * join processor's envelope stream; probes resolve watermark-driven
    * against the version current at their (millisecond) timestamp. A
    * far-future sentinel probe (probeId = -1, key disjoint from every
    * real CAST/CONCAT result) pushes the watermark past the last real
    * probe so the tail resolves; its own timestamp stays ahead of the
    * final watermark, so it leaves no output trace — and its row is
    * dropped on probe_id >= 0 regardless.
    */
  private[queries] def streamTemporalFuzzReplay(s: SparkSession, dir: String,
      c: StreamFuzzGen.TemporalCase,
      restartAfter: Option[Int] = None): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.streaming.TemporalJoin
    implicit val outEnc = Encoders.product[TemporalJoin.AsOfMatch]
    val (rows, sentinel) = temporalCaseInput(s, dir, c)
    val envs = rows.flatMap { case (k, ts, id, cents, pf, vf) =>
      // a row matching both arms is BOTH a probe and a version (two
      // envelopes, version first so same-position iteration order is
      // deterministic; resolution is watermark-driven either way)
      (if (vf) Seq(TemporalJoin.TemporalEvent(k, ts, isProbe = false, id, cents))
       else Nil) ++
      (if (pf) Seq(TemporalJoin.TemporalEvent(k, ts, isProbe = true, id, 0L))
       else Nil)
    }
    val input = MemoryStream[TemporalJoin.TemporalEvent]
    val out = input.toDS()
      .withWatermark("eventTime", "1 hour")
      .groupByKey(_.key)
      .transformWithState(new TemporalJoin.TemporalJoinProcessor(),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Append())
    runToEnd(s, input, out.toDF(), chunks(envs, 3) :+ Seq(sentinel),
      mode = "append", rocks = true, restartAfter = restartAfter)
      .filter($"probeId" >= 0)
      .select($"key".as("k"), $"probeId".as("probe_id"),
        $"versionTs".as("v_ts"), $"value".as("v_cents"))
  }

  /** The SAME [[StreamFuzzGen.TemporalCase]] through the ROW-payload
    * DataFrame front door ([[TemporalJoin.asOfStream]] →
    * RowTemporalJoinProcessor — the path the SQL surface routes to)
    * instead of the typed processor: probes and versions split from one
    * MemoryStream into the two DataFrame sides. Output shape matches
    * [[streamTemporalFuzzReplay]], so the spec can assert the two
    * processors implement ONE semantics.
    */
  private[queries] def streamTemporalFuzzReplayRow(s: SparkSession,
      dir: String, c: StreamFuzzGen.TemporalCase): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.streaming.TemporalJoin
    val (rows, sentinel) = temporalCaseInput(s, dir, c)
    val envs = rows.flatMap { case (k, ts, id, cents, pf, vf) =>
      (if (vf) Seq(TemporalJoin.TemporalEvent(k, ts, isProbe = false, id, cents))
       else Nil) ++
      (if (pf) Seq(TemporalJoin.TemporalEvent(k, ts, isProbe = true, id, 0L))
       else Nil)
    }
    val input = MemoryStream[TemporalJoin.TemporalEvent]
    val ds = input.toDS()
    val probeSide = ds.filter(_.isProbe)
      .select($"key".as("k"), $"eventTime".as("ts"),
        $"probeId".as("probe_id"))
    val versionSide = ds.filter(!_.isProbe)
      .select($"key".as("k"), $"eventTime".as("ts"),
        unix_millis($"eventTime").as("vms"), $"value".as("cents"))
    val joined = TemporalJoin.asOfStream(probeSide, versionSide,
      Seq("k"), "ts", Seq("vms", "cents"), watermarkDelay = "1 hour")
    runToEnd(s, input, joined, chunks(envs, 3) :+ Seq(sentinel),
      mode = "append", rocks = true)
      .filter($"probe_id" >= 0)
      .select($"k", $"probe_id",
        coalesce($"r_vms", lit(-1L)).as("v_ts"),
        coalesce($"r_cents", lit(-1L)).as("v_cents"))
  }

  /** The SAME [[StreamFuzzGen.TemporalCase]] through the BOUNDED-dim
    * route ([[TemporalJoin.asOfStreamStatic]] — transformWithState
    * initial state loading the full version history per key before the
    * first batch): only probes stream; versions are a batch dim deduped
    * to the operator's one-version-per-(key, ms) contract (latest
    * (micro-ts, id) wins — the same rule the stream-stream arrival order
    * produces). For an ascending replay the three temporal routes must
    * agree row-for-row.
    */
  private[queries] def streamTemporalFuzzReplayStatic(s: SparkSession,
      dir: String, c: StreamFuzzGen.TemporalCase): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.streaming.TemporalJoin
    val (rows, sentinel) = temporalCaseInput(s, dir, c)
    val probes = rows.collect { case (k, ts, id, _, true, _) =>
      TemporalJoin.TemporalEvent(k, ts, isProbe = true, id, 0L) }
    // dim contract: one version per (key, ms) — latest (micro-ts, id)
    val versions = rows.collect { case (k, ts, id, cents, _, true) =>
      (k, ts, id, cents) }
      .groupBy { case (k, ts, _, _) => (k, ts.getTime) }
      .values.map(_.maxBy { case (_, ts, id, _) => (micros(ts), id) })
      .toSeq
    val versionsDf = versions
      .map { case (k, ts, _, cents) => (k, ts, ts.getTime, cents) }
      .toDF("k", "ts", "vms", "cents")
    val input = MemoryStream[TemporalJoin.TemporalEvent]
    val probeSide = input.toDS()
      .select($"key".as("k"), $"eventTime".as("ts"),
        $"probeId".as("probe_id"))
    val joined = TemporalJoin.asOfStreamStatic(probeSide, versionsDf,
      Seq("k"), "ts", Seq("vms", "cents"), watermarkDelay = "1 hour")
    runToEnd(s, input, joined, chunks(probes, 3) :+ Seq(sentinel),
      mode = "append", rocks = true)
      .filter($"probe_id" >= 0)
      .select($"k", $"probe_id",
        coalesce($"r_vms", lit(-1L)).as("v_ts"),
        coalesce($"r_cents", lit(-1L)).as("v_cents"))
  }

  /** MemoryStream replay for a [[StreamFuzzGen.LatenessCase]]: the
    * filtered base replays ascending in three batches, the resend rows
    * (fresh ids, original timestamps, 1 s clear of the engine-filter
    * boundary) follow in one batch — splitting into allowed-late
    * re-fires and side-output rows inside the processor — and a
    * far-future sentinel fires + cleans every remaining window. The
    * folded changelog must equal the case's base+allowed-late counts
    * plus the too-late side-output rows (its DuckDB restatement).
    */
  private[queries] def streamLatenessFuzzReplay(s: SparkSession,
      dir: String, c: StreamFuzzGen.LatenessCase,
      restartAfter: Option[Int] = None): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = t(s, dir, "events")
      .filter(expr(c.filterSql))
      .select(col("event_type"), col("ts").cast("timestamp").as("ts"),
        col("event_id"))
      .as[(String, java.sql.Timestamp, Long)]
      .collect().toSeq.sortBy(t => (micros(t._2), t._3))
    if (rows.isEmpty)
      return s.emptyDataFrame.select(lit(false).as("late"),
        lit("").as("event_type"), lit(0L).as("ws_ms"), lit(0L).as("n"),
        lit(0L).as("id"))
    val ins = rows.map { case (ty, ts, id) =>
      AllowedLateness.LWIn(ty, ts, id) }
    val mMs = rows.last._2.getTime
    val resend = rows.collect {
      case (ty, ts, id)
          if id % c.reMod == c.reRes &&
            ts.getTime >= mMs - c.delayMs + 1000L =>
        AllowedLateness.LWIn(ty, ts, id + c.idOff)
    }
    val sentinel = Seq(AllowedLateness.LWIn("\u0000flush",
      new java.sql.Timestamp(mMs + 10L * 86400000L), 0L))
    val input = MemoryStream[AllowedLateness.LWIn]
    val out = AllowedLateness.tumbleCounts(
      input.toDS().withWatermark("eventTime", s"${c.delayMs} milliseconds"),
      windowMs = c.windowMs, latenessMs = c.latenessMs, delayMs = c.delayMs)
    val sink = runToEnd(s, input, out,
      chunks(ins, 3) ++ Seq(resend).filter(_.nonEmpty) :+ sentinel,
      rocks = true, restartAfter = restartAfter)
    foldChangelog(sink, "kind")
      .filter($"etype" =!= "\u0000flush")
      .select($"late", $"etype".as("event_type"), $"ws".as("ws_ms"),
        $"n", $"id")
  }

  /** MemoryStream replay for a [[StreamFuzzGen.IdleCase]]: the sent
    * rows (stalled sources truncated at their cutoffs) replay in equal
    * TIME-SLICE rounds through [[graft.streaming.WatermarkMux.stamp]] —
    * the combined idleness-aware clock — into the stamped-clock tumble
    * operator; the closing sentinel goes only to UNSTALLED sources, so
    * the tail windows close only if idle marking actually released the
    * stalled sources from the watermark min. Output window starts are
    * epoch-micros BIGINTs (ms buckets × 1000 — widths divide a day, so
    * both engines' buckets align).
    */
  private[queries] def streamIdleFuzzReplay(s: SparkSession, dir: String,
      c: StreamFuzzGen.IdleCase): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = sortedEvents(s, dir)
    val mn = micros(rows.head.ts)
    val mx = micros(rows.last.ts)
    def srcOf(e: Ev): Int = Math.floorMod(e.user_id, c.nSources.toLong).toInt
    def sent(e: Ev): Boolean = c.cutoffs(srcOf(e)) match {
      case Some(cut) => micros(e.ts) * 16 < mn * 16 + (mx - mn) * cut
      case None => true
    }
    val span = mx - mn + 1
    def sliceOf(e: Ev): Int =
      math.min(c.rounds - 1, ((micros(e.ts) - mn) * c.rounds / span).toInt)
    val rounds: Seq[Seq[(Int, (String, Long))]] = (0 until c.rounds).map { r =>
      rows.filter(e => sent(e) && sliceOf(e) == r)
        .map(e => (srcOf(e), (e.event_type, e.ts.getTime)))
    }
    val sentinelTs = rows.last.ts.getTime + 10L * 86400000L
    val sentinelRound = c.cutoffs.zipWithIndex.collect {
      case (None, j) => (j, ("sentinel", sentinelTs)) }
    val allRounds = rounds ++ Seq(sentinelRound,
      Seq.empty[(Int, (String, Long))])
    val input = MemoryStream[graft.streaming.WatermarkMux.MuxIn]
    val out = graft.streaming.WatermarkMux.idleTumbleCounts(
      input.toDS(), windowMs = c.winMinutes * 60000L)
    runToEnd(s, input, out,
      graft.streaming.WatermarkMux.stamp(allRounds,
        delayMs = c.delayMinutes * 60000L,
        idleTimeoutRounds = c.idleTimeoutRounds),
      mode = "append", rocks = true)
      .filter($"etype" =!= "sentinel")
      .select(($"ws" * 1000L).as("ws_us"), $"etype".as("event_type"), $"n")
      .orderBy($"ws_us", $"event_type")
  }

  /** MemoryStream replay for a [[StreamFuzzGen.WmAlignCase]]: the
    * unbalanced split drains through
    * [[graft.streaming.WatermarkMux.alignRounds]] under the case's
    * drift cap and round size, then replays through the stamped-clock
    * tumble operator (no idleness — alignment only paces). The folded
    * counts must equal the full tumble restatement: pausing may reorder
    * rounds, never lose, duplicate, or outrun a row.
    */
  private[queries] def streamWmAlignFuzzReplay(s: SparkSession, dir: String,
      c: StreamFuzzGen.WmAlignCase): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = sortedEvents(s, dir)
    val fast = rows.filter(e => Math.floorMod(e.user_id, c.mod.toLong) == 0L)
      .map(e => (e.event_type, e.ts.getTime)).toVector
    val slow = rows.filter(e => Math.floorMod(e.user_id, c.mod.toLong) != 0L)
      .map(e => (e.event_type, e.ts.getTime)).toVector
    val spanMs = (rows.last.ts.getTime - rows.head.ts.getTime).max(1L)
    val rounds = graft.streaming.WatermarkMux.alignRounds(
      Map(0 -> fast, 1 -> slow), (r: (String, Long)) => r._2,
      maxDriftMs = spanMs / c.driftDiv,
      rowsPerRound =
        (math.min(fast.size, slow.size) / c.roundsDiv).max(1))
    val sentinelTs = rows.last.ts.getTime + 10L * 86400000L
    val allRounds = rounds ++ Seq(
      Seq((0, ("sentinel", sentinelTs)), (1, ("sentinel", sentinelTs))),
      Seq.empty[(Int, (String, Long))])
    val input = MemoryStream[graft.streaming.WatermarkMux.MuxIn]
    val out = graft.streaming.WatermarkMux.idleTumbleCounts(
      input.toDS(), windowMs = c.winMinutes * 60000L)
    runToEnd(s, input, out,
      graft.streaming.WatermarkMux.stamp(allRounds, delayMs = 0L,
        idleTimeoutRounds = 1000000),
      mode = "append", rocks = true)
      .filter($"etype" =!= "sentinel")
      .select(($"ws" * 1000L).as("ws_us"), $"etype".as("event_type"), $"n")
      .orderBy($"ws_us", $"event_type")
  }

  /** Two-sided envelope for [[streamCoGroupFuzzReplay]]. */
  case class CgEnv(k: String, isLeft: Boolean, ts: java.sql.Timestamp,
      id: Long, cents: Long)

  /** MemoryStream replay for a [[StreamFuzzGen.CoGroupCase]]: one
    * watermarked stream splits into the parity sides, which coGroup
    * under the case's tumbling or sliding window
    * ([[graft.streaming.CoGroup]]); the callback emits ONE row per
    * (key, window) fire carrying both sides' aggregates — one-sided
    * fires included. A far-future left-side sentinel (disjoint key)
    * flushes the tail windows; its own window never fires.
    */
  private[queries] def streamCoGroupFuzzReplay(s: SparkSession,
      dir: String, c: StreamFuzzGen.CoGroupCase): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    implicit val sqlCtx = s.sqlContext
    val rows = t(s, dir, "events")
      .select(expr(s"CAST(${c.keySql} AS STRING)").as("k"), col("event_id"),
        col("ts").cast("timestamp").as("ts"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"),
        expr(c.leftFilterSql).as("lf"), expr(c.rightFilterSql).as("rf"))
      .filter(col("lf") || col("rf"))
      .as[(String, Long, java.sql.Timestamp, Long, Boolean, Boolean)]
      .collect().toSeq.sortBy(t => (micros(t._3), t._2))
      .collect {
        case (k, id, ts, cents, lf, _) if id % 2 == 0 && lf =>
          CgEnv(k, isLeft = true, ts, id, cents)
        case (k, id, ts, cents, _, rf) if id % 2 == 1 && rf =>
          CgEnv(k, isLeft = false, ts, id, cents)
      }
    if (rows.isEmpty)
      return s.emptyDataFrame.select(
        lit(null).cast("timestamp_ntz").as("window_start"),
        lit("").as("k"), lit(0L).as("l_n"), lit(0L).as("r_n"),
        lit(0L).as("l_cents"), lit(0L).as("r_max_id"))
    val sentinel = CgEnv("\u0000flush", isLeft = true,
      new java.sql.Timestamp(rows.last.ts.getTime + 10L * 86400000L),
      -1L, 0L)
    val input = MemoryStream[CgEnv]
    val ev = input.toDS()
    val lhs = ev.filter(_.isLeft).toDF()
      .select($"k", $"ts", $"id", $"cents")
    val rhs = ev.filter(!_.isLeft).toDF()
      .select($"k", $"ts", $"id", $"cents")
    val outSchema = StructType(Seq(
      StructField("window_start", TimestampType),
      StructField("k", StringType),
      StructField("l_n", LongType), StructField("r_n", LongType),
      StructField("l_cents", LongType), StructField("r_max_id", LongType)))
    val fn = (key: String, winStart: Long,
        ls: Seq[org.apache.spark.sql.Row],
        rs: Seq[org.apache.spark.sql.Row]) =>
      Iterator.single(
        new org.apache.spark.sql.catalyst.expressions.GenericRow(Array[Any](
          new java.sql.Timestamp(winStart), key,
          ls.length.toLong, rs.length.toLong,
          ls.map(_.getAs[Long]("cents")).sum,
          if (rs.isEmpty) -1L else rs.map(_.getAs[Long]("id")).max)))
    val out =
      if (!c.isSliding)
        CoGroup.tumbling(lhs, rhs, Seq("k"), "ts",
          c.winMinutes * 60000L, "1 second", fn, outSchema)
      else
        CoGroup.sliding(lhs, rhs, Seq("k"), "ts",
          c.winMinutes * 60000L, c.slideMinutes * 60000L, "1 second",
          fn, outSchema)
    runToEnd(s, input, out, chunks(rows, 2) :+ Seq(sentinel),
      mode = "append", rocks = true)
      .filter($"k" =!= "\u0000flush")
      .select($"window_start".cast("timestamp_ntz").as("window_start"),
        $"k", $"l_n", $"r_n", $"l_cents", $"r_max_id")
  }

  /** Tagged proc-time envelope for [[streamPtJoinFuzzReplay]]: one
    * MemoryStream carries version upserts/clears and probes so the
    * cross-side arrival order is pinned (ProcTimeJoin.joinTagged's
    * single-stream front door exists for exactly this).
    */
  case class PtEnv(k: String, isProbe: Boolean, kind: Byte, pid: Long,
      vid: Long, vcents: Long)

  /** MemoryStream replay for a [[StreamFuzzGen.PtJoinCase]]: the tagged
    * stream replays in (micro-ts, event_id, version-before-probe) order
    * through [[ProcTimeJoin.joinTagged]] — each probe joins the version
    * current at its ARRIVAL (ValueState overwritten in element order,
    * delete-marked version ops clearing it), which the case's oracle
    * restates as a LAST_VALUE-over-preceding-arrivals window. No
    * watermark, no sentinel: proc-time semantics are arrival semantics,
    * and the ascending replay makes arrival order deterministic.
    */
  private[queries] def streamPtJoinFuzzReplay(s: SparkSession, dir: String,
      c: StreamFuzzGen.PtJoinCase): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    implicit val sqlCtx = s.sqlContext
    val rows = t(s, dir, "events")
      .select(expr(s"CAST(${c.keySql} AS STRING)").as("k"),
        col("ts").cast("timestamp").as("ts"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"),
        expr(c.probeFilterSql).as("pf"), expr(c.versionFilterSql).as("vf"))
      .filter(col("pf") || col("vf"))
      .as[(String, java.sql.Timestamp, Long, Long, Boolean, Boolean)]
      .collect().toSeq.sortBy(t => (micros(t._2), t._3))
    val envs = rows.flatMap { case (k, _, id, cents, pf, vf) =>
      (if (vf) Seq(PtEnv(k, isProbe = false,
        if (id % c.delMod == c.delRes) Changelog.Delete else Changelog.Insert,
        -1L, id, cents)) else Nil) ++
      (if (pf) Seq(PtEnv(k, isProbe = true, Changelog.Insert, id, 0L, 0L))
       else Nil)
    }
    val leftSchema = StructType(Seq(
      StructField("k", StringType), StructField("pid", LongType)))
    val rightStruct = StructType(Seq(
      StructField("vid", LongType), StructField("vcents", LongType)))
    val input = MemoryStream[PtEnv]
    val unioned = input.toDS().toDF()
      .select($"k".as("__pj_key"), $"isProbe".as("__pj_probe"),
        $"kind".as("__pj_kind"), struct($"k", $"pid").as("__pj_l"),
        struct($"vid", $"vcents").as("__pj_r"))
    val out = ProcTimeJoin.joinTagged(unioned, leftSchema, rightStruct,
      leftOuter = true)
    runToEnd(s, input, out.toDF(), chunks(envs, 3), mode = "append",
      rocks = true)
      .select($"k", $"pid".as("probe_id"),
        coalesce($"r_vid", lit(-1L)).as("v_id"),
        coalesce($"r_vcents", lit(-1L)).as("v_cents"))
  }

  /** MemoryStream replay for a [[StreamFuzzGen.BcCase]]: the tagged
    * control/data stream replays in (ts, event_id, control-before-data)
    * order through [[ConnectedStreams.BroadcastRulesProcessor]] — each
    * data row is evaluated against the rules map exactly as of its
    * ARRIVAL (control PUT/REMOVEs applied strictly in element order),
    * which the case's oracle restates per (key, rule) as the last
    * preceding control op on the arrival timeline. No watermark, no
    * sentinel: broadcast-state evaluation is arrival semantics, and the
    * ascending replay makes arrival order deterministic.
    */
  private[queries] def streamBroadcastFuzzReplay(s: SparkSession,
      dir: String, c: StreamFuzzGen.BcCase,
      restartAfter: Option[Int] = None): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.streaming.ConnectedStreams
    implicit val envEnc = Encoders.product[ConnectedStreams.RuleEnv]
    implicit val outEnc = Encoders.product[ConnectedStreams.RuleMatch]
    val rows = t(s, dir, "events")
      .select(expr(s"CAST(${c.keySql} AS STRING)").as("k"),
        col("ts").cast("timestamp").as("ts"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"),
        expr(c.ctrlFilterSql).as("cf"), expr(c.dataFilterSql).as("df"))
      .filter(col("cf") || col("df"))
      .as[(String, java.sql.Timestamp, Long, Long, Boolean, Boolean)]
      .collect().toSeq.sortBy(t => (micros(t._2), t._3))
    val envs = rows.flatMap { case (k, _, id, cents, cf, df) =>
      (if (cf) Seq(ConnectedStreams.RuleEnv(k, isCtrl = true,
        s"r${id % c.nRules}", isDel = id % c.delMod == c.delRes,
        version = id, thrCents = (1 + id % 9) * 2500L,
        dataId = -1L, cents = 0L)) else Nil) ++
      (if (df) Seq(ConnectedStreams.RuleEnv(k, isCtrl = false, rule = "",
        isDel = false, version = 0L, thrCents = 0L,
        dataId = id, cents = cents)) else Nil)
    }
    val input = MemoryStream[ConnectedStreams.RuleEnv]
    val out = input.toDS().groupByKey(_.key)
      .transformWithState(new ConnectedStreams.BroadcastRulesProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
    runToEnd(s, input, out.toDF(), chunks(envs, 3), mode = "append",
      rocks = true, restartAfter = restartAfter)
      .select($"k", $"data_id", $"rule_name", $"version", $"thr_cents")
  }

  /** Quantized-timestamp row for [[streamTsortFuzzReplay]]. */
  case class TsRow(k: String, qts: java.sql.Timestamp, id: Long)

  /** MemoryStream replay for a [[StreamFuzzGen.TsortCase]]: filtered
    * events, event times QUANTIZED to the case's bucket, replay as 3
    * contiguous ascending chunks each SCRAMBLED by the shared
    * (id·131) mod 997 hash — bounded disorder inside every micro-batch
    * that [[graft.streaming.TemporalSort]] must undo, while chunk
    * contiguity keeps every row ahead of the advancing watermark (no
    * row is late by construction). The sorted output chains into the
    * per-key [[graft.streaming.TemporalSort.SeqStampProcessor]]; the
    * emitted (k, id, seq) set must equal ROW_NUMBER over (quantized
    * ts, chunk, hash, id) — arrival order within equal timestamps is
    * the reference's RowTimeSortOperator contract, and the stamper
    * makes it a hashable value.
    */
  private[queries] def streamTsortFuzzReplay(s: SparkSession, dir: String,
      c: StreamFuzzGen.TsortCase,
      restartAfter: Option[Int] = None): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    implicit val stampEnc =
      Encoders.product[graft.streaming.TemporalSort.SeqStamped]
    val quantMs = c.quantMinutes * 60000L
    val rows = t(s, dir, "events").filter(expr(c.filterSql))
      .select(expr(s"CAST(${c.keySql} AS STRING)").as("k"),
        col("ts").cast("timestamp").as("ts"), col("event_id"))
      .as[(String, java.sql.Timestamp, Long)]
      .collect().toSeq.sortBy(t => (micros(t._2), t._3))
      .map { case (k, ts, id) =>
        TsRow(k, new java.sql.Timestamp(
          ts.getTime - Math.floorMod(ts.getTime, quantMs)), id)
      }
    val batches = chunks(rows, 3)
      .map(_.sortBy(r => ((r.id * 131) % 997, r.id)))
    val maxQ = rows.map(_.qts.getTime).max
    val sentinel = Seq(TsRow("\u0000flush", new java.sql.Timestamp(
      maxQ + c.delayMinutes * 60000L + 2 * quantMs), -1L))
    val input = MemoryStream[TsRow]
    val watermarked = input.toDS()
      .withWatermark("qts", s"${c.delayMinutes} minutes").as[TsRow]
    val sortedOut = graft.streaming.TemporalSort.sorted[String, TsRow](
      watermarked, _.k, _.qts.getTime)
    val stamped = sortedOut.groupByKey(_.k)
      .transformWithState(
        new graft.streaming.TemporalSort.SeqStampProcessor[TsRow](_.id),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
    runToEnd(s, input, stamped.toDF(), batches :+ sentinel, rocks = true,
      restartAfter = restartAfter)
      .filter($"k" =!= "\u0000flush")
      .select($"k", $"id", $"seq")
  }

  /** MemoryStream replay for a [[StreamFuzzGen.T1Case]]: filtered
    * events replay (ts, id)-sorted per key through
    * [[StatefulOps.FastTop1Processor]] (top1 arm — one champion
    * ValueState per key, -U/+U dethronings) or
    * [[StatefulOps.AppendOnlyFirstNProcessor]] (firstn arm — counter
    * state only); the folded changelog must equal the batch
    * ROW_NUMBER restatement. `restartAfter` threads the top1 arm's
    * single-record state through the checkpoint stop/restart battery.
    */
  private[queries] def streamT1FuzzReplay(s: SparkSession, dir: String,
      c: StreamFuzzGen.T1Case,
      restartAfter: Option[Int] = None): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    implicit val chEnc =
      Encoders.product[StatefulOps.Change[String, StatefulOps.Ranked]]
    val rows = t(s, dir, "events").filter(expr(c.filterSql))
      .select(expr(s"CAST(${c.keySql} AS STRING)").as("k"),
        col("ts").cast("timestamp").as("ts"), col("event_id"),
        expr(s"CAST(${c.sortSql} AS BIGINT)").as("srt"))
      .as[(String, java.sql.Timestamp, Long, Long)]
      .collect().toSeq.sortBy(t => (micros(t._2), t._3))
      .map { case (k, ts, id, srt) =>
        StatefulOps.Ranked(k, id,
          if (c.arm == "top1") srt else micros(ts))
      }
    val input = MemoryStream[StatefulOps.Ranked]
    val out = input.toDS().groupByKey(_.key)
      .transformWithState(
        if (c.arm == "top1") new StatefulOps.FastTop1Processor
        else new StatefulOps.AppendOnlyFirstNProcessor(c.n),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
    val sink = runToEnd(s, input, out.toDF(), chunks(rows, 3),
      rocks = true, restartAfter = restartAfter)
    foldChangelog(sink, "kind")
      .select($"value.key".as("k"), $"value.id".as("id"),
        $"value.sort".as("srt"))
  }

  /** MemoryStream replay for a [[WindowFuzzGen.CountWinCase]]: filtered
    * events replay (micro-ts, id)-sorted per key through the tumbling
    * [[StatefulOps.CountWindowProcessor]] (every FULL window of `size`
    * rows emits its value sum; partial tails stay pending) or the
    * sliding [[StatefulOps.CountSlideProcessor]] (fires at every
    * `slide`-th row over the trailing `size`, partial heads allowed) —
    * the reference's countWindow(size[, slide]) contracts under random
    * keys/values/sizes, restated as ROW_NUMBER arithmetic.
    */
  private[queries] def streamCountWinFuzzReplay(s: SparkSession,
      dir: String, c: WindowFuzzGen.CountWinCase): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    implicit val chEnc = Encoders.product[StatefulOps.Change[String, Long]]
    val rows = t(s, dir, "events")
      .filter(expr(c.filterSql))
      .select(expr(s"CAST(${c.keySql} AS STRING)").as("k"),
        col("ts").cast("timestamp").as("ts"), col("event_id"),
        expr(s"CAST(${c.valueSql} AS BIGINT)").as("v"))
      .as[(String, java.sql.Timestamp, Long, Long)]
      .collect().toSeq.sortBy(t => (micros(t._2), t._3))
      .map { case (k, _, _, v) => StatefulOps.Change(Changelog.Insert, k, v) }
    val input = MemoryStream[StatefulOps.Change[String, Long]]
    val out =
      if (!c.sliding)
        input.toDS().groupByKey(_.key)
          .transformWithState(new StatefulOps.CountWindowProcessor(c.size),
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .toDF().select($"key".as("k"), $"windowId".as("window_id"),
            $"sum".as("sum_v"), $"n")
      else
        input.toDS().groupByKey(_.key)
          .transformWithState(
            new StatefulOps.CountSlideProcessor(c.size, c.slide),
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .toDF().select($"key".as("k"), $"fireId".as("fire_id"),
            $"sum".as("sum_v"), $"n")
    runToEnd(s, input, out, chunks(rows, 2), rocks = true)
  }

  /** Streaming count-window replay (IntegrationQueries.q_stream_countwin
    * lives in that module's inventory; the harness internals live here):
    * events stream per user in (event-time, id) order, every full window
    * of `size` rows emits its event-id sum — partial tails stay pending
    * in state, exactly the reference's countWindow(size) contract.
    */
  private[queries] def countWindowReplay(s: SparkSession, dir: String,
      size: Int): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    implicit val chEnc =
      Encoders.product[StatefulOps.Change[String, Long]]
    val rows = sortedEvents(s, dir).filter(_.user_id % 3 == 0).map(e =>
      StatefulOps.Change(Changelog.Insert, e.user_id.toString, e.event_id))
    val input = MemoryStream[StatefulOps.Change[String, Long]]
    val out = input.toDS().groupByKey(_.key)
      .transformWithState(new StatefulOps.CountWindowProcessor(size),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
    val sink = runToEnd(s, input, out.toDF(), chunks(rows, 2), rocks = true)
    sink.select($"key", $"windowId".as("window_id"),
        $"sum".as("sum_ids"), $"n")
      .orderBy($"key", $"window_id")
  }

  /** Sliding-count-window replay (IntegrationQueries.q_stream_countslide):
    * every `slide`-th row per user emits the event-id sum over the last
    * `size` rows — KeyedStream.countWindow(size, slide) semantics, the
    * CountEvictor's trailing retention made oracle-visible.
    */
  private[queries] def countSlideReplay(s: SparkSession, dir: String,
      size: Int, slide: Int): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    implicit val chEnc =
      Encoders.product[StatefulOps.Change[String, Long]]
    val rows = sortedEvents(s, dir).filter(_.user_id % 3 == 0).map(e =>
      StatefulOps.Change(Changelog.Insert, e.user_id.toString, e.event_id))
    val input = MemoryStream[StatefulOps.Change[String, Long]]
    val out = input.toDS().groupByKey(_.key)
      .transformWithState(new StatefulOps.CountSlideProcessor(size, slide),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
    val sink = runToEnd(s, input, out.toDF(), chunks(rows, 2), rocks = true)
    sink.select($"key", $"fireId".as("fire_id"),
        $"sum".as("sum_ids"), $"n")
      .orderBy($"key", $"fire_id")
  }

  /** Temporal-sort replay with a chained order auditor
    * (IntegrationQueries.q_stream_sort): events replay through
    * TemporalSort.sorted, whose append output feeds
    * TemporalSort.OrderAuditProcessor — a SECOND stateful operator in
    * the same query — counting per-key rows and order violations at
    * MICROSECOND granularity. The oracle pins (n = per-user row count,
    * violations = 0): a lost row, duplicate emission, or out-of-order
    * emission each breaks the hash.
    */
  private[queries] def temporalSortReplay(s: SparkSession,
      dir: String): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    implicit val auditEnc =
      Encoders.product[graft.streaming.TemporalSort.OrderAudit]
    // a deterministic third of the users — the per-key sort/audit
    // protocol is volume-independent
    val rows = sortedEvents(s, dir).filter(_.user_id % 3 == 0)
    val maxTs = rows.map(_.ts.getTime).max
    def sentinel(off: Long) = Seq(Ev(-1L, -1L,
      new java.sql.Timestamp(maxTs + off), "flush", 0.0))
    val input = MemoryStream[Ev]
    val watermarked = input.toDS().withWatermark("ts", "1 hour").as[Ev]
    val sortedOut = graft.streaming.TemporalSort.sorted[String, Ev](
      watermarked, e => e.user_id.toString, e => e.ts.getTime)
    val audited = sortedOut
      .groupByKey(e => e.user_id.toString)
      .transformWithState(
        new graft.streaming.TemporalSort.OrderAuditProcessor[Ev](
          e => micros(e.ts)),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
    val sink = runToEnd(s, input, audited.toDF(),
      chunks(rows, 2) :+ sentinel(2 * 3600000L), rocks = true)
    // n/violations are monotone per key → max = final state
    sink.filter($"key" =!= "-1")
      .groupBy($"key")
      .agg(max($"n").as("n"), max($"violations").as("violations"))
      .orderBy($"key")
  }

  /** Connected-streams replay (IntegrationQueries.q_stream_broadcast):
    * a CONTROL stream of per-user thresholds (batch 1) connects with the
    * event DATA stream (batches 2–4) through ThresholdProcessor — the
    * KeyedBroadcastProcessFunction shape: control rows mutate keyed
    * state, data rows filter against it. With every threshold delivered
    * before any data, the final emission equals a batch filter the
    * oracle can state in SQL.
    */
  private[queries] def broadcastReplay(s: SparkSession,
      dir: String): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    implicit val flaggedEnc =
      Encoders.product[graft.streaming.ConnectedStreams.Flagged]
    import graft.streaming.ConnectedStreams.{Tagged, ThresholdProcessor}
    val evs = sortedEvents(s, dir)
    val controls = evs.map(_.user_id).distinct.sorted.map(u =>
      Tagged(u.toString, isControl = true, threshold = u % 100, value = 0L))
    val data = evs.map { e =>
      val cents = math.round(e.value * 100)
      Tagged(e.user_id.toString, isControl = false, threshold = 0L,
        value = cents)
    }
    val input = MemoryStream[Tagged]
    val out = input.toDS().groupByKey(_.key)
      .transformWithState(new ThresholdProcessor(defaultThreshold = 0L),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
    val sink = runToEnd(s, input, out.toDF(),
      controls +: chunks(data, 2), rocks = true)
    sink.select($"key", $"value", $"threshold")
      .orderBy($"key", $"value")
  }

  /** Streaming semi/anti join replay (IntegrationQueries
    * .q_stream_semi/anti): purchases stream as the LEFT side per user,
    * views as the RIGHT; after the insert replay a batch of view
    * DELETES (every view of users ≡ 0 mod 7, plus event_id % 3 == 0
    * churn) drives right counts back across the zero boundary — all the
    * way to EMPTY for the mod-7 users, so the anti side re-emits and
    * the semi side retracts for real. The folded changelog must equal
    * the batch EXISTS / NOT EXISTS oracle over surviving views.
    */
  private[queries] def semiAntiReplay(s: SparkSession, dir: String,
      semi: Boolean): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.streaming.SemiAntiJoin.{JoinInput, JoinOutput, SemiAntiProcessor}
    implicit val outEnc = Encoders.product[JoinOutput]
    val evs = sortedEvents(s, dir)
    val inserts = evs.collect {
      case e if e.event_type == "purchase" =>
        JoinInput(e.user_id.toString, isLeft = true, e.event_id, 1)
      case e if e.event_type == "view" =>
        JoinInput(e.user_id.toString, isLeft = false, e.event_id, 1)
    }
    val deletes = evs.collect {
      case e if e.event_type == "view" &&
          (e.user_id % 7 == 0 || e.event_id % 3 == 0) =>
        JoinInput(e.user_id.toString, isLeft = false, e.event_id, -1)
    }
    val input = MemoryStream[JoinInput]
    val out = input.toDS().groupByKey(_.key)
      .transformWithState(new SemiAntiProcessor(semi),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
    val sink = runToEnd(s, input, out.toDF(),
      chunks(inserts, 2) :+ deletes, rocks = true)
    foldChangelog(sink, "kind")
      .select($"key", $"id")
      .orderBy($"key", $"id")
  }

  val queries: Map[String, QFn] = Map(

    // Streaming tumbling-window aggregate: the same GROUP BY
    // window(ts, 1h), event_type plan as q_window_tumble, executed
    // incrementally over replayed micro-batches with streaming agg state; the
    // complete-mode sink's final table must equal the batch result.
    "q_stream_tumble" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = sortedEvents(s, dir)
      val input = MemoryStream[Ev]
      val agg = input.toDS()
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
        .select($"window.start".cast("timestamp_ntz").as("window_start"),
          $"window.end".cast("timestamp_ntz").as("window_end"),
          $"event_type", $"n", $"sum_value")
      runToEnd(s, input, agg, chunks(rows, 2), mode = "complete")
        .orderBy($"window_start", $"event_type")
    }),

    // Watermark late-data semantics made driver-visible: the same tumble
    // aggregate under withWatermark + APPEND mode — each window emits
    // exactly once when the watermark passes its end. Batch 4 re-sends
    // the 50 earliest rows (fresh ids, original early timestamps) AFTER
    // the watermark has advanced past their windows: the engine MUST
    // drop them (reference numLateRecordsDropped; LateData scaladoc) or
    // the early windows' counts / re-emission diverge the hash. A final
    // far-future sentinel closes the last real window; its own window
    // never closes so append mode never emits it.
    "q_stream_late" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = sortedEvents(s, dir)
      val lateAgain = rows.take(50).map(e =>
        e.copy(event_id = e.event_id + 9000000L))
      val maxTs = micros(rows.last.ts)
      val sentinel = Ev(9999999L, 0L,
        new java.sql.Timestamp(maxTs / 1000L + 10L * 86400 * 1000),
        "sentinel", 0.0)
      val input = MemoryStream[Ev]
      val agg = input.toDS()
        .withWatermark("ts", "1 second")
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
        .select($"window.start".cast("timestamp_ntz").as("window_start"),
          $"window.end".cast("timestamp_ntz").as("window_end"),
          $"event_type", $"n", $"sum_value")
      runToEnd(s, input, agg,
        chunks(rows, 3) ++ Seq(lateAgain, Seq(sentinel)), mode = "append")
        .orderBy($"window_start", $"event_type")
    }),

    // Streaming keep-last dedup through the SQL rank-pattern recognition
    // (rn = 1 ORDER BY ts DESC → StreamExecDeduplicate keep-last): the
    // emitted +I/-U/+U retract stream folds to one final row per user.
    "q_stream_dedup_last" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = sortedEvents(s, dir)
      val input = MemoryStream[Ev]
      val ranked = input.toDS().toDF()
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"user_id").orderBy($"ts".desc)))
        .filter($"rn" === 1).drop("rn")
      val changes = StreamingRank.rewrite(ranked)
      val sink = runToEnd(s, input, changes, chunks(rows, 2), rocks = true)
      foldChangelog(sink, Changelog.RowKindCol)
        .select($"user_id", $"event_id".as("last_event_id"),
          $"value".as("last_value"))
        .orderBy($"user_id")
    }),

    // Streaming retractable top-n: inserts arrive over 3 batches, then a
    // batch of DELETES (every event_id divisible by 7) — the reference's
    // RetractableTopNFunction changelog contract. The emitted diff stream
    // folds to the top-3 event_ids per type among surviving rows.
    "q_stream_topn" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      implicit val chEnc = Encoders.product[RetractableTopN.TopNChange]
      val evs = t(s, dir, "events")
        .filter($"event_id" % 3 === 0) // deterministic third per type
        .select($"event_id", $"event_type").as[(Long, String)]
        .collect().toSeq.sortBy(_._1)
      val inserts = evs.map { case (id, tpe) =>
        RetractableTopN.TopNChange(Changelog.Insert, tpe, id, id) }
      val deletes = evs.collect { case (id, tpe) if id % 7 == 0 =>
        RetractableTopN.TopNChange(Changelog.Delete, tpe, id, id) }
      val input = MemoryStream[RetractableTopN.TopNChange]
      val diffs = input.toDS().groupByKey(_.key)
        .transformWithState(new RetractableTopN.RetractableTopNProcessor(3),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
      val sink = runToEnd(s, input, diffs.toDF(), chunks(inserts, 2) :+ deletes,
        rocks = true)
      foldChangelog(sink, "kind")
        .select($"key".as("event_type"), $"id")
        .orderBy($"event_type", $"id")
    }),

    // Streaming SQL rank RECOGNITION end-to-end (the planner-rule path,
    // not the processor called directly as q_stream_topn does): the
    // idiomatic row_number-filter plan over an append-only stream is
    // recognized by StreamingRank.rewrite, routed to the top-n diff
    // operator, and its folded changelog must equal the batch top-3
    // per type by (value DESC, event_id).
    "q_stream_rank" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = sortedEvents(s, dir)
      val input = MemoryStream[Ev]
      val named = input.toDS().toDF()
        .select($"event_type", $"event_id", $"value")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"event_type").orderBy($"value".desc, $"event_id")
      val changes = StreamingRank.rewrite(
        named.withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3).drop("rn"))
      val sink = runToEnd(s, input, changes, chunks(rows, 2), rocks = true)
      foldChangelog(sink, Changelog.RowKindCol)
        .orderBy($"event_type", $"event_id")
    }),

    // Streaming mixed-mode temporal join: purchase probes replay as a
    // stream against the BOUNDED views dim loaded into keyed state at
    // query start (TemporalJoin.asOfStreamStatic — the reference's
    // versioned-dim-table shape). Probes resolve watermark-driven; two
    // far-future sentinel probes push the watermark past every real one
    // so the append sink carries the complete result, which must equal
    // the batch ASOF oracle (same SQL as q_join_asof).
    "q_stream_asof" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val ev = t(s, dir, "events").filter($"user_id" % 2 === 0)
      val probes = ev.filter($"event_type" === "purchase")
        .select($"event_id".as("p_id"), $"user_id",
          $"ts".cast("timestamp").as("ts"))
        .as[(Long, Long, java.sql.Timestamp)]
        .collect().toSeq.sortBy(p => (p._3.getTime, p._1))
      val dim = ev.filter($"event_type" === "view")
        .select($"event_id".as("v_id"), $"user_id",
          $"ts".cast("timestamp").as("ts"), $"value".as("v_value"))
      val maxTs = probes.map(_._3.getTime).max
      def sentinel(off: Long) =
        Seq((-1L, -1L, new java.sql.Timestamp(maxTs + off)))
      val input = MemoryStream[(Long, Long, java.sql.Timestamp)]
      // 1h watermark delay: probes replay in ascending (ts, id) order, so
      // the lagging watermark never drops one as late even when a chunk
      // boundary splits equal timestamps; ONE sentinel at max+2h pushes
      // the watermark to max+1h > every real probe at the end (each
      // sentinel batch costs two micro-batches — data + timer-fire)
      val joined = TemporalJoin.asOfStreamStatic(
        input.toDS().toDF("p_id", "user_id", "ts"),
        dim, Seq("user_id"), "ts", Seq("v_id", "v_value"),
        watermarkDelay = "1 hour")
      val sink = runToEnd(s, input, joined,
        chunks(probes, 2) :+ sentinel(7200000L), rocks = true)
      sink.filter($"p_id" >= 0)
        .select($"p_id", $"r_v_id", $"r_v_value")
        .orderBy($"p_id")
    }),

    // Streaming per-row SESSION annotation (SessionWindows.annotate —
    // the TVF's non-aggregate shape): events replay in event-time order,
    // sessions close as the watermark passes last+gap, and every emitted
    // row carries its session's bounds; two far-future sentinels flush
    // the open tails. Must equal the batch gaps-and-islands oracle.
    "q_stream_session" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      // a deterministic third of the users: the session protocol is
      // exercised identically per key, and replay wall-time (micro-batch
      // machinery, not plan cost) is what the subset buys down
      val rows = sortedEvents(s, dir).filter(_.user_id % 3 == 0)
      val maxTs = rows.map(_.ts.getTime).max
      def sentinel(off: Long) = Seq(Ev(-1L, -1L,
        new java.sql.Timestamp(maxTs + off), "flush", 0.0))
      val input = MemoryStream[Ev]
      // 1h watermark delay: the ascending replay never falls behind the
      // lagging watermark even when a chunk boundary splits equal
      // millisecond timestamps; ONE +3h sentinel closes every real
      // session at the end (wm reaches max+2h ≥ last+gap = max+1h, and
      // the timers fire in the sentinel batch's trailing no-data batch)
      val annotated = SessionWindows.annotate(
        input.toDS().toDF().withWatermark("ts", "1 hour"),
        Seq("user_id"), "ts", "1 hour")
      val sink = runToEnd(s, input, annotated,
        chunks(rows, 2) :+ sentinel(3 * 3600000L), rocks = true)
      sink.filter($"user_id" >= 0)
        .select($"user_id", $"event_id",
          $"window_start".cast("timestamp_ntz").as("window_start"),
          $"window_end".cast("timestamp_ntz").as("window_end"))
        .orderBy($"user_id", $"event_id")
    }),

    // Streaming hopping-window aggregate: the same GROUP BY
    // window(ts, 1h, 30m), event_type plan as q_window_hop (every row in
    // two overlapping windows), executed incrementally over replayed micro-
    // batches; the complete-mode sink's final table must equal the batch
    // result.
    "q_stream_hop" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = sortedEvents(s, dir)
      val input = MemoryStream[Ev]
      val agg = input.toDS()
        .groupBy(window($"ts", "1 hour", "30 minutes"), $"event_type")
        .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
        .select($"window.start".cast("timestamp_ntz").as("window_start"),
          $"window.end".cast("timestamp_ntz").as("window_end"),
          $"event_type", $"n", $"sum_value")
      runToEnd(s, input, agg, chunks(rows, 2), mode = "complete")
        .orderBy($"window_start", $"event_type")
    }),

    // Streaming interval join (IntervalJoinOperator parity): purchases
    // and errors split out of ONE replayed stream (streaming self-join),
    // matched per user when the error lands within the hour BEFORE the
    // purchase. Inner interval joins emit eagerly on match, so the
    // append sink carries the complete result — same SQL oracle as
    // q_join_interval. Watermarks bound the join state on both sides.
    "q_stream_interval" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      // replay only the two types the join consumes — the other 60% of
      // the table would be dropped by the stream's first filter anyway,
      // and replaying them just benchmarks MemoryStream ingestion
      val rows = sortedEvents(s, dir)
        .filter(e => (e.event_type == "purchase" || e.event_type == "error")
          && e.user_id % 2 == 0)
      val input = MemoryStream[Ev]
      val ev = input.toDS().withWatermark("ts", "1 hour")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id".as("p_id"), $"user_id".as("p_user"), $"ts".as("p_ts"))
      val errors = ev.filter($"event_type" === "error")
        .select($"event_id".as("e_id"), $"user_id".as("e_user"), $"ts".as("e_ts"))
      val joined = purchases.join(errors,
          $"p_user" === $"e_user" &&
          $"e_ts" >= $"p_ts" - expr("INTERVAL 1 HOUR") &&
          $"e_ts" <= $"p_ts")
        .select($"p_id", $"e_id")
      runToEnd(s, input, joined, chunks(rows, 2), mode = "append")
        .orderBy($"p_id", $"e_id")
    }),

    // Streaming retract group aggregation (GroupAggFunction parity):
    // per-type SUM/COUNT over an insert replay followed by a batch of
    // DELETES (every event_id divisible by 5). The emitted -U/+U
    // changelog folds to the aggregate over surviving rows only — the
    // retraction arithmetic is what's under the oracle gate.
    "q_stream_groupagg" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      implicit val chEnc = Encoders.product[StatefulOps.Change[String, Long]]
      val evs = t(s, dir, "events")
        .filter($"event_id" % 3 === 0) // deterministic third per type
        .select($"event_id", $"event_type").as[(Long, String)]
        .collect().toSeq.sortBy(_._1)
      val inserts = evs.map { case (id, tpe) =>
        StatefulOps.Change(Changelog.Insert, tpe, id) }
      val deletes = evs.collect { case (id, tpe) if id % 5 == 0 =>
        StatefulOps.Change(Changelog.Delete, tpe, id) }
      val input = MemoryStream[StatefulOps.Change[String, Long]]
      val changes = input.toDS().groupByKey(_.key)
        .transformWithState(new StatefulOps.RetractSumProcessor[String, Long](),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
      val sink = runToEnd(s, input, changes.toDF(), chunks(inserts, 2) :+ deletes,
        rocks = true)
      foldChangelog(
        sink.select($"kind", $"value.key".as("event_type"),
          $"value.sum".as("sum_id"), $"value.count".as("n")), "kind")
        .orderBy($"event_type")
    }),

    // Retractable MAX (MaxWithRetractAggFunction parity): inserts replay,
    // then each type's 10 LARGEST event_ids retract — every delete hits
    // the current maximum, forcing the recompute-from-remaining path
    // (the only non-O(1) branch) ten times per key. The folded changelog
    // must equal batch MAX/COUNT over the surviving rows.
    "q_stream_minmax" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      implicit val chEnc = Encoders.product[StatefulOps.Change[String, Long]]
      val evs = t(s, dir, "events")
        .filter($"event_id" % 3 === 0) // deterministic third per type
        .select($"event_id", $"event_type").as[(Long, String)]
        .collect().toSeq.sortBy(_._1)
      val inserts = evs.map { case (id, tpe) =>
        StatefulOps.Change(Changelog.Insert, tpe, id) }
      // the 10 largest ids per type, retracted LARGEST FIRST so every
      // single delete dethrones the then-current max
      val deletes = evs.groupBy(_._2).values.toSeq.flatMap(
        _.sortBy(-_._1).take(10).map { case (id, tpe) =>
          StatefulOps.Change(Changelog.Delete, tpe, id) })
        .sortBy(c => (c.key, -c.value))
      val input = MemoryStream[StatefulOps.Change[String, Long]]
      val changes = input.toDS().groupByKey(_.key)
        .transformWithState(
          new StatefulOps.RetractMinMaxProcessor[String, Long](isMax = true),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
      val sink = runToEnd(s, input, changes.toDF(), chunks(inserts, 2) :+ deletes,
        rocks = true)
      foldChangelog(
        sink.select($"kind", $"value.key".as("event_type"),
          $"value.extreme".as("max_id"), $"value.count".as("n")), "kind")
        .orderBy($"event_type")
    }),

    // The SAME replay through MINI-BATCH aggregation (the reference's
    // table.exec.mini-batch / MiniBatchGroupAggFunction): one protocol
    // step per key per micro-batch instead of per record — the folded
    // end state must still equal the per-record oracle exactly, while
    // the emission count collapses from O(records) to O(keys·batches).
    "q_stream_minibatch" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      implicit val chEnc = Encoders.product[StatefulOps.Change[String, Long]]
      val evs = t(s, dir, "events")
        .filter($"event_id" % 3 === 0) // deterministic third per type
        .select($"event_id", $"event_type").as[(Long, String)]
        .collect().toSeq.sortBy(_._1)
      val inserts = evs.map { case (id, tpe) =>
        StatefulOps.Change(Changelog.Insert, tpe, id) }
      val deletes = evs.collect { case (id, tpe) if id % 5 == 0 =>
        StatefulOps.Change(Changelog.Delete, tpe, id) }
      val input = MemoryStream[StatefulOps.Change[String, Long]]
      val changes = input.toDS().groupByKey(_.key)
        .transformWithState(
          new StatefulOps.RetractSumProcessor[String, Long](miniBatch = true),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
      val sink = runToEnd(s, input, changes.toDF(), chunks(inserts, 2) :+ deletes,
        rocks = true)
      foldChangelog(
        sink.select($"kind", $"value.key".as("event_type"),
          $"value.sum".as("sum_id"), $"value.count".as("n")), "kind")
        .orderBy($"event_type")
    }),

    // Streaming two-sided FULL OUTER join with retractions
    // (StreamingJoinOperator parity): purchases (left) and views (right)
    // replay as inserts, then every view with v_id divisible by 3
    // RETRACTS. The processor's null-pad / retract-pad-on-first-match /
    // re-pad-on-last-retraction protocol folds to exactly the batch
    // FULL OUTER JOIN over surviving rows.
    "q_stream_outer" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val ev = t(s, dir, "events")
        .filter($"user_id" % 2 === 0) // deterministic half of the users
        .select($"event_id", $"user_id", $"event_type", $"value")
        .as[(Long, Long, String, Double)].collect().toSeq
      def tagged(tpe: String, isLeft: Boolean, kind: Byte, keep: Long => Boolean) =
        ev.collect { case (id, u, et, v) if et == tpe && keep(id) =>
          (u, kind, isLeft, id, v) }.sortBy(_._4)
      val inserts = (tagged("purchase", isLeft = true, Changelog.Insert, _ => true) ++
        tagged("view", isLeft = false, Changelog.Insert, _ => true)).sortBy(_._4)
      val deletes = tagged("view", isLeft = false, Changelog.Delete, _ % 3 == 0)
      val input = MemoryStream[(Long, Byte, Boolean, Long, Double)]
      val ds = input.toDS()
      val left = ds.filter(_._3).map(r => (r._1, r._2, (r._4, r._5)))
      val right = ds.filter(!_._3).map(r => (r._1, r._2, (r._4, r._5)))
      val out = OuterJoin.outerJoin[Long, (Long, Double), (Long, Double)](
        left, right, OuterJoin.FullOuter)
      val sink = runToEnd(s, input, out.toDF(), chunks(inserts, 2) :+ deletes,
        rocks = true)
      foldChangelog(
        sink.select($"kind", $"key".as("user_id"),
          $"left._1".as("p_id"), $"left._2".as("p_value"),
          $"right._1".as("v_id"), $"right._2".as("v_value")), "kind")
        .orderBy($"user_id", $"p_id", $"v_id")
    }),

    // Streaming unbounded-preceding OVER aggregation (the reference's
    // RowTimeRowsUnboundedPrecedingFunction): purchase/error events
    // replay with event-time timers — each row's running SUM/COUNT per
    // type emits only when the watermark passes its timestamp, so
    // emission is in event-time order and late rows drop. Append-only
    // output; one far-future sentinel flushes the tail. Must equal the
    // batch ROWS UNBOUNDED PRECEDING window oracle.
    "q_stream_over" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = sortedEvents(s, dir)
        .filter(e => (e.event_type == "purchase" || e.event_type == "error")
          && e.user_id % 2 == 0)
      val maxTs = rows.map(_.ts.getTime).max
      val input = MemoryStream[ProcessOps.TimedIn]
      val timed = rows.map(e =>
        ProcessOps.TimedIn(e.event_type, e.ts, e.event_id))
      val sentinel = Seq(ProcessOps.TimedIn("__flush",
        new java.sql.Timestamp(maxTs + 3 * 3600000L), 0L))
      val out = input.toDS().withWatermark("eventTime", "1 hour")
        .groupByKey(_.key)
        .transformWithState(
          new ProcessOps.UnboundedPrecedingOverProcessor(rangeMode = false),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
      val sink = runToEnd(s, input, out.toDF(), chunks(timed, 2) :+ sentinel,
        rocks = true)
      sink.filter($"key" =!= "__flush")
        .select($"key".as("event_type"), $"v".as("event_id"),
          $"movingSum".as("moving_sum"), $"n")
        .orderBy($"event_type", $"event_id")
    }),

    // Streaming CEP (CepOperator parity): the q_cep_next strict-adjacency
    // purchase→error pattern over a 4-batch replay through the
    // incremental NFA (CEP.streaming → stepSkip). Matches append exactly
    // once regardless of where micro-batch boundaries fall; the sink must
    // equal the batch MATCH_RECOGNIZE oracle.
    "q_stream_cep" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = sortedEvents(s, dir)
      val evs = rows.map(e =>
        CepQueries.E(e.user_id, micros(e.ts), e.event_type, e.event_id))
      val pat = Pattern.begin[CepQueries.E]("A")(_.event_type == "purchase")
        .next("B")(_.event_type == "error")
      val input = MemoryStream[CepQueries.E]
      val matches = CEP.streaming[CepQueries.E](input.toDS(),
          e => e.user_id.toString, _.ts, pat,
          maxBufferPerKey = Some(1 << 20))
        .map { m =>
          val st = m.stages.toMap
          (st("A").head.user_id, st("A").head.event_id, st("B").head.event_id)
        }.toDF("user_id", "purchase_id", "error_id")
      runToEnd(s, input, matches, chunks(evs, 2), rocks = true)
        .orderBy($"user_id", $"purchase_id")
    }),

    // Processing-time temporal join (ProcTimeJoin — the reference's
    // TemporalProcessTimeJoinOperator): probes join the build side's
    // LATEST version at arrival, no event-time alignment. Deterministic
    // replay: view upserts land in batches 1/3 (split by id parity),
    // purchase probes in batches 2/4. ARRIVAL order decides "latest":
    // an even probe sees the even batch's last update per user
    // (max (ts, id) among even views); an odd probe sees the odd
    // batch's last update when the user had any odd view — it arrived
    // later and overwrote, even if its event time is older — else the
    // even one. The oracle mirrors that COALESCE(latest-odd, latest-even).
    "q_stream_ptjoin" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = sortedEvents(s, dir)
      val views = rows.filter(_.event_type == "view")
      val purchases = rows.filter(_.event_type == "purchase")
      val input = MemoryStream[Ev]
      val all = input.toDS()
      val probes = all.filter($"event_type" === "purchase")
        .select($"event_id".as("p_id"), $"user_id")
      val builds = all.filter($"event_type" === "view")
        .select($"user_id", $"event_id".as("v_id"), $"value".as("v_value"))
      val joined = ProcTimeJoin.procTimeJoin(probes, builds,
        Seq("user_id"), Seq("v_id", "v_value"))
      val batches = Seq(
        views.filter(_.event_id % 2 == 0),
        purchases.filter(_.event_id % 2 == 0),
        views.filter(_.event_id % 2 != 0),
        purchases.filter(_.event_id % 2 != 0))
      val sink = runToEnd(s, input, joined, batches, mode = "append",
        rocks = true)
      sink.select($"p_id", $"r_v_id", $"r_v_value").orderBy($"p_id")
    }),

    // Fast Top-1 (FastTop1Function — O(1) state per key): the cheapest
    // per-type row by (cents, id) survives a 4-batch replay's -U/+U
    // dethronings; the folded changelog is the per-type argmin.
    "q_stream_top1" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = sortedEvents(s, dir)
      val ranked = rows.map(e => StatefulOps.Ranked(e.event_type, e.event_id,
        math.round(e.value * 100)))
      val input = MemoryStream[StatefulOps.Ranked]
      val out = input.toDS().groupByKey(_.key)
        .transformWithState(new StatefulOps.FastTop1Processor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
      val sink = runToEnd(s, input, out.toDF(), chunks(ranked, 2),
        rocks = true)
      foldChangelog(sink, "kind")
        .select($"value.key".as("event_type"), $"value.id".as("event_id"),
          $"value.sort".as("cents"))
        .orderBy($"event_type")
    }),

    // Append-only First-N (AppendOnlyFirstNFunction — ROW_NUMBER over
    // arrival order, rn <= n, counter-only state): the first 3 events
    // per user in (ts, id) replay order and nothing after them.
    "q_stream_firstn" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = sortedEvents(s, dir)
      val ranked = rows.map(e => StatefulOps.Ranked(e.user_id.toString,
        e.event_id, micros(e.ts)))
      val input = MemoryStream[StatefulOps.Ranked]
      val out = input.toDS().groupByKey(_.key)
        .transformWithState(new StatefulOps.AppendOnlyFirstNProcessor(3),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
      val sink = runToEnd(s, input, out.toDF(), chunks(ranked, 2),
        rocks = true)
      foldChangelog(sink, "kind")
        .select($"value.key".cast("long").as("user_id"),
          $"value.id".as("event_id"), $"value.sort".as("ts_us"))
        .orderBy($"user_id", $"event_id")
    }),

    // Allowed-lateness window re-fire + late side output (AllowedLateness
    // — WindowedStream.allowedLateness/sideOutputLateData, a former
    // documented non-goal): events replay ascending (3 batches), then
    // batch 4 re-sends two classes with fresh ids — rows from the last
    // hour (late-but-allowed: counted, re-firing already-fired windows)
    // and rows just past the 3-hour horizon (side output). A sentinel
    // flushes the tail. The folded changelog must equal the oracle's
    // window counts over original+allowed rows plus one late=true row
    // per side-output element.
    "q_stream_lateness" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = sortedEvents(s, dir)
      val mUs = micros(rows.last.ts)
      val hourUs = 3600L * 1000000L
      def wsOf(t: Long) = t - (t % hourUs)
      def in(e: Ev, idOff: Long) =
        AllowedLateness.LWIn(e.event_type, e.ts, e.event_id + idOff)
      val ins = rows.map(in(_, 0L))
      // class B: allowed-late (window still inside the lateness horizon)
      val reB = rows.filter(e => micros(e.ts) > mUs - hourUs).map(in(_, 9000000L))
      // class A: past end+lateness but ahead of the engine filter — the
      // 9h delay leaves a ~6h processor-visible too-late band; a
      // 1-second margin keeps the ms-truncated engine watermark boundary
      // out of the class
      val reA = rows.filter { e =>
        val t = micros(e.ts)
        t >= mUs - 9 * hourUs + 1000000L && wsOf(t) + 3 * hourUs <= mUs
      }.map(in(_, 9000000L))
      val sentinel = Seq(AllowedLateness.LWIn("sentinel",
        new java.sql.Timestamp(mUs / 1000L + 10L * 86400 * 1000), 0L))
      val input = MemoryStream[AllowedLateness.LWIn]
      val out = AllowedLateness.tumbleCounts(
        input.toDS().withWatermark("eventTime", "9 hours"), // lat+win+6h slack
        windowMs = 3600000L, latenessMs = 7200000L, delayMs = 9 * 3600000L)
      val sink = runToEnd(s, input, out,
        chunks(ins, 3) ++ Seq(reA ++ reB, sentinel), rocks = true)
      foldChangelog(sink, "kind")
        .filter($"etype" =!= "sentinel")
        .select($"late", $"etype".as("event_type"), $"ws".as("ws_ms"),
          $"n", $"id")
        .orderBy($"late", $"event_type", $"ws_ms", $"id")
    }),

    // Split COUNT(DISTINCT) — SplitAggregateRule's partial/final shape:
    // per-type distinct users shard across (type, user % 16) keys; the
    // partial operator emits shard distinct-count retract rows keyed by
    // type, and the final SUM over the folded changelog (exactly what
    // RetractSumProcessor computes) is the distinct total. A delete
    // batch retracts every event_id % 4 == 0 row — a user leaves the
    // distinct set only when their LAST event of that type retracts
    // (value multiplicity), which the oracle states declaratively.
    "q_stream_distinct" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = sortedEvents(s, dir).filter(_.user_id % 2 == 0)
      val ins = rows.map(e => StatefulOps.SplitIn(e.event_type,
        (e.user_id % 16).toInt, e.user_id, Changelog.Insert))
      val dels = rows.filter(_.event_id % 4 == 0).map(e =>
        StatefulOps.SplitIn(e.event_type, (e.user_id % 16).toInt,
          e.user_id, Changelog.Delete))
      val input = MemoryStream[StatefulOps.SplitIn]
      val out = input.toDS().groupByKey(r => s"${r.group}|${r.bucket}")
        .transformWithState(new StatefulOps.SplitDistinctProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
      val sink = runToEnd(s, input, out.toDF(), chunks(ins, 2) :+ dels,
        rocks = true)
      // the final-stage fold: signed sum of shard-count changes per group
      sink.groupBy($"key".as("event_type"))
        .agg(sum(when(col("kind") === Changelog.Insert ||
            col("kind") === Changelog.UpdateAfter, $"value")
          .otherwise(-$"value")).as("n_users"))
        .orderBy($"event_type")
    }),

    // Upsert-materializing file sink (sources/UpsertSink — the upsert
    // table sink / SinkUpsertMaterializer shape): the events changelog
    // replays keyed by user (seq = replay position, so last-wins follows
    // (ts, id) order), then a tombstone batch deletes every user_id % 5
    // == 0. The materialized parquet table — hash-bucketed, touched
    // buckets rewritten via dynamic partition overwrite — must hold
    // exactly the batch keep-last state minus the deleted users.
    "q_sink_upsert" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = sortedEvents(s, dir)
      val ups = rows.zipWithIndex.map { case (e, i) =>
        UpsCh(e.user_id, e.event_id, e.value, i.toLong, Changelog.Insert) }
      val dels = rows.map(_.user_id).distinct.filter(_ % 5 == 0).sorted.map(u =>
        UpsCh(u, -1L, 0.0, Long.MaxValue, Changelog.Delete))
      val table = tmpDir("q_sink_upsert") + "/t"
      val input = MemoryStream[UpsCh]
      val q = graft.sources.UpsertSink.start(
        input.toDS().toDF().withColumnRenamed("kind", Changelog.RowKindCol),
        Seq("user_id"), "seq", table, buckets = 8,
        checkpoint = tmpDir("q_sink_upsert_ckpt"))
      try (chunks(ups, 2) :+ dels).foreach { b =>
        input.addData(b); q.processAllAvailable()
      } finally q.stop()
      graft.sources.UpsertSink.read(s, table)
        .select($"user_id", $"event_id".as("last_event_id"),
          $"value".as("last_value"))
        .orderBy($"user_id")
    }),

    // Streaming window join (the reference's WindowJoinOperator —
    // StreamExecWindowJoin): clicks and purchases split out of one
    // replayed stream, each bucketed to its tumbling window, and joined
    // on (window, user). Spark executes this as a stream-stream join
    // whose state evicts per window under the watermark — the
    // recommended windowed-join shape; the append sink must equal the
    // batch window join (same oracle as q_window_join modulo replay).
    "q_stream_winjoin" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = sortedEvents(s, dir)
        .filter(e => e.event_type == "click" || e.event_type == "purchase")
      val input = MemoryStream[Ev]
      val ev = input.toDS().withWatermark("ts", "1 hour")
      val clicks = ev.filter($"event_type" === "click")
        .select(window($"ts", "1 hour").getField("start").as("cw"),
          $"user_id".as("c_user"), $"event_id".as("click_id"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select(window($"ts", "1 hour").getField("start").as("pw"),
          $"user_id".as("p_user"), $"event_id".as("purchase_id"))
      val joined = clicks.join(purchases,
          $"cw" === $"pw" && $"c_user" === $"p_user")
        .select($"cw".cast("timestamp_ntz").as("window_start"),
          $"c_user".as("user_id"), $"click_id", $"purchase_id")
      runToEnd(s, input, joined, chunks(rows, 2), mode = "append")
        .orderBy($"window_start", $"user_id", $"click_id", $"purchase_id")
    }),

    // Streaming windowed coGroup (streaming/CoGroup — the reference's
    // CoGroupedStreams, DataStream.java:748): clicks and purchases
    // buffer per (user, hour window) and ONE callback sees both
    // buffers when the watermark fires the window — including
    // one-sided keys, which a join would drop. The callback emits
    // (window, user, n_clicks, n_purchases, exact cents sum over both
    // sides); the oracle is the FULL OUTER join of the two per-window
    // batch aggregates. One shuffle, state evicted per fired window.
    "q_stream_cogroup" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = sortedEvents(s, dir)
        .filter(e => e.event_type == "click" || e.event_type == "purchase")
      val sentinel = Ev(-1L, -1L,
        new java.sql.Timestamp(rows.last.ts.getTime + 10L * 86400000L),
        "click", 0.0)
      val input = MemoryStream[Ev]
      val ev = input.toDS()
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"value")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"value")
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("window_start",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_clicks",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_purchases",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sum_cents",
          org.apache.spark.sql.types.LongType)))
      val out = graft.streaming.CoGroup.tumbling(
        clicks.toDF(), purchases.toDF(), Seq("user_id"), "ts",
        3600000L, "1 second",
        (key, winStart, ls, rs) => {
          // exact cents via the double's shortest decimal rendering —
          // no double addition. The testdata invariant is exact-2dp
          // values (the whole dec2() oracle convention rests on it);
          // the HALF_UP is a never-crash guard for >2dp data. The
          // typed payload hands `value` over as a real Double now —
          // no string cast contract
          def cents(r: org.apache.spark.sql.Row): Long =
            (BigDecimal(java.lang.Double.toString(r.getAs[Double]("value")))
              .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
          Iterator.single(new org.apache.spark.sql.catalyst.expressions.GenericRow(
            Array[Any](new java.sql.Timestamp(winStart), key.toLong,
              ls.length.toLong, rs.length.toLong,
              ls.map(cents).sum + rs.map(cents).sum)))
        },
        outSchema)
      runToEnd(s, input, out.toDF(), chunks(rows, 2) :+ Seq(sentinel),
        mode = "append", rocks = true)
        .filter($"user_id" =!= -1L)
        .select($"window_start".cast("timestamp_ntz").as("window_start"),
          $"user_id", $"n_clicks", $"n_purchases", $"sum_cents")
        .orderBy($"window_start", $"user_id")
    }),

    // Sliding-window coGroup (CoGroup.sliding — the reference's
    // SlidingEventTimeWindows under CoGroupedStreams): size 2 h, slide
    // 1 h, so every event lands in TWO window instances; the oracle
    // restates the assignment as a union of the two shifted hour
    // buckets. Users subsampled to keep the row count bounded.
    "q_stream_coslide" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = sortedEvents(s, dir)
        .filter(e => (e.event_type == "click" || e.event_type == "purchase")
          && e.user_id % 5 == 0)
      val sentinel = Ev(-1L, -1L,
        new java.sql.Timestamp(rows.last.ts.getTime + 10L * 86400000L),
        "click", 0.0)
      val input = MemoryStream[Ev]
      val ev = input.toDS()
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"value")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"value")
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("window_start",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_clicks",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_purchases",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sum_cents",
          org.apache.spark.sql.types.LongType)))
      val out = graft.streaming.CoGroup.sliding(
        clicks.toDF(), purchases.toDF(), Seq("user_id"), "ts",
        7200000L, 3600000L, "1 second",
        (key, winStart, ls, rs) => {
          def cents(r: org.apache.spark.sql.Row): Long =
            (BigDecimal(java.lang.Double.toString(r.getAs[Double]("value")))
              .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
          Iterator.single(new org.apache.spark.sql.catalyst.expressions.GenericRow(
            Array[Any](new java.sql.Timestamp(winStart), key.toLong,
              ls.length.toLong, rs.length.toLong,
              ls.map(cents).sum + rs.map(cents).sum)))
        },
        outSchema)
      runToEnd(s, input, out.toDF(), chunks(rows, 2) :+ Seq(sentinel),
        mode = "append", rocks = true)
        .filter($"user_id" =!= -1L)
        .select($"window_start".cast("timestamp_ntz").as("window_start"),
          $"user_id", $"n_clicks", $"n_purchases", $"sum_cents")
        .orderBy($"window_start", $"user_id")
    }),

    // Session-window coGroup — the CoGroup.sliding doc's session recipe
    // made executable (the reference's session-gap CoGroupedStreams):
    // session bounds come from SessionWindows.annotate over the UNION of
    // both sides (the reference assigns session windows on the unified
    // coGroup input, so one side's events extend the other side's
    // sessions), then a tumbling CoGroup keyed by (user, window_start)
    // hands both buffers of each CLOSED session to one callback — a
    // session's rows all share one window_time, so the fire is exact.
    // Phase 1 replays the union through annotate; its emitted rows
    // replay into the coGroup (the collect is the usual MemoryStream
    // feed, harness necessity). Oracle: batch gaps-and-islands sessions,
    // per-side counts + exact cents, in one grouped pass.
    "q_stream_cosession" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = sortedEvents(s, dir)
        .filter(e => (e.event_type == "click" || e.event_type == "purchase")
          && e.user_id % 3 == 0)
      val maxTs = rows.map(_.ts.getTime).max
      val input = MemoryStream[Ev]
      val annotated = SessionWindows.annotate(
        input.toDS().toDF().withWatermark("ts", "1 hour"),
        Seq("user_id"), "ts", "1 hour")
      val sess = runToEnd(s, input, annotated,
        chunks(rows, 2) :+ Seq(Ev(-1L, -1L,
          new java.sql.Timestamp(maxTs + 3 * 3600000L), "flush", 0.0)),
        rocks = true)
      val annRows = sess.filter($"user_id" >= 0)
        .select($"user_id", $"event_type", $"value", $"window_start",
          $"window_time")
        .as[SessEv].collect().toSeq
        .sortBy(e => (e.window_time.getTime, e.user_id))
      val input2 = MemoryStream[SessEv]
      val ev2 = input2.toDS()
      val clicks = ev2.filter($"event_type" === "click")
        .select($"user_id", $"window_start", $"window_time", $"value")
      val purchases = ev2.filter($"event_type" === "purchase")
        .select($"user_id", $"window_start", $"window_time", $"value")
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("window_start",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_clicks",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_purchases",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sum_cents",
          org.apache.spark.sql.types.LongType)))
      val out = graft.streaming.CoGroup.tumbling(
        clicks.toDF(), purchases.toDF(), Seq("user_id", "window_start"),
        "window_time", 3600000L, "1 second",
        (_, _, ls, rs) => {
          val any = (ls ++ rs).head
          def cents(r: org.apache.spark.sql.Row): Long =
            (BigDecimal(java.lang.Double.toString(r.getAs[Double]("value")))
              .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
          Iterator.single(new org.apache.spark.sql.catalyst.expressions.GenericRow(
            Array[Any](any.getAs[java.sql.Timestamp]("window_start"),
              any.getAs[Long]("user_id"),
              ls.length.toLong, rs.length.toLong,
              ls.map(cents).sum + rs.map(cents).sum)))
        },
        outSchema)
      // the flush sentinel must SURVIVE the side filters (a type neither
      // side keeps would never reach the union or advance the watermark,
      // and the tail sessions' windows would never fire) — it rides the
      // click side and is dropped by the user_id >= 0 filter at the end
      val far = new java.sql.Timestamp(maxTs + 10L * 86400000L)
      runToEnd(s, input2, out.toDF(),
        chunks(annRows, 2) :+ Seq(SessEv(-1L, "click", 0.0, far, far)),
        mode = "append", rocks = true)
        .filter($"user_id" >= 0)
        .select($"window_start".cast("timestamp_ntz").as("window_start"),
          $"user_id", $"n_clicks", $"n_purchases", $"sum_cents")
        .orderBy($"window_start", $"user_id")
    }),

    // Event-time state-TTL dedup (StatefulOps.KeepFirstTtlProcessor —
    // the DeduplicateFunctionHelper + StateTtlConfig story made
    // deterministic): a user's "seen" mark expires after a 6-hour
    // event-time gap, so the next event is a FIRST again. The oracle
    // restates it as per-user gaps-and-islands firsts; timers only
    // clear expired state and cannot affect emissions, which is
    // exactly what makes wall-clock TTL semantics oracle-expressible.
    "q_stream_dedup_ttl" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      implicit val ttlEnc = Encoders.product[StatefulOps.TtlIn]
      val rows = sortedEvents(s, dir).filter(_.user_id % 2 == 0).map(e =>
        StatefulOps.TtlIn(e.user_id.toString, e.ts, e.event_id))
      val sentinel = StatefulOps.TtlIn("-1",
        new java.sql.Timestamp(rows.last.ts.getTime + 10L * 86400000L), -1L)
      val input = MemoryStream[StatefulOps.TtlIn]
      val out = input.toDS().withWatermark("ts", "1 second")
        .as[StatefulOps.TtlIn]
        .groupByKey(_.key)
        .transformWithState(
          new StatefulOps.KeepFirstTtlProcessor(6L * 3600000L),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
      runToEnd(s, input, out.toDF(), chunks(rows, 2) :+ Seq(sentinel),
        mode = "append", rocks = true)
        .filter($"key" =!= "-1")
        .select($"key".cast("long").as("user_id"), $"id".as("event_id"))
        .orderBy($"user_id", $"event_id")
    }),

    // State bootstrap + savepoint-rewrite loop (streaming/StateBootstrap
    // — the State Processor API's WRITE side, SavepointWriter /
    // OperatorTransformation.bootstrapWith): phase 1 streams the
    // pre-cutoff half of events through the keyed running aggregate
    // with a RETAINED checkpoint and stops; the checkpoint state reads
    // back offline (StateReader), becomes the successor's bootstrap
    // frame, and phase 2 — a NEW query on a fresh checkpoint —
    // continues over the post-cutoff half with that initial state. The
    // final running totals must equal batch totals over ALL events for
    // every user active after the cutoff: lost, doubled, or stale
    // bootstrap state each diverge the hash.
    "q_state_bootstrap" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      import graft.streaming.StateBootstrap
      val rows = sortedEvents(s, dir)
      val us = rows.map(e => micros(e.ts))
      val cutoff = us.min + (us.max - us.min) / 2
      def toIn(e: Ev) =
        StateBootstrap.BIn(e.user_id.toString, math.round(e.value * 100))
      val hist = rows.filter(e => micros(e.ts) < cutoff).map(toIn)
      val rest = rows.filter(e => micros(e.ts) >= cutoff).map(toIn)
      // phase 1: transformWithState needs RocksDB; changelog
      // checkpointing stays OFF so the offline statestore read sees
      // plain snapshots; checkpoint retained until JVM exit
      val ckpt1 = tmpDir("q_state_boot") + "/ckpt1"
      val in1 = MemoryStream[StateBootstrap.BIn]
      val out1 = StateBootstrap.agg(in1.toDS(),
        s.emptyDataset(Encoders.product[StateBootstrap.BInit]))
      // same locked set→start→restore window as runToEnd (Bench overlaps
      // replay gates; see the comment there)
      val q1 = Q.streamConfLock.synchronized {
        val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
        val prevProvider =
          s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
        s.conf.set("spark.sql.shuffle.partitions", "2")
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try out1.writeStream.format("memory")
          .queryName(s"qsb_${java.util.UUID.randomUUID().toString.replace("-", "")}")
          .outputMode("update")
          .option("checkpointLocation", ckpt1).start()
        finally {
          s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
          prevProvider match {
            case Some(p) =>
              s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
            case None =>
              s.conf.unset("spark.sql.streaming.stateStore.providerClass")
          }
        }
      }
      try chunks(hist, 2).foreach { b => in1.addData(b); q1.processAllAvailable() }
      finally q1.stop()
      // the read→(identity-)rewrite→bootstrap leg; the spec drives a
      // non-identity rewrite through the same path
      val boot = StateBootstrap.readAccState(s, ckpt1)
      val in2 = MemoryStream[StateBootstrap.BIn]
      val out2 = StateBootstrap.agg(in2.toDS(), boot)
      val sink = runToEnd(s, in2, out2, chunks(rest, 2), rocks = true)
      // n is strictly monotone per key: the final state is the argmax row
      sink.groupBy($"key".cast("long").as("user_id"))
        .agg(max(struct($"n", $"cents")).as("m"))
        .select($"user_id", $"m.n".as("n"), $"m.cents".as("sum_cents"))
        .orderBy($"user_id")
    }),

    // Watermark idleness (WatermarkStrategy.withIdleness via
    // WatermarkOutputMultiplexer — SURVEY §2.10's last partial row):
    // events replay as TWO source partitions (user parity); the odd
    // partition sends only rows before the one-third time cutoff and
    // then stalls. WatermarkMux stamps each fetch round with the
    // combined watermark at the SOURCE layer (where the reference runs
    // the multiplexer); after two silent rounds the stalled partition is
    // marked idle and the clock follows the live partition alone, so
    // every window — including those holding only the stalled
    // partition's rows — closes and emits exactly once in append mode.
    // Without idleness the clock pins at the stall point and the tail
    // windows never emit (WatermarkMuxSpec pins that contrast); the
    // oracle counts ALL sent rows, so an unpinned clock is required for
    // the hash to match.
    "q_stream_idle" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = sortedEvents(s, dir)
      val us = rows.map(e => micros(e.ts))
      val cutoff = us.min + (us.max - us.min) / 3
      val sent = rows.filter(e => e.user_id % 2 == 0 || micros(e.ts) < cutoff)
      val tagged = sent.map(e =>
        ((e.user_id % 2).toInt, (e.event_type, e.ts.getTime)))
      val rounds = chunks(tagged, 6) ++ Seq(
        Seq((0, ("sentinel", rows.last.ts.getTime + 10L * 86400000L))),
        Seq.empty)
      val input = MemoryStream[graft.streaming.WatermarkMux.MuxIn]
      val out = graft.streaming.WatermarkMux.idleTumbleCounts(
        input.toDS(), windowMs = 3600000L)
      runToEnd(s, input, out,
        graft.streaming.WatermarkMux.stamp(rounds, delayMs = 0L,
          idleTimeoutRounds = 2),
        mode = "append", rocks = true)
        .filter($"etype" =!= "sentinel")
        .select(timestamp_millis($"ws").cast("timestamp_ntz")
          .as("window_start"), $"etype".as("event_type"), $"n")
        .orderBy($"window_start", $"event_type")
    }),

    // Watermark alignment (WatermarkStrategy.withWatermarkAlignment —
    // the source coordinator's pause/resume protocol): an unbalanced
    // split (25% of users on the fast partition) drains through
    // WatermarkMux.alignRounds, which pauses whichever source runs more
    // than maxDrift ahead of the group min, then replays through the
    // stamped-clock tumble operator. Alignment must change PACING, not
    // results: a lost, duplicated, or clock-outrun row (the stamped
    // operator drops closed-window arrivals) diverges the count hash
    // from the plain batch tumble oracle over all events.
    "q_stream_aligned" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = sortedEvents(s, dir)
      val fast = rows.filter(_.user_id % 4 == 0)
        .map(e => (e.event_type, e.ts.getTime)).toVector
      val slow = rows.filter(_.user_id % 4 != 0)
        .map(e => (e.event_type, e.ts.getTime)).toVector
      val spanMs = (rows.last.ts.getTime - rows.head.ts.getTime).max(1L)
      val rounds = graft.streaming.WatermarkMux.alignRounds(
        Map(0 -> fast, 1 -> slow), (r: (String, Long)) => r._2,
        maxDriftMs = spanMs / 10, rowsPerRound = (slow.size / 6).max(1))
      val sentinelTs = rows.last.ts.getTime + 10L * 86400000L
      val allRounds = rounds ++ Seq(
        Seq((0, ("sentinel", sentinelTs)), (1, ("sentinel", sentinelTs))),
        Seq.empty[(Int, (String, Long))])
      val input = MemoryStream[graft.streaming.WatermarkMux.MuxIn]
      val out = graft.streaming.WatermarkMux.idleTumbleCounts(
        input.toDS(), windowMs = 3600000L)
      runToEnd(s, input, out,
        graft.streaming.WatermarkMux.stamp(allRounds, delayMs = 0L,
          idleTimeoutRounds = 1000000),
        mode = "append", rocks = true)
        .filter($"etype" =!= "sentinel")
        .select(timestamp_millis($"ws").cast("timestamp_ntz")
          .as("window_start"), $"etype".as("event_type"), $"n")
        .orderBy($"window_start", $"event_type")
    })
  )

  /** Shared by q_stream_groupagg (per-record emission) and
    * q_stream_minibatch (one step per key per batch): both protocols
    * must fold to this aggregate over surviving rows.
    */
  private val groupAggOracle =
    """SELECT event_type, CAST(SUM(event_id) AS BIGINT) AS sum_id, COUNT(*) AS n
      |FROM events WHERE event_id % 3 = 0 AND event_id % 5 <> 0
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Shared by q_stream_tumble (complete mode) and q_stream_late
    * (append mode + watermark): the late-drop gate is precisely "same
    * output as the tumble aggregate", so both rows must assert against
    * ONE oracle text.
    */
  private val tumbleOracle =
    """WITH e AS (SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type, value FROM events)
      |SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
      |  time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM e GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_stream_tumble" -> tumbleOracle,

    // the SAME oracle constant as q_stream_tumble BY CONSTRUCTION: the
    // late re-sends and the sentinel must leave NO trace in the
    // append-mode output
    "q_stream_late" -> tumbleOracle,

    "q_stream_dedup_last" ->
      """WITH e AS (SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type, value FROM events)
        |SELECT user_id, event_id AS last_event_id, value AS last_value FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM e)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_stream_rank" ->
      """SELECT event_type, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
        |  FROM events)
        |WHERE rn <= 3 ORDER BY event_type, event_id""".stripMargin,

    "q_stream_topn" ->
      """SELECT event_type, event_id AS id FROM (
        |  SELECT event_type, event_id,
        |    row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
        |  FROM events WHERE event_id % 3 = 0 AND event_id % 7 <> 0)
        |WHERE rn <= 3 ORDER BY event_type, id""".stripMargin,

    "q_stream_asof" ->
      """WITH e AS (SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type, value FROM events WHERE user_id % 2 = 0),
        |p AS (SELECT event_id AS p_id, user_id, ts FROM e WHERE event_type = 'purchase'),
        |v AS (SELECT event_id AS v_id, user_id, ts, value AS v_value FROM e WHERE event_type = 'view')
        |SELECT p.p_id, v.v_id AS r_v_id, v.v_value AS r_v_value
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
        |ORDER BY p_id""".stripMargin,

    "q_stream_hop" ->
      """WITH e AS (SELECT make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type, value FROM events)
        |SELECT ws AS window_start, ws + INTERVAL 1 HOUR AS window_end,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM e, UNNEST([time_bucket(INTERVAL 30 MINUTE, ts),
        |                time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS u(ws)
        |GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin,

    "q_stream_interval" ->
      """SELECT p.event_id AS p_id, e.event_id AS e_id
        |FROM (SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events WHERE event_type = 'purchase' AND user_id % 2 = 0) p
        |JOIN (SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events WHERE event_type = 'error' AND user_id % 2 = 0) e
        |ON p.user_id = e.user_id
        | AND e.ts >= p.ts - INTERVAL 1 HOUR
        | AND e.ts <= p.ts
        |ORDER BY p_id, e_id""".stripMargin,

    "q_stream_groupagg" -> groupAggOracle,

    "q_stream_minmax" ->
      """WITH surv AS (
        |  SELECT event_type, event_id FROM (
        |    SELECT event_type, event_id,
        |      row_number() OVER (PARTITION BY event_type ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_id % 3 = 0) WHERE rn > 10)
        |SELECT event_type, CAST(MAX(event_id) AS BIGINT) AS max_id, COUNT(*) AS n
        |FROM surv GROUP BY event_type ORDER BY event_type""".stripMargin,

    // mini-batch emission must fold to the SAME end state per-record
    // emission does — one shared oracle constant by construction
    "q_stream_minibatch" -> groupAggOracle,

    "q_stream_outer" ->
      """WITH p AS (SELECT user_id, event_id AS p_id, value AS p_value FROM events WHERE event_type = 'purchase' AND user_id % 2 = 0),
        |v AS (SELECT user_id, event_id AS v_id, value AS v_value FROM events WHERE event_type = 'view' AND event_id % 3 <> 0 AND user_id % 2 = 0)
        |SELECT COALESCE(p.user_id, v.user_id) AS user_id, p.p_id, p.p_value, v.v_id, v.v_value
        |FROM p FULL OUTER JOIN v ON p.user_id = v.user_id
        |ORDER BY user_id, p_id, v_id""".stripMargin,

    "q_stream_over" ->
      """WITH e AS (SELECT event_id, event_type, make_timestamp(epoch_ns(ts) // 1000) AS ts
        |           FROM events WHERE event_type IN ('purchase', 'error') AND user_id % 2 = 0)
        |SELECT event_type, event_id,
        |  CAST(SUM(event_id) OVER w AS BIGINT) AS moving_sum,
        |  ROW_NUMBER() OVER w AS n
        |FROM e
        |WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |             ROWS UNBOUNDED PRECEDING)
        |ORDER BY event_type, event_id""".stripMargin,

    "q_stream_cep" ->
      """WITH o AS (
        |  SELECT user_id, event_type, event_id,
        |    lead(event_type) OVER w AS next_type,
        |    lead(event_id) OVER w AS next_id
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY make_timestamp(epoch_ns(ts) // 1000), event_id))
        |SELECT user_id, event_id AS purchase_id, next_id AS error_id
        |FROM o WHERE event_type = 'purchase' AND next_type = 'error'
        |ORDER BY user_id, purchase_id""".stripMargin,

    "q_stream_ptjoin" ->
      """WITH e AS (SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type, value FROM events),
        |v AS (SELECT event_id, user_id, ts, value FROM e WHERE event_type = 'view'),
        |le AS (SELECT user_id, event_id AS v_id, value AS v_value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |       FROM v WHERE event_id % 2 = 0),
        |lo AS (SELECT user_id, event_id AS v_id, value AS v_value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |       FROM v WHERE event_id % 2 = 1),
        |u AS (SELECT DISTINCT user_id FROM v),
        |codd AS (SELECT u.user_id,
        |           COALESCE(lo1.v_id, le1.v_id) AS v_id,
        |           COALESCE(lo1.v_value, le1.v_value) AS v_value
        |         FROM u
        |         LEFT JOIN (SELECT * FROM lo WHERE rn = 1) lo1 ON u.user_id = lo1.user_id
        |         LEFT JOIN (SELECT * FROM le WHERE rn = 1) le1 ON u.user_id = le1.user_id),
        |cand AS (SELECT user_id, v_id, v_value, 0 AS par FROM le WHERE rn = 1
        |         UNION ALL
        |         SELECT user_id, v_id, v_value, 1 AS par FROM codd),
        |p AS (SELECT event_id AS p_id, user_id, CAST(event_id % 2 AS INT) AS par
        |      FROM e WHERE event_type = 'purchase')
        |SELECT p.p_id, c.v_id AS r_v_id, c.v_value AS r_v_value
        |FROM p LEFT JOIN cand c ON p.user_id = c.user_id AND p.par = c.par
        |ORDER BY p_id""".stripMargin,

    "q_stream_top1" ->
      """WITH e AS (SELECT event_type, event_id,
        |  CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents FROM events)
        |SELECT event_type, event_id, cents FROM (
        |  SELECT event_type, event_id, cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rn
        |  FROM e)
        |WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "q_stream_firstn" ->
      """WITH e AS (SELECT user_id, event_id,
        |  CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us FROM events)
        |SELECT user_id, event_id, ts_us FROM (
        |  SELECT user_id, event_id, ts_us,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS rn
        |  FROM e)
        |WHERE rn <= 3 ORDER BY user_id, event_id""".stripMargin,

    "q_stream_lateness" ->
      """WITH e AS (SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type FROM events),
        |mx AS (SELECT MAX(ts) AS m FROM e),
        |okre AS (SELECT e.* FROM e, mx WHERE ts > m - INTERVAL 1 HOUR),
        |latere AS (SELECT e.* FROM e, mx
        |           WHERE ts >= m - INTERVAL 9 HOUR + INTERVAL 1 SECOND
        |             AND time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 3 HOUR <= m),
        |counted AS (SELECT ts, event_type FROM e
        |            UNION ALL SELECT ts, event_type FROM okre)
        |SELECT FALSE AS late, event_type,
        |  CAST(epoch_ms(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS ws_ms,
        |  COUNT(*) AS n, CAST(-1 AS BIGINT) AS id
        |FROM counted GROUP BY 2, 3
        |UNION ALL
        |SELECT TRUE, event_type,
        |  CAST(epoch_ms(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT),
        |  CAST(-1 AS BIGINT), event_id + 9000000
        |FROM latere
        |ORDER BY late, event_type, ws_ms, id""".stripMargin,

    "q_stream_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        |FROM events WHERE event_id % 4 <> 0 AND user_id % 2 = 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // same result as the batch window join by construction
    "q_stream_winjoin" ->
      """WITH e AS (SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type FROM events),
        |c AS (SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w, user_id, event_id AS click_id
        |      FROM e WHERE event_type = 'click'),
        |p AS (SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w, user_id, event_id AS purchase_id
        |      FROM e WHERE event_type = 'purchase')
        |SELECT c.w AS window_start, c.user_id AS user_id, click_id, purchase_id
        |FROM c JOIN p ON c.w = p.w AND c.user_id = p.user_id
        |ORDER BY window_start, c.user_id, click_id, purchase_id""".stripMargin,

    // the coGroup result equals the FULL OUTER join of the two
    // per-window batch aggregates (one-sided keys included)
    "q_stream_cogroup" ->
      """WITH e AS (SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type, value
        |           FROM events WHERE event_type IN ('click', 'purchase')),
        |c AS (SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w, user_id, COUNT(*) AS n,
        |        SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS cents
        |      FROM e WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w, user_id, COUNT(*) AS n,
        |        SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS cents
        |      FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT COALESCE(c.w, p.w) AS window_start,
        |  COALESCE(c.user_id, p.user_id) AS user_id,
        |  CAST(COALESCE(c.n, 0) AS BIGINT) AS n_clicks,
        |  CAST(COALESCE(p.n, 0) AS BIGINT) AS n_purchases,
        |  CAST(COALESCE(c.cents, 0) + COALESCE(p.cents, 0) AS BIGINT) AS sum_cents
        |FROM c FULL OUTER JOIN p ON c.w = p.w AND c.user_id = p.user_id
        |ORDER BY window_start, user_id""".stripMargin,

    // sliding assignment = each event in the bucket it starts AND the
    // one before (size 2h, slide 1h)
    "q_stream_coslide" ->
      """WITH e AS (SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type, value
        |           FROM events
        |           WHERE event_type IN ('click', 'purchase') AND user_id % 5 = 0),
        |ex AS (SELECT user_id, event_type, value, time_bucket(INTERVAL 1 HOUR, ts) AS w FROM e
        |       UNION ALL
        |       SELECT user_id, event_type, value, time_bucket(INTERVAL 1 HOUR, ts) - INTERVAL 1 HOUR FROM e),
        |c AS (SELECT w, user_id, COUNT(*) AS n,
        |        SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS cents
        |      FROM ex WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT w, user_id, COUNT(*) AS n,
        |        SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS cents
        |      FROM ex WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT COALESCE(c.w, p.w) AS window_start,
        |  COALESCE(c.user_id, p.user_id) AS user_id,
        |  CAST(COALESCE(c.n, 0) AS BIGINT) AS n_clicks,
        |  CAST(COALESCE(p.n, 0) AS BIGINT) AS n_purchases,
        |  CAST(COALESCE(c.cents, 0) + COALESCE(p.cents, 0) AS BIGINT) AS sum_cents
        |FROM c FULL OUTER JOIN p ON c.w = p.w AND c.user_id = p.user_id
        |ORDER BY window_start, user_id""".stripMargin,

    // sessions over the union of both sides (1h gap), per-side counts +
    // exact cents in one grouped pass; ties among equal timestamps don't
    // affect the island assignment (diff 0 ≤ gap)
    "q_stream_cosession" ->
      """WITH e AS (SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type, value
        |           FROM events
        |           WHERE event_type IN ('click', 'purchase') AND user_id % 3 = 0),
        |m AS (SELECT user_id, ts, event_type, value,
        |  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) <= INTERVAL 1 HOUR
        |    THEN 0 ELSE 1 END AS new_s FROM e),
        |s AS (SELECT user_id, ts, event_type, value,
        |  SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT MIN(ts) AS window_start, user_id,
        |  CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_clicks,
        |  CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchases,
        |  CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM s GROUP BY user_id, sid
        |ORDER BY window_start, user_id""".stripMargin,

    // per-user gaps-and-islands firsts at the 6-hour gap — ms-truncated
    // timestamps on both engines
    "q_stream_dedup_ttl" ->
      """WITH e AS (SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events WHERE user_id % 2 = 0),
        |g AS (SELECT user_id, event_id,
        |    epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
        |  FROM e)
        |SELECT user_id, event_id FROM g
        |WHERE gap_ms IS NULL OR gap_ms > 21600000
        |ORDER BY user_id, event_id""".stripMargin,

    // totals over ALL events for users active after the handover cutoff
    // (phase-2 keys); the history half reaches the result only through
    // the checkpoint→read→bootstrap cycle
    "q_state_bootstrap" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS usec,
        |  CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents FROM events),
        |c AS (SELECT MIN(usec) + (MAX(usec) - MIN(usec)) // 2 AS cutoff FROM e)
        |SELECT user_id, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM e GROUP BY user_id
        |HAVING MAX(usec) >= (SELECT cutoff FROM c)
        |ORDER BY user_id""".stripMargin,

    // exactly the rows the idleness replay sends: even-parity users in
    // full, odd-parity users only before the one-third time cutoff (the
    // stall point) — integer micros arithmetic on both engines
    "q_stream_idle" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type FROM events),
        |c AS (SELECT MIN(us) + (MAX(us) - MIN(us)) // 3 AS cutoff FROM e)
        |SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, event_type, COUNT(*) AS n
        |FROM e WHERE user_id % 2 = 0 OR us < (SELECT cutoff FROM c)
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    // alignment changes pacing, never results: the full tumble counts
    "q_stream_aligned" ->
      """WITH e AS (SELECT make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type FROM events)
        |SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, event_type, COUNT(*) AS n
        |FROM e GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "q_sink_upsert" ->
      """WITH e AS (SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, value FROM events)
        |SELECT user_id, event_id AS last_event_id, value AS last_value FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM e)
        |WHERE rn = 1 AND user_id % 5 <> 0 ORDER BY user_id""".stripMargin,

    "q_stream_session" ->
      """WITH e AS (SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events WHERE user_id % 3 = 0),
        |m AS (SELECT user_id, event_id, ts,
        |  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) <= INTERVAL 1 HOUR
        |    THEN 0 ELSE 1 END AS new_s FROM e),
        |s AS (SELECT user_id, event_id, ts,
        |  SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, event_id,
        |  MIN(ts) OVER (PARTITION BY user_id, sid) AS window_start,
        |  MAX(ts) OVER (PARTITION BY user_id, sid) + INTERVAL 1 HOUR AS window_end
        |FROM s ORDER BY user_id, event_id""".stripMargin
  )
}
