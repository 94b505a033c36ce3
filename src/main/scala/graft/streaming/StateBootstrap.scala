package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** State bootstrap — the WRITE side of the reference's State Processor
  * API (flink-state-processing-api `SavepointWriter` /
  * `OperatorTransformation.bootstrapWith`): build keyed operator state
  * OFFLINE from a batch dataset and start a NEW streaming job already
  * holding it. Combined with [[StateReader]] (the read side) this closes
  * the savepoint-rewrite loop: stop a query, read its checkpoint state
  * as a DataFrame, transform it declaratively (drop keys, migrate
  * schemas, rescale values), and boot a successor query from the result.
  *
  * Spark-first: `transformWithState` accepts an INITIAL STATE
  * KeyValueGroupedDataset — the engine shuffles the bootstrap frame by
  * the stream's key and hands each key's row to
  * `handleInitialState` before the first batch, which is exactly the
  * reference's bootstrap semantics (state writer runs as a batch job;
  * the new job starts from the produced savepoint). No driver
  * collection anywhere: at scale the bootstrap frame is just one more
  * keyed shuffle, sized by keys, not by the history that produced it.
  *
  * [[BootstrapAggProcessor]] is the canonical keyed running aggregate
  * (count + integer cents sum, bit-exact across engines): each batch
  * folds locally and emits ONE running-total row per touched key
  * (mini-batch emission), continuing seamlessly from whatever the
  * bootstrap loaded.
  */
object StateBootstrap {

  case class BIn(key: String, cents: Long)
  /** Bootstrap row: a key's accumulator as of the handover point. */
  case class BInit(key: String, n: Long, cents: Long)
  case class BAcc(n: Long, cents: Long)
  case class BOut(key: String, n: Long, cents: Long)

  class BootstrapAggProcessor
      extends StatefulProcessorWithInitialState[String, BIn, BOut, BInit] {
    @transient private var acc: ValueState[BAcc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[BAcc]("acc",
        Encoders.product[BAcc], TTLConfig.NONE)

    override def handleInitialState(key: String, initialState: BInit,
        timerValues: TimerValues): Unit =
      acc.update(BAcc(initialState.n, initialState.cents))

    override def handleInputRows(key: String, rows: Iterator[BIn],
        timerValues: TimerValues): Iterator[BOut] = {
      var dn = 0L
      var dc = 0L
      rows.foreach { r => dn += 1L; dc += r.cents }
      val cur = if (acc.exists()) acc.get() else BAcc(0L, 0L)
      val next = BAcc(cur.n + dn, cur.cents + dc)
      acc.update(next)
      Iterator.single(BOut(key, next.n, next.cents))
    }
  }

  /** Keyed running aggregate over `in`, starting from `bootstrap` (one
    * row per key; keys absent from it start empty).
    */
  def agg(in: Dataset[BIn], bootstrap: Dataset[BInit]): DataFrame = {
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[BOut]
    implicit val initEnc = Encoders.product[BInit]
    in.groupByKey(_.key)
      .transformWithState(new BootstrapAggProcessor,
        TimeMode.None(), OutputMode.Update(),
        bootstrap.groupByKey(_.key))
      .toDF()
  }

  /** The read→rewrite leg: a stopped [[BootstrapAggProcessor]] query's
    * "acc" state variable, decoded from its checkpoint back into
    * bootstrap rows (feed the result — transformed or not — to [[agg]]
    * of the successor query).
    */
  def readAccState(spark: org.apache.spark.sql.SparkSession,
      checkpoint: String): Dataset[BInit] = {
    import org.apache.spark.sql.functions.col
    implicit val initEnc = Encoders.product[BInit]
    StateReader.stateVar(spark, checkpoint, "acc")
      .select(col("key.value").as("key"), col("value.n").as("n"),
        col("value.cents").as("cents"))
      .as[BInit]
  }
}
