package graft.streaming

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.SparkSuite
import OuterJoin._

/** Model-based randomized check of the stream-stream join: many
  * independent keys each run a random insert/retract scenario (split
  * across micro-batches); for every key, folding the emitted changelog
  * (+I/+U add, -D/-U remove, multiset) must converge to the brute-force
  * join of the FINAL left/right multisets — the changelog-consistency
  * guarantee the reference's association counting provides.
  */
class OuterJoinModelSpec extends SparkSuite {
  import spark.implicits._

  type In = JoinInput[String, Long, Long]
  type Out = JoinOutput[String, Long, Long]
  implicit val inEnc: Encoder[In] = Encoders.product[In]
  implicit val outEnc: Encoder[Out] = Encoders.product[Out]

  private val Keys = 40
  private val Batches = 4
  private val OpsPerBatch = 4

  /** Per key: random ops; retractions target previously inserted values
    * half the time (valid) and random values otherwise (mostly dropped).
    */
  private def scenario(rng: scala.util.Random, key: String): Seq[Seq[In]] = {
    val insertedL = scala.collection.mutable.ArrayBuffer.empty[Long]
    val insertedR = scala.collection.mutable.ArrayBuffer.empty[Long]
    Seq.fill(Batches)(Seq.fill(OpsPerBatch) {
      val left = rng.nextBoolean()
      val add = rng.nextInt(3) != 0 // 2/3 inserts
      val v =
        if (add) rng.nextInt(4).toLong
        else {
          val pool = if (left) insertedL else insertedR
          if (pool.nonEmpty && rng.nextBoolean()) pool(rng.nextInt(pool.length))
          else rng.nextInt(4).toLong
        }
      if (add && left) insertedL += v
      if (add && !left) insertedR += v
      if (left) JoinInput[String, Long, Long](key, isLeft = true, add, Some(v), None)
      else JoinInput[String, Long, Long](key, isLeft = false, add, None, Some(v))
    })
  }

  /** The model: apply ops to multisets (dropping invalid retractions,
    * as the operator does), then join.
    */
  private def expected(ops: Seq[In], jt: JoinType): Map[(Option[Long], Option[Long]), Int] = {
    val l = scala.collection.mutable.Map.empty[Long, Int].withDefaultValue(0)
    val r = scala.collection.mutable.Map.empty[Long, Int].withDefaultValue(0)
    ops.foreach { op =>
      val side = if (op.isLeft) l else r
      val v = if (op.isLeft) op.left.get else op.right.get
      if (op.isAdd) side(v) += 1
      else if (side(v) > 0) { side(v) -= 1; if (side(v) == 0) side.remove(v) }
    }
    val out = scala.collection.mutable.Map.empty[(Option[Long], Option[Long]), Int]
      .withDefaultValue(0)
    val lEmpty = l.values.sum == 0
    val rEmpty = r.values.sum == 0
    if (!lEmpty && !rEmpty)
      for ((lv, ln) <- l; (rv, rn) <- r) out((Some(lv), Some(rv))) += ln * rn
    else if (!lEmpty && jt.leftOuter)
      for ((lv, ln) <- l) out((Some(lv), None)) += ln
    else if (!rEmpty && jt.rightOuter)
      for ((rv, rn) <- r) out((None, Some(rv))) += rn
    out.toMap
  }

  private def foldChangelog(outs: Seq[Out]): Map[(Option[Long], Option[Long]), Int] = {
    val m = scala.collection.mutable.Map.empty[(Option[Long], Option[Long]), Int]
      .withDefaultValue(0)
    outs.foreach { o =>
      val k = (o.left, o.right)
      if (Changelog.isAdd(o.kind)) m(k) += 1
      else { m(k) -= 1; if (m(k) == 0) m.remove(k) }
    }
    m.toMap
  }

  private def runModel(jt: JoinType, seed: Int): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(seed)
    val scenarios = (0 until Keys).map(i => s"k$i" -> scenario(rng, s"k$i")).toMap
    val input = MemoryStream[In]
    val out = input.toDS().groupByKey(_.key)
      .transformWithState(
        new OuterJoinProcessor[String, Long, Long](jt,
          Encoders.scalaLong, Encoders.scalaLong),
        TimeMode.None(), OutputMode.Update())
    val name = s"ojm_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt")).start()
    try {
      (0 until Batches).foreach { b =>
        input.addData(scenarios.values.flatMap(_(b)).toSeq)
        q.processAllAvailable()
      }
      val emitted = spark.table(name).as[Out].collect().toSeq.groupBy(_.key)
      scenarios.foreach { case (key, batches) =>
        val got = foldChangelog(emitted.getOrElse(key, Nil))
        val want = expected(batches.flatten, jt)
        assert(got == want,
          s"$jt key=$key: changelog folded to $got, model says $want " +
            s"(ops=${batches.flatten})")
      }
    } finally q.stop()
  }

  test("FullOuter: changelog converges to the model on 40 random keys") {
    runModel(FullOuter, seed = 11)
  }
  test("LeftOuter: changelog converges to the model on 40 random keys") {
    runModel(LeftOuter, seed = 22)
  }
  test("RightOuter: changelog converges to the model on 40 random keys") {
    runModel(RightOuter, seed = 33)
  }
  test("Inner: changelog converges to the model on 40 random keys") {
    runModel(Inner, seed = 44)
  }
}
