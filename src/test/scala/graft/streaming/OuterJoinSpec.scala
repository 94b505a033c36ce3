package graft.streaming

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.SparkSuite
import OuterJoin._

/** Retraction semantics of the stream-stream inner/outer join, mirroring
  * the reference's StreamingJoinOperator tests
  * (flink-table-runtime/.../operators/join/stream/StreamingJoinOperator.java:36
  * retract cases, exercised by flink-table-planner JoinITCase):
  *
  *   - an outer-side row with no matches emits null-padded +I;
  *   - the FIRST match on the other side retracts the padding (-D padded)
  *     then emits the joined row;
  *   - the LAST match leaving retracts the joined row and re-emits padding;
  *   - a retraction for a row never inserted is dropped;
  *   - duplicate rows carry multiplicity (association counting).
  */
class OuterJoinSpec extends SparkSuite {
  import spark.implicits._

  type In = JoinInput[String, Long, String]
  type Out = JoinOutput[String, Long, String]
  implicit val inEnc: Encoder[In] = Encoders.product[In]
  implicit val outEnc: Encoder[Out] = Encoders.product[Out]

  private val I = Changelog.Insert
  private val D = Changelog.Delete

  private def run(jt: JoinType, batches: Seq[Seq[In]]): Seq[Seq[Out]] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[In]
    val out = input.toDS().groupByKey(_.key)
      .transformWithState(
        new OuterJoinProcessor[String, Long, String](jt,
          Encoders.scalaLong, Encoders.STRING),
        TimeMode.None(), OutputMode.Update())
    val name = s"oj_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt")).start()
    try {
      val emitted = scala.collection.mutable.ArrayBuffer.empty[Seq[Out]]
      var seen = 0
      batches.foreach { b =>
        input.addData(b)
        q.processAllAvailable()
        val all = spark.table(name).as[Out].collect().toSeq
        emitted += all.drop(seen)
        seen = all.length
      }
      emitted.toSeq
    } finally q.stop()
  }

  private def addL(l: Long): In = JoinInput.addLeft("k", l)
  private def addR(r: String): In = JoinInput.addRight("k", r)
  private def retL(l: Long): In = JoinInput.retractLeft("k", l)
  private def retR(r: String): In = JoinInput.retractRight("k", r)

  test("left outer: pad, retract-on-first-match, re-pad on last retract") {
    val out = run(LeftOuter, Seq(
      Seq(addL(1L)),   // no right yet → padded
      Seq(addR("a")),  // first match → retract padding, emit join
      Seq(addR("b")),  // second match → just emit join
      Seq(retR("b")),  // retract one match
      Seq(retR("a")),  // LAST match leaves → retract join, re-pad
      Seq(retL(1L))))  // left leaves → retract padding
    assert(out(0) == Seq(JoinOutput[String, Long, String](I, "k", Some(1L), None)))
    assert(out(1) == Seq(
      JoinOutput[String, Long, String](D, "k", Some(1L), None),
      JoinOutput[String, Long, String](I, "k", Some(1L), Some("a"))))
    assert(out(2) == Seq(JoinOutput[String, Long, String](I, "k", Some(1L), Some("b"))))
    assert(out(3) == Seq(JoinOutput[String, Long, String](D, "k", Some(1L), Some("b"))))
    assert(out(4) == Seq(
      JoinOutput[String, Long, String](D, "k", Some(1L), Some("a")),
      JoinOutput[String, Long, String](I, "k", Some(1L), None)))
    assert(out(5) == Seq(JoinOutput[String, Long, String](D, "k", Some(1L), None)))
  }

  test("left outer: right side arriving first emits nothing until left") {
    val out = run(LeftOuter, Seq(
      Seq(addR("a")),  // right is not the outer side → silent
      Seq(addL(1L))))  // join emitted, no padding ever existed
    assert(out(0).isEmpty)
    assert(out(1) == Seq(JoinOutput[String, Long, String](I, "k", Some(1L), Some("a"))))
  }

  test("full outer: both sides pad and retract symmetrically") {
    val out = run(FullOuter, Seq(
      Seq(addR("a")),  // padded right
      Seq(addL(1L)),   // retract right padding, emit join
      Seq(retL(1L))))  // retract join, re-pad right
    assert(out(0) == Seq(JoinOutput[String, Long, String](I, "k", None, Some("a"))))
    assert(out(1) == Seq(
      JoinOutput[String, Long, String](D, "k", None, Some("a")),
      JoinOutput[String, Long, String](I, "k", Some(1L), Some("a"))))
    assert(out(2) == Seq(
      JoinOutput[String, Long, String](D, "k", Some(1L), Some("a")),
      JoinOutput[String, Long, String](I, "k", None, Some("a"))))
  }

  test("inner: no padding, join rows only") {
    val out = run(Inner, Seq(
      Seq(addL(1L)),   // silent (inner)
      Seq(addR("a")),  // join
      Seq(retR("a")))) // retract join, no re-pad
    assert(out(0).isEmpty)
    assert(out(1) == Seq(JoinOutput[String, Long, String](I, "k", Some(1L), Some("a"))))
    assert(out(2) == Seq(JoinOutput[String, Long, String](D, "k", Some(1L), Some("a"))))
  }

  test("duplicate rows carry multiplicity (association counting)") {
    val out = run(LeftOuter, Seq(
      Seq(addL(1L)),
      Seq(addL(1L)),   // duplicate left → second padded insert
      Seq(addR("a")),  // retract BOTH paddings? no: padding retraction is per left row
      Seq(retL(1L))))  // one copy leaves → retract one join row
    assert(out(0) == Seq(JoinOutput[String, Long, String](I, "k", Some(1L), None)))
    assert(out(1) == Seq(JoinOutput[String, Long, String](I, "k", Some(1L), None)))
    // first right match: every left copy's padding retracted, join emitted per copy
    assert(out(2).count(o => o.kind == D && o.right.isEmpty) == 2)
    assert(out(2).count(o => o.kind == I && o.right == Some("a")) == 2)
    assert(out(3) == Seq(JoinOutput[String, Long, String](D, "k", Some(1L), Some("a"))))
  }

  test("retraction for a row never inserted is dropped") {
    val out = run(LeftOuter, Seq(
      Seq(retL(7L)),
      Seq(addL(1L))))
    assert(out(0).isEmpty)
    assert(out(1) == Seq(JoinOutput[String, Long, String](I, "k", Some(1L), None)))
  }

  test("keys are independent") {
    val out = run(LeftOuter, Seq(
      Seq(JoinInput.addLeft[String, Long, String]("a", 1L),
          JoinInput.addRight[String, Long, String]("b", "x")),
      Seq(JoinInput.addLeft[String, Long, String]("b", 2L))))
    assert(out(0) == Seq(JoinOutput[String, Long, String](I, "a", Some(1L), None)))
    assert(out(1) == Seq(JoinOutput[String, Long, String](I, "b", Some(2L), Some("x"))))
  }

  test("outerJoin dataset entry point composes with Changelog.materialize") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(String, Byte, Long)]
    val rIn = MemoryStream[(String, Byte, String)]
    val joined = outerJoin[String, Long, String](lIn.toDS(), rIn.toDS(), LeftOuter)
    val name = s"ojm_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("update").option("checkpointLocation", tmpDir("ckpt")).start()
    try {
      // left rows 1,2 under key k1; right "a" matches k1; k2 left stays padded
      lIn.addData(("k1", I, 1L), ("k2", I, 2L))
      q.processAllAvailable()
      rIn.addData(("k1", I, "a"))
      q.processAllAvailable()
      rIn.addData(("k1", D, "a")) // last match leaves → k1 re-padded
      q.processAllAvailable()

      val outs = spark.table(name).as[Out].collect().toSeq
      val changelog = outs.zipWithIndex.map { case (o, i) =>
        (o.kind, o.key, o.left, o.right, i.toLong)
      }.toDF(Changelog.RowKindCol, "key", "l", "r", "seq")
      val fin = Changelog.materialize(changelog, Seq("key", "l", "r"), "seq")
        .select("key", "l", "r").as[(String, Option[Long], Option[String])]
        .collect().toSet
      // final table = final left state left-outer-joined with final right state
      assert(fin == Set(("k1", Some(1L), None), ("k2", Some(2L), None)))
    } finally q.stop()
  }
}
