package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite

/** Processing-time temporal join (ProcTimeJoin.procTimeJoin) — the
  * reference's TemporalProcessTimeJoinOperator contract: probes join the
  * build side's CURRENT version at arrival; build updates take effect for
  * everything after them, including later probes in the same batch.
  */
// one tagged input stream so in-batch interleaving is the feed order:
// isProbe=true rows probe, false rows upsert (kind 3 = delete)
case class PtjIn(isProbe: Boolean, kind: Byte, user: Long, id: Long, v: Long)

class ProcTimeJoinSpec extends SparkSuite {
  import spark.implicits._

  private def run(batches: Seq[Seq[PtjIn]], leftOuter: Boolean = true): Seq[Row] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PtjIn]
    val all = input.toDS()
    val probes = all.filter(_.isProbe)
      .select($"user", $"id").toDF("user", "p_id")
    val builds = all.filter(!_.isProbe)
      .select($"user", $"v", $"kind".as(Changelog.RowKindCol))
    val joined = ProcTimeJoin.procTimeJoin(
      probes, builds, Seq("user"), Seq("v"), leftOuter = leftOuter)
    val name = s"ptj_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ptj_ckpt")).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  private def asTuples(rows: Seq[Row]): Set[(Long, Long, Option[Long])] =
    rows.map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

  test("probe joins latest version; updates overwrite across batches") {
    val out = run(Seq(
      Seq(PtjIn(false, Changelog.Insert, 1, 0, 100)),     // v=100
      Seq(PtjIn(true, 0, 1, 10, 0)),                      // probe -> 100
      Seq(PtjIn(false, Changelog.UpdateAfter, 1, 0, 200)), // v=200
      Seq(PtjIn(true, 0, 1, 11, 0))))                     // probe -> 200
    assert(asTuples(out) == Set((1L, 10L, Some(100L)), (1L, 11L, Some(200L))))
  }

  test("no version yet: left-outer null-pads, inner drops") {
    val batches = Seq(Seq(PtjIn(true, 0, 7, 1, 0)),
      Seq(PtjIn(false, Changelog.Insert, 7, 0, 5)), Seq(PtjIn(true, 0, 7, 2, 0)))
    assert(asTuples(run(batches)) ==
      Set((7L, 1L, None), (7L, 2L, Some(5L))))
    assert(asTuples(run(batches, leftOuter = false)) ==
      Set((7L, 2L, Some(5L))))
  }

  test("build-side delete clears the version") {
    val out = run(Seq(
      Seq(PtjIn(false, Changelog.Insert, 3, 0, 9)),
      Seq(PtjIn(true, 0, 3, 1, 0)),
      Seq(PtjIn(false, Changelog.Delete, 3, 0, 0)),
      Seq(PtjIn(true, 0, 3, 2, 0))))
    assert(asTuples(out) == Set((3L, 1L, Some(9L)), (3L, 2L, None)))
  }

  test("same-batch update is visible to later probes in that batch") {
    // the tagged single-stream entry pins the exact interleave — a
    // two-sided union cannot order across sides (two network inputs)
    import org.apache.spark.sql.functions.{col, lit, struct, when}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PtjIn]
    val tagged = input.toDS().toDF()
      .select(col("user").cast("string").as("__pj_key"),
        col("isProbe").as("__pj_probe"), col("kind").as("__pj_kind"),
        when(col("isProbe"),
          struct(col("user"), col("id").as("p_id"))).as("__pj_l"),
        when(!col("isProbe"), struct(col("v"))).as("__pj_r"))
    val leftSchema = StructType(Seq(StructField("user", LongType),
      StructField("p_id", LongType)))
    val rightStruct = StructType(Seq(StructField("v", LongType)))
    val joined = ProcTimeJoin.joinTagged(tagged, leftSchema, rightStruct)
    val name = s"ptj_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ptj_ckpt")).start()
    val out = try {
      input.addData(Seq(
        PtjIn(false, Changelog.Insert, 5, 0, 1),
        PtjIn(true, 0.toByte, 5, 1, 0),
        PtjIn(false, Changelog.UpdateAfter, 5, 0, 2),
        PtjIn(true, 0.toByte, 5, 2, 0)))
      q.processAllAvailable()
      spark.table(name).collect().toSeq
    } finally q.stop()
    assert(asTuples(out) == Set((5L, 1L, Some(1L)), (5L, 2L, Some(2L))))
  }
}
