package graft.operators

import org.apache.spark.sql.Row

import graft.SparkSuite

/** The FOR SYSTEM_TIME AS OF SQL front door: span parsing, alias
  * qualifier rewriting, differing key/version-time column names, and
  * loud errors on malformed statements.
  */
class TemporalJoinSqlSpec extends SparkSuite {
  import spark.implicits._

  private def setup(): Unit = {
    Seq((1L, "u1", 100L), (2L, "u1", 250L), (3L, "u2", 50L))
      .toDF("p_id", "user_id", "ts").createOrReplaceTempView("probes")
    Seq(("u1", 90L, 1.0), ("u1", 200L, 2.0), ("u2", 400L, 9.0))
      .toDF("uid", "vts", "rate").createOrReplaceTempView("rates")
  }

  test("each probe joins the latest version at or before its time") {
    setup()
    val out = TemporalJoinSql.sql(spark,
      """SELECT p.p_id, r.rate FROM probes AS p
        |JOIN rates FOR SYSTEM_TIME AS OF p.ts AS r
        |ON p.user_id = r.uid
        |ORDER BY p.p_id""".stripMargin,
      rightTimeCol = Some("vts"))
    assert(out.collect().toSeq == Seq(
      Row(1L, 1.0),        // ts 100: version 90 current
      Row(2L, 2.0),        // ts 250: version 200 current
      Row(3L, null)))      // ts 50: no u2 version yet — LEFT semantics
  }

  test("right-side columns surface through the r-alias namespace") {
    setup()
    val out = TemporalJoinSql.sql(spark,
      """SELECT p.p_id, r.vts, r.rate FROM probes p
        |JOIN rates FOR SYSTEM_TIME AS OF p.ts r
        |ON r.uid = p.user_id
        |WHERE r.rate IS NOT NULL ORDER BY p.p_id""".stripMargin,
      rightTimeCol = Some("vts"))
    assert(out.collect().toSeq == Seq(Row(1L, 90L, 1.0), Row(2L, 200L, 2.0)))
  }

  test("streaming inputs route through the watermark-driven operator") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(s: Long) = new Timestamp(s * 1000)
    val probes = MemoryStream[(Long, String, Timestamp)]
    val rates = MemoryStream[(String, Timestamp, Double)]
    probes.toDS().toDF("p_id", "user_id", "ts")
      .createOrReplaceTempView("s_probes")
    rates.toDS().toDF("uid", "vts", "rate")
      .createOrReplaceTempView("s_rates")
    val out = TemporalJoinSql.sql(spark,
      """SELECT p.p_id, r.rate FROM s_probes AS p
        |JOIN s_rates FOR SYSTEM_TIME AS OF p.ts AS r
        |ON p.user_id = r.uid""".stripMargin,
      rightTimeCol = Some("vts"))
    assert(out.isStreaming)
    // the union shares ONE watermark: enqueue the first window on both
    // sides BEFORE start so neither side's batch advances it past the
    // other's pending rows (the same reason the typed spec uses a single
    // envelope stream)
    probes.addData(Seq((1L, "u1", ts(100)), (2L, "u1", ts(250))))
    rates.addData(Seq(("u1", ts(90), 1.0), ("u1", ts(200), 2.0)))
    val name = s"tjsql_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", tmpDir("ckpt")).start()
    try {
      q.processAllAvailable()
      // a far-future version advances the watermark past both probes,
      // releasing them against versions 90 and 200
      rates.addData(Seq(("u1", ts(9999), 9.0)))
      q.processAllAvailable()
      // buffer the probe while the watermark is still behind it...
      probes.addData(Seq((3L, "u1", ts(10500))))
      q.processAllAvailable()
      // ...then advance past it: resolves against the 9999s version
      rates.addData(Seq(("u1", ts(99999), 0.0)))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(rows == Map(1L -> 1.0, 2L -> 2.0, 3L -> 9.0),
        s"got $rows")
    } finally q.stop()
  }

  test("alias-like sequences inside string literals are not rewritten") {
    setup()
    val out = TemporalJoinSql.sql(spark,
      """SELECT p.p_id, 'p.note' AS tag, r.rate FROM probes AS p
        |JOIN rates FOR SYSTEM_TIME AS OF p.ts AS r
        |ON p.user_id = r.uid
        |WHERE r.rate IS NOT NULL ORDER BY p.p_id""".stripMargin,
      rightTimeCol = Some("vts"))
    assert(out.collect().toSeq == Seq(
      Row(1L, "p.note", 1.0), Row(2L, "p.note", 2.0)))
  }

  test("backslash-escaped quotes inside literals do not leak the rewrite") {
    setup()
    // Spark's default parser accepts \' inside a single-quoted literal;
    // the quote scanner must not close the span there and rewrite the tail
    val out = TemporalJoinSql.sql(spark,
      """SELECT p.p_id, 'can\'t match p.rate' AS tag, r.rate FROM probes AS p
        |JOIN rates FOR SYSTEM_TIME AS OF p.ts AS r
        |ON p.user_id = r.uid
        |WHERE r.rate IS NOT NULL ORDER BY p.p_id""".stripMargin,
      rightTimeCol = Some("vts"))
    assert(out.collect().toSeq == Seq(
      Row(1L, "can't match p.rate", 1.0), Row(2L, "can't match p.rate", 2.0)))
  }

  test("missing span and wrong alias fail loudly") {
    setup()
    val e1 = intercept[IllegalArgumentException] {
      TemporalJoinSql.sql(spark, "SELECT * FROM probes JOIN rates ON 1 = 1")
    }
    assert(e1.getMessage.contains("FOR SYSTEM_TIME AS OF"))
    val e2 = intercept[IllegalArgumentException] {
      TemporalJoinSql.sql(spark,
        """SELECT p.p_id FROM probes p JOIN rates FOR SYSTEM_TIME AS OF x.ts r
          |ON p.user_id = r.uid""".stripMargin)
    }
    assert(e2.getMessage.contains("probe side"))
  }
}
