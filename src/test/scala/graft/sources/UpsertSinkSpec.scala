package graft.sources

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.streaming.Changelog

case class UpsRow(k: Long, v: String, seq: Long, kind: Byte)

class UpsertSinkSpec extends SparkSuite {
  import spark.implicits._

  private def table(dir: String): Set[(Long, String)] =
    UpsertSink.read(spark, dir).select("k", "v")
      .as[(Long, String)].collect().toSet

  test("mergeBatch folds to last-per-key, applies deletes, prunes buckets") {
    val dir = tmpDir("upsert") + "/t"
    val b1 = Seq(
      UpsRow(1, "a1", 10, Changelog.Insert),
      UpsRow(1, "a2", 20, Changelog.UpdateAfter), // later seq wins in-batch
      UpsRow(2, "b1", 10, Changelog.Insert),
      UpsRow(3, "c1", 10, Changelog.Insert)).toDF()
      .withColumnRenamed("kind", Changelog.RowKindCol)
    UpsertSink.mergeBatch(spark, b1, Seq("k"), "seq", dir, buckets = 8)
    assert(table(dir) == Set((1L, "a2"), (2L, "b1"), (3L, "c1")))

    // second batch: update k=1, delete k=2, leave k=3 untouched
    val b2 = Seq(
      UpsRow(1, "a3", 30, Changelog.UpdateAfter),
      UpsRow(2, "b1", 30, Changelog.Delete)).toDF()
      .withColumnRenamed("kind", Changelog.RowKindCol)
    val rewritten = UpsertSink.mergeBatch(spark, b2, Seq("k"), "seq", dir, 8)
    assert(table(dir) == Set((1L, "a3"), (3L, "c1")))
    // only the buckets of k=1 and k=2 were touched
    assert(rewritten <= 2)
  }

  test("untouched bucket directories are not rewritten") {
    val dir = tmpDir("upsert") + "/t"
    val mk = (k: Long, v: String, seq: Long) =>
      UpsRow(k, v, seq, Changelog.Insert)
    UpsertSink.mergeBatch(spark,
      (0L until 64L).map(k => mk(k, s"v$k", 1)).toDF()
        .withColumnRenamed("kind", Changelog.RowKindCol),
      Seq("k"), "seq", dir, buckets = 8)
    def fileSet(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = fileSet()
    // touch exactly one key → at most one bucket rewritten
    UpsertSink.mergeBatch(spark,
      Seq(mk(5, "new", 9)).toDF().withColumnRenamed("kind", Changelog.RowKindCol),
      Seq("k"), "seq", dir, buckets = 8)
    val after = fileSet()
    val survivors = before.keySet intersect after.keySet
    // every untouched bucket's files survive byte-identical paths
    assert(survivors.nonEmpty)
    assert(survivors.forall(p => before(p) == after(p)))
    // and at least one bucket changed (k=5's)
    assert(before.keySet != after.keySet ||
      before.exists { case (p, m) => after.get(p).exists(_ != m) })
    assert(table(dir).contains((5L, "new")))
    assert(table(dir).size == 64)
  }

  test("replayed batch converges: mergeBatch is idempotent on (key, seq)") {
    val dir = tmpDir("upsert") + "/t"
    val b1 = Seq(UpsRow(1, "a", 1, Changelog.Insert),
      UpsRow(2, "b", 1, Changelog.Insert)).toDF()
      .withColumnRenamed("kind", Changelog.RowKindCol)
    val b2 = Seq(UpsRow(1, "a2", 2, Changelog.UpdateAfter),
      UpsRow(2, "b", 2, Changelog.Delete)).toDF()
      .withColumnRenamed("kind", Changelog.RowKindCol)
    UpsertSink.mergeBatch(spark, b1, Seq("k"), "seq", dir, 4)
    UpsertSink.mergeBatch(spark, b2, Seq("k"), "seq", dir, 4)
    val once = table(dir)
    // a foreachBatch redelivery after a crash re-runs the SAME batch
    UpsertSink.mergeBatch(spark, b2, Seq("k"), "seq", dir, 4)
    assert(table(dir) == once && once == Set((1L, "a2")))
  }

  test("delete loses a same-seq tie (delete+reinsert keeps the row)") {
    val dir = tmpDir("upsert") + "/t"
    val b = Seq(
      UpsRow(9, "dead", 5, Changelog.Delete),
      UpsRow(9, "alive", 5, Changelog.Insert)).toDF()
      .withColumnRenamed("kind", Changelog.RowKindCol)
    UpsertSink.mergeBatch(spark, b, Seq("k"), "seq", dir, 4)
    assert(table(dir) == Set((9L, "alive")))
  }

  test("streaming foreachBatch upsert: end table is keyed last-state") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("upsert_stream") + "/t"
    val input = MemoryStream[UpsRow]
    val q = UpsertSink.start(
      input.toDS().toDF().withColumnRenamed("kind", Changelog.RowKindCol),
      Seq("k"), "seq", dir, buckets = 4, checkpoint = tmpDir("upsert_ckpt"))
    try {
      input.addData(Seq(UpsRow(1, "x", 1, Changelog.Insert),
        UpsRow(2, "y", 1, Changelog.Insert)))
      q.processAllAvailable()
      input.addData(Seq(UpsRow(1, "x2", 2, Changelog.UpdateAfter),
        UpsRow(2, "y", 2, Changelog.Delete),
        UpsRow(3, "z", 2, Changelog.Insert)))
      q.processAllAvailable()
    } finally q.stop()
    assert(table(dir) == Set((1L, "x2"), (3L, "z")))
  }
}
