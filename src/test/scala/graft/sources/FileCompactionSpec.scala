package graft.sources

import graft.SparkSuite

/** File-sink rolling + compaction: rolled writes bound file sizes, and
  * compaction merges only the small files while preserving every record
  * and leaving large files byte-identical in place.
  */
class FileCompactionSpec extends SparkSuite {
  import spark.implicits._

  test("writeRolled bounds records per file") {
    val dir = tmpDir("rolled")
    FileCompaction.writeRolled(
      (1 to 100).toDF("v").repartition(1), dir, maxRecordsPerFile = 30)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4) // 30+30+30+10
    assert(spark.read.parquet(dir).count() == 100)
  }

  test("compaction merges small files, keeps content, skips large ones") {
    val dir = tmpDir("compact")
    // 10 tiny files + 1 big file
    (1 to 50).toDF("v").repartition(10).write.mode("append").parquet(dir)
    (1000 to 6000).toDF("v").coalesce(1).write.mode("append").parquet(dir)
    val before = spark.read.parquet(dir).as[Int].collect().sorted
    val bigBefore = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).maxBy(_.length())

    val stats = FileCompaction.compactParquet(spark, dir,
      smallBytes = bigBefore.length(), targetBytes = 1 << 20)

    assert(stats.smallFilesMerged == 10)
    assert(stats.mergedOutputs == 1) // tiny bytes fit one target file
    assert(stats.filesAfter == 2)    // merged + untouched big file
    // the big file was not rewritten (same path, same bytes)
    val bigAfter = new java.io.File(dir).listFiles()
      .filter(_.getName == bigBefore.getName)
    assert(bigAfter.length == 1 && bigAfter.head.length() == bigBefore.length())
    // every record survived
    val after = spark.read.parquet(dir).as[Int].collect().sorted
    assert(after.toSeq == before.toSeq)
  }

  test("compaction is a no-op with fewer than two small files") {
    val dir = tmpDir("noop")
    (1 to 10).toDF("v").coalesce(1).write.mode("overwrite").parquet(dir)
    val stats = FileCompaction.compactParquet(spark, dir, 10L, 1 << 20)
    assert(stats.smallFilesMerged == 0 && stats.filesBefore == stats.filesAfter)
  }
}
