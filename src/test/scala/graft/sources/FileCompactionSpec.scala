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

  test("a failed commit rename aborts compaction and keeps every original") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.failfs.impl", classOf[FailingRenameFs].getName)
    val local = tmpDir("failcompact")
    val dir = s"failfs://${local}"
    (1 to 50).toDF("v").repartition(10).write.mode("append").parquet(dir)
    val localDir = new java.io.File(local)
    def parquetNames() = localDir.listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val namesBefore = parquetNames()
    assert(namesBefore.size == 10)

    FailingRenameFs.failCompactedRenamesAfter = 1 // land one, fail the next
    try {
      val err = intercept[java.io.IOException] {
        // tiny targetBytes → several merged outputs → a partial landing
        FileCompaction.compactParquet(spark, dir,
          smallBytes = 1 << 20, targetBytes = 1L)
      }
      assert(err.getMessage.contains("original files kept"))
    } finally FailingRenameFs.failCompactedRenamesAfter = Int.MaxValue

    // commit-then-cleanup contract: nothing lost, nothing half-landed
    assert(parquetNames() == namesBefore)          // originals untouched
    assert(!localDir.listFiles().exists(_.getName.startsWith("compacted-")))
    assert(!localDir.listFiles().exists(f =>       // temp dir rolled back
      f.isDirectory && f.getName.startsWith("_compact_")))
    assert(spark.read.parquet(dir).as[Int].collect().sorted.toSeq ==
      (1 to 50).toSeq)
  }
}

/** RawLocalFileSystem that fails renames to `compacted-*` destinations
  * once armed — injects the commit-phase failure the abort path guards.
  */
class FailingRenameFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "failfs"
  override def getUri: java.net.URI = java.net.URI.create("failfs:///")
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean = {
    if (dst.getName.startsWith("compacted-")) {
      if (FailingRenameFs.failCompactedRenamesAfter <= 0) return false
      FailingRenameFs.failCompactedRenamesAfter -= 1
    }
    super.rename(src, dst)
  }
}

object FailingRenameFs {
  @volatile var failCompactedRenamesAfter: Int = Int.MaxValue
}
