package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-sink rolling and small-file compaction — the engine's analogue of
  * the reference's file sink compactor
  * (flink-connectors/flink-connector-files/.../file/sink/compactor/:
  * FileCompactStrategy size threshold, ConcatFileCompactor /
  * RecordWiseFileCompactor merge, CompactCoordinator commit) and its
  * rolling policy (CheckpointRollingPolicy / OnCheckpointRollingPolicy).
  *
  * Spark-first: rolling is `maxRecordsPerFile` on the write (codegen'd
  * writers roll files without any custom sink), and compaction is a
  * record-wise merge that reads ONLY the small files and rewrites them as
  * ~`targetBytes` outputs. The commit point is the rename phase: merged
  * files land under a temp dir, then move into the sink directory before
  * the originals are deleted — a crash before the deletes leaves
  * duplicated-but-complete data to re-compact, never partial files
  * (the CompactCoordinator's commit-then-cleanup order).
  *
  * At 100 TB the small-file problem is the file-listing and task-startup
  * cost of millions of checkpoint-sized files; compaction cost here is
  * proportional to the SMALL bytes only — large files are never
  * rewritten or even read.
  */
object FileCompaction {

  case class CompactionStats(
      filesBefore: Int, filesAfter: Int,
      smallFilesMerged: Int, bytesMerged: Long, mergedOutputs: Int)

  /** Write `df` with size-bounded rolling (the rolling-policy analogue):
    * each output file holds at most `maxRecordsPerFile` records.
    */
  def writeRolled(df: DataFrame, dir: String, maxRecordsPerFile: Long): Unit =
    df.write.option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("append").parquet(dir)

  /** Merge every parquet part-file smaller than `smallBytes` in `dir`
    * into ~`targetBytes` outputs; larger files are untouched (and never
    * read). Returns before/after stats.
    */
  def compactParquet(spark: SparkSession, dir: String,
      smallBytes: Long, targetBytes: Long): CompactionStats = {
    val hPath = new Path(dir)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partFiles() = fs.listStatus(hPath)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = partFiles()
    val small = before.filter(_.getLen < smallBytes)
    if (small.length < 2) // nothing to merge
      return CompactionStats(before.length, before.length, 0, 0L, 0)

    val smallPaths = small.map(_.getPath.toString)
    val bytes = small.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)

    // phase 1: write merged outputs to a temp dir (not visible to readers
    // of `dir` — underscore prefix is filtered by FileInputFormat)
    val tmp = new Path(hPath, s"_compact_${System.nanoTime()}")
    spark.read.parquet(smallPaths: _*)
      .repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)

    // phase 2 (commit): move merged files in, then delete the originals —
    // in that order, so a crash can duplicate but never lose records.
    // Every rename must succeed before any original is deleted: a failed
    // rename aborts the whole compaction (originals kept, temp removed),
    // otherwise records merged into the unmoved file would be lost.
    val merged = fs.listStatus(tmp)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val landed = Vector.newBuilder[Path]
    val allRenamed = merged.zipWithIndex.forall { case (m, i) =>
      val dest = new Path(hPath, s"compacted-${System.nanoTime()}-$i.parquet")
      val ok = fs.rename(m.getPath, dest)
      if (ok) landed += dest
      ok
    }
    if (!allRenamed) {
      // roll back: drop any already-landed merged files (the originals
      // still hold every record), then the temp dir, and signal failure
      landed.result().foreach(p => fs.delete(p, false))
      fs.delete(tmp, true)
      throw new java.io.IOException(
        s"compaction aborted: rename into $dir failed; original files kept")
    }
    small.foreach(s => fs.delete(s.getPath, false))
    fs.delete(tmp, true)

    CompactionStats(before.length, partFiles().length,
      small.length, bytes, merged.length)
  }
}
