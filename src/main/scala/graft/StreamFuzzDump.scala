package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Streaming differential-fuzz dump — the cross-engine half of the
  * StreamFuzzGen layer (the engine-vs-engine half is `StreamFuzzSpec`).
  * Each seeded case replays the events table through a MemoryStream
  * into its windowed aggregate and writes the `dev/check.py` layout
  * (per-query parquet + oracle_sql.json with the case's DuckDB
  * restatement), so the comparison is the driver's own machinery.
  *
  * Usage: runMain graft.StreamFuzzDump <sfDir> <outDir> [n=30] [seed0=1]
  * then:  python3 dev/check.py <sfDir> <outDir>
  */
object StreamFuzzDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val n = if (args.length > 2) args(2).toInt else 30
    val seed0 = if (args.length > 3) args(3).toLong else 1L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var failed = 0
    val oracle = (seed0 until seed0 + n).flatMap { seed =>
      val name = s"q_fuzz_stream_$seed"
      val c = graft.queries.StreamFuzzGen.gen(seed)
      try {
        graft.queries.StreamFuzzQueries.replay(spark, sfDir, c)
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        Some(name -> c.oracleSql)
      } catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[streamfuzz] $name failed on Spark: ${e.getMessage}")
        None
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = oracle.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"[streamfuzz] dumped ${oracle.length} of $n cases " +
      s"($failed failed on Spark), seeds $seed0..${seed0 + n - 1}")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
