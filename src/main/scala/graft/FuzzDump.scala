package graft


/** Differential-fuzzing dump: generate `n` seeded queries
  * (queries/FuzzGen), execute each on Spark, and write the same layout
  * `dev/check.py` consumes (per-query parquet + oracle_sql.json) so the
  * DuckDB comparison is the identical machinery the driver's gate uses.
  *
  * Usage: runMain graft.FuzzDump <sfDir> <outDir> [n=500] [seed0=1]
  * then:  python3 dev/check.py <sfDir> <outDir>
  *
  * Every query name encodes its seed (`q_fuzz_<seed>`), so a mismatch
  * replays from the name alone.
  */
object FuzzDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val n = if (args.length > 2) args(2).toInt else 500
    val seed0 = if (args.length > 3) args(3).toLong else 1L
    val spark = DumpIO.session()
    new java.io.File(outDir).mkdirs()
    Tables.registerAll(spark, sfDir)
    var failed = 0
    val oracle = (seed0 until seed0 + n).flatMap { seed =>
      val name = s"q_fuzz_$seed"
      val sql = graft.queries.FuzzGen.sql(seed)
      try {
        spark.sql(sql).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        Some(name -> sql)
      } catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[fuzz] $name failed on Spark: ${e.getMessage}")
        System.err.println(sql)
        None
      }
    }
    DumpIO.writeOracle(outDir, oracle)
    println(s"[fuzz] dumped ${oracle.length} of $n queries " +
      s"($failed failed on Spark), seeds $seed0..${seed0 + n - 1}")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
