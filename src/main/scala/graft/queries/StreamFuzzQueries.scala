package graft.queries

import Q._

/** Promoted permanent oracle rows from the STREAMING differential fuzz
  * generator ([[StreamFuzzGen]]) — one seed per structural family
  * (tumbling single-key, hopping, tumbling composite-key), selected
  * deterministically as the FIRST seed exhibiting each shape so the
  * choice is reproducible from the generator alone. Each row replays
  * the events table through a MemoryStream into the case's windowed
  * aggregate (StreamQueries.streamFuzzReplay) and is checked against
  * the case's own DuckDB restatement — the driver-gated tie-in for the
  * engine-vs-engine sweep in `StreamFuzzSpec` / `graft.StreamFuzzDump`.
  */
object StreamFuzzQueries {

  private def firstSeed(p: StreamFuzzGen.Case => Boolean): Long =
    (1L to 256L).find(s => p(StreamFuzzGen.gen(s)))
      .getOrElse(sys.error("no seed in 1..256 matches the shape"))

  /** tumble+1key, hop, tumble+2keys — deterministic shape scan. */
  private[queries] val seeds: Seq[Long] = Seq(
    firstSeed(c => !c.isHop && c.keys.length == 1),
    firstSeed(c => c.isHop),
    firstSeed(c => !c.isHop && c.keys.length == 2)).distinct

  private val cases: Seq[StreamFuzzGen.Case] = seeds.map(StreamFuzzGen.gen)

  val queries: Map[String, QFn] = cases.map { c =>
    s"q_fuzz_stream_${c.seed}" -> ((s, dir) =>
      StreamQueries.streamFuzzReplay(s, dir, c)): (String, QFn)
  }.toMap

  val oracles: Map[String, String] =
    cases.map(c => s"q_fuzz_stream_${c.seed}" -> c.oracleSql).toMap

  /** Public replay front door for the dev-side sweep
    * (graft.StreamFuzzDump — outside this package).
    */
  def replay(s: org.apache.spark.sql.SparkSession, dir: String,
      c: StreamFuzzGen.Case): org.apache.spark.sql.DataFrame =
    StreamQueries.streamFuzzReplay(s, dir, c)
}
