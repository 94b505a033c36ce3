package graft.queries

import graft.Tables
import Q._

/** Twelve seeds from the differential fuzz generator ([[FuzzGen]])
  * promoted to permanent driver-gated oracle rows — at least one per
  * grammar shape (set-op, IN-subquery, row-level select, aggregating
  * join, window, EXISTS, scalar subquery), so the generator surface is
  * exercised by the driver's DuckDB compare every round, not only by
  * the dev-side 500-seed sweep (`graft.FuzzDump` + `dev/check.py`,
  * recorded in SURVEY §5). The SQL text is the seed's generated text,
  * dialect-shared by the generator's construction.
  */
object FuzzQueries {

  /** shape coverage: 1,14=setop; 2,21=IN; 3,8=plain; 4,6=aggjoin;
    * 5,7=window; 9=exists; 11=scalar.
    */
  private val seeds = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 11L, 14L, 21L)

  private val all: Map[String, String] =
    seeds.map(s => s"q_fuzz_$s" -> FuzzGen.sql(s)).toMap

  val queries: Map[String, QFn] = all.map { case (name, sql) =>
    name -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(sql)
    }): (String, QFn)
  }

  // identical SQL text runs as the oracle (dialect-shared by design)
  val oracles: Map[String, String] = all
}
