package graft.queries

import graft.Tables
import Q._

/** SQL-string surface (§3.1 `tEnv.executeSql` parity): queries submitted
  * as ANSI SQL through `spark.sql` over registered views — the same text
  * (modulo nothing) runs in DuckDB as the oracle, demonstrating dialect-
  * level compatibility of the SQL front door.
  */
object SqlQueries {

  // TPC-H Q3-shaped: revenue of high-value orders per priority in a window.
  private val q3ish =
    """SELECT o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM customer, orders, lineitem
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND c_mktsegment = 'BUILDING'
      |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // TPC-H Q5-shaped: revenue per nation through the supplier side.
  private val q5ish =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM supplier, lineitem, nation, region
      |WHERE s_suppkey = l_suppkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name IN ('ASIA', 'EUROPE')
      |GROUP BY n_name
      |HAVING COUNT(*) > 10
      |ORDER BY n_name""".stripMargin

  // explicit GROUPING SETS (DecomposeGroupingSetsRule → Expand parity).
  private val groupingSets =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  val queries: Map[String, QFn] = Map(
    "q_sql_groupingsets" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(groupingSets)
    }),
    "q_sql_tpch3" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(q3ish)
    }),
    "q_sql_tpch5" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(q5ish)
    })
  )

  // identical SQL text runs as the oracle
  val oracles: Map[String, String] = Map(
    "q_sql_groupingsets" -> groupingSets,
    "q_sql_tpch3" -> q3ish,
    "q_sql_tpch5" -> q5ish
  )
}
