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

  // TPC-H Q17-shaped: TWO correlated scalar subqueries against the same
  // inner table — Catalyst decorrelates both into one per-partkey
  // aggregate joined back (RewriteCorrelatedScalarSubquery). The classic
  // `qty < 0.2 * AVG(qty)` is restated as `5·qty·COUNT < SUM` so every
  // comparison is exact decimal/integer arithmetic on both engines
  // (DuckDB's AVG returns DOUBLE, whose rounding could flip boundary rows).
  private val q17ish =
    """SELECT p_brand,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS small_qty_revenue,
      |  COUNT(*) AS n_small
      |FROM lineitem l1, part
      |WHERE p_partkey = l1.l_partkey AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      |  AND 5 * CAST(l1.l_quantity AS DECIMAL(12,2)) *
      |      (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
      |    < (SELECT SUM(CAST(l_quantity AS DECIMAL(12,2))) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // TPC-H Q2-shaped: correlated EQUALITY against a MIN subquery (the
  // cheapest line per part) — no arithmetic on the compared value, so
  // double equality is exact cross-engine.
  private val q2ish =
    """SELECT p_partkey, p_name, COUNT(*) AS n_cheapest
      |FROM lineitem l1, part
      |WHERE p_partkey = l1.l_partkey AND p_size < 5
      |  AND l1.l_extendedprice = (SELECT MIN(l2.l_extendedprice)
      |                            FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
      |GROUP BY p_partkey, p_name ORDER BY p_partkey""".stripMargin

  // TPC-H Q21-shaped: EXISTS + NOT EXISTS, the NOT EXISTS correlated to
  // TWO outer tables (l1.l_orderkey and o_orderdate) — the hardest
  // decorrelation shape in the dialect-shared suite ("late" = shipped
  // more than 60 days after the order date; the testdata carries no
  // receipt/commit dates).
  private val q21ish =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin

  // TPC-H Q18-shaped: IN over a grouped-HAVING subquery (large-volume
  // orders) — RewritePredicateSubquery turns the IN into a semi join
  // against the aggregated subquery; exact decimal sums on both sides.
  private val q18ish =
    """SELECT c_name, o_orderkey,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      |FROM customer, orders, lineitem
      |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
      |  AND o_orderkey IN (
      |    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 120)
      |GROUP BY c_name, o_orderkey
      |ORDER BY o_orderkey""".stripMargin

  // TPC-H Q20-shaped: NESTED IN subqueries (suppliers shipping small
  // parts in volume) — a semi join whose build side itself contains a
  // semi join under a grouped HAVING.
  private val q20ish =
    """SELECT s_name, CAST(s_acctbal AS DOUBLE) AS acctbal
      |FROM supplier, nation
      |WHERE s_nationkey = n_nationkey
      |  AND n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem
      |    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 10)
      |    GROUP BY l_suppkey
      |    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 50)
      |ORDER BY s_name""".stripMargin

  // GROUPING() disambiguation over CUBE (the reference's
  // GROUPING/GROUPING_ID surface; a NULL group key vs a rolled-up key
  // are indistinguishable without it).
  private val groupingFn =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  // WITH RECURSIVE (Spark 4's recursive CTE — the iterative-closure
  // class of query the reference reaches via its iterate operators,
  // expressed relationally): 5-hop doc-id chains from each century
  // anchor, aggregated per root.
  private val recursiveCte =
    """WITH RECURSIVE chain AS (
      |  SELECT doc_id, doc_id AS root, 0 AS depth FROM documents WHERE doc_id % 100 = 0
      |  UNION ALL
      |  SELECT d.doc_id, c.root, c.depth + 1
      |  FROM chain c JOIN documents d ON d.doc_id = c.doc_id + 1
      |  WHERE c.depth < 4)
      |SELECT root, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
      |FROM chain GROUP BY root ORDER BY root""".stripMargin

  /** JVM-scoped hive session cache for q_sql_hive (see there). */
  @volatile private var hiveSession
      : Option[org.apache.spark.sql.SparkSession] = None

  private val all: Map[String, String] = Map(
    "q_sql_groupingsets" -> groupingSets,
    "q_sql_groupingfn" -> groupingFn,
    "q_sql_recursive" -> recursiveCte,
    "q_sql_tpch3" -> q3ish,
    "q_sql_tpch5" -> q5ish,
    "q_sql_tpch17" -> q17ish,
    "q_sql_tpch2" -> q2ish,
    "q_sql_tpch21" -> q21ish,
    "q_sql_tpch18" -> q18ish,
    "q_sql_tpch20" -> q20ish
  )

  val queries: Map[String, QFn] = all.map { case (name, sql) =>
    name -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(sql)
    }): (String, QFn)
  } ++ Map[String, QFn](

    // Connector DDL front door (operators/ConnectorDdl via GraftSql):
    // CREATE TABLE … WITH ('connector'='filesystem') over the lineitem
    // parquet, with a computed column — then query it. The oracle states
    // the computed column inline over the raw table.
    "q_sql_ddl" -> ((s, dir) => {
      graft.GraftSql.sql(s,
        s"""CREATE TABLE ddl_li (
           |  l_orderkey BIGINT,
           |  l_quantity DOUBLE,
           |  l_returnflag STRING,
           |  qty2 AS l_quantity * 2
           |) WITH ('connector' = 'filesystem',
           |        'path' = '$dir/lineitem.parquet',
           |        'format' = 'parquet')""".stripMargin)
      graft.GraftSql.sql(s,
        """SELECT l_returnflag,
          |  CAST(SUM(CAST(qty2 AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty2,
          |  COUNT(*) AS n
          |FROM ddl_li GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }),

    // INSERT INTO a filesystem sink table (OVERWRITE so repeated verify
    // runs converge), then read the materialized table back through the
    // same front door.
    "q_sql_ddl_sink" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      val out = java.nio.file.Files.createTempDirectory("q_sql_ddl_sink")
      Runtime.getRuntime.addShutdownHook(
        new Thread(() => Q.deleteRecursively(out)))
      graft.GraftSql.sql(s,
        s"""CREATE TABLE ddl_sink (l_returnflag STRING, sum_qty DOUBLE)
           |WITH ('connector' = 'filesystem', 'path' = '$out/t',
           |      'format' = 'parquet')""".stripMargin)
      graft.GraftSql.sql(s,
        """INSERT OVERWRITE ddl_sink
          |SELECT l_returnflag,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
          |FROM lineitem GROUP BY l_returnflag""".stripMargin)
      graft.GraftSql.sql(s,
        "SELECT * FROM ddl_sink ORDER BY l_returnflag")
    }),

    // Materialized table (FLIP-435 — operators/MaterializedTable): a
    // FULL-mode materialization over orders, REFRESHed once (the
    // lifecycle statement re-runs the definition), then read back; must
    // equal the declarative aggregate.
    "q_sql_mattable" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      val out = java.nio.file.Files.createTempDirectory("q_sql_mattable")
      Runtime.getRuntime.addShutdownHook(
        new Thread(() => Q.deleteRecursively(out)))
      graft.GraftSql.sql(s,
        s"""CREATE MATERIALIZED TABLE mt_orders
           |WITH ('path' = '$out/t')
           |FRESHNESS = INTERVAL '1' HOUR
           |AS SELECT o_orderstatus, COUNT(*) AS n,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT) AS sum_cents
           |FROM orders GROUP BY o_orderstatus""".stripMargin)
      graft.GraftSql.sql(s, "ALTER MATERIALIZED TABLE mt_orders REFRESH")
      graft.GraftSql.sql(s,
        "SELECT * FROM mt_orders ORDER BY o_orderstatus")
    }),

    // CONTINUOUS materialized table under the gate: a file-monitor
    // source feeds a continuously-refreshed materialization; half the
    // events exist at CREATE (initial image), the rest append while the
    // job runs, and the final aggregate over the MATERIALIZED view must
    // equal batch SQL over all events — a missed commit, a stale read
    // view, or double-processing on the resume path breaks the hash.
    "q_sql_mattable_cont" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      Tables.registerAll(s, dir)
      val out = java.nio.file.Files.createTempDirectory("q_sql_mtcont")
      Runtime.getRuntime.addShutdownHook(
        new Thread(() => Q.deleteRecursively(out)))
      val src = s"$out/src"
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          col("value").cast("double").as("value"))
      ev.filter(col("event_id") % 2 === 0).write.mode("overwrite").parquet(src)
      graft.GraftSql.sql(s,
        s"""CREATE TABLE mtc_src (event_id BIGINT, event_type STRING, value DOUBLE)
           |WITH ('connector' = 'filesystem', 'path' = '$src',
           |      'format' = 'parquet', 'scan.streaming' = 'true')""".stripMargin)
      graft.GraftSql.sql(s,
        s"""CREATE MATERIALIZED TABLE mt_cont
           |WITH ('path' = '$out/t', 'checkpoint' = '$out/ckpt')
           |FRESHNESS = INTERVAL '30' SECOND
           |AS SELECT event_id, event_type,
           |  CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
           |FROM mtc_src""".stripMargin)
      // the second half arrives while the job runs
      ev.filter(col("event_id") % 2 =!= 0).write.mode("append").parquet(src)
      graft.operators.MaterializedTable.sync(s, "mt_cont")
      val result = graft.GraftSql.sql(s,
        """SELECT event_type, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
          |FROM mt_cont GROUP BY event_type ORDER BY event_type""".stripMargin)
      // materialize the answer, then stop the job (Verify/Bench hygiene)
      val rows = result.collect()
      graft.GraftSql.sql(s, "DROP MATERIALIZED TABLE mt_cont")
      graft.GraftSql.sql(s, "DROP TABLE mtc_src")
      s.createDataFrame(java.util.Arrays.asList(rows: _*), result.schema)
    }),

    // Row-level DML (batch DELETE/UPDATE — the reference's
    // SupportsRowLevelDelete/Update copy-on-write shape — plus
    // SqlTruncateTable-adjacent rewrite machinery): orders materialize
    // via CTAS, a DELETE drops every third order, an UPDATE bumps every
    // fifth surviving order's cents, and the read-back aggregate must
    // equal the declarative restatement.
    "q_sql_dml" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      val out = java.nio.file.Files.createTempDirectory("q_sql_dml")
      Runtime.getRuntime.addShutdownHook(
        new Thread(() => Q.deleteRecursively(out)))
      graft.GraftSql.sql(s,
        s"""CREATE TABLE dml_orders WITH ('connector' = 'filesystem',
           |  'path' = '$out/t', 'format' = 'parquet')
           |AS SELECT o_orderkey,
           |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
           |  o_orderstatus
           |FROM orders""".stripMargin)
      graft.GraftSql.sql(s, "DELETE FROM dml_orders WHERE o_orderkey % 3 = 0")
      graft.GraftSql.sql(s,
        "UPDATE dml_orders SET cents = cents + 5 WHERE o_orderkey % 5 = 0")
      graft.GraftSql.sql(s,
        """SELECT o_orderstatus, COUNT(*) AS n,
          |  CAST(SUM(cents) AS BIGINT) AS sum_cents
          |FROM dml_orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    }),

    // Hive metastore catalog (the reference's flink-connector-hive /
    // HiveCatalog): a SECOND SparkSession on the same SparkContext with
    // `enableHiveSupport` and a derby-backed metastore — CREATE TABLE
    // lands in the metastore catalog (not a temp view), INSERT goes
    // through the hive relation, and the read-back must match the
    // declarative oracle. The session swap is scoped and restored.
    "q_sql_hive" -> ((s, dir) => {
      import org.apache.spark.sql.SparkSession
      val prevActive = SparkSession.getActiveSession
      val prevDefault = SparkSession.getDefaultSession
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      try {
        // ONE hive session + derby metastore per JVM (bench re-runs
        // each query; per-run sessions would accumulate SharedStates,
        // embedded derby databases, and shutdown hooks)
        val hive = SqlQueries.synchronized {
          // a cached session bound to a STOPPED context must rebuild,
          // not serve dead-context errors forever
          hiveSession.filter(h => !h.sparkContext.isStopped).getOrElse {
            val wh = java.nio.file.Files.createTempDirectory("q_sql_hive_wh")
            val ms = java.nio.file.Files.createTempDirectory("q_sql_hive_ms")
            Runtime.getRuntime.addShutdownHook(new Thread(() => {
              Q.deleteRecursively(wh); Q.deleteRecursively(ms) }))
            val h = SparkSession.builder()
              .config("spark.sql.warehouse.dir", wh.toString)
              .config("javax.jdo.option.ConnectionURL",
                s"jdbc:derby:;databaseName=$ms/db;create=true")
              .enableHiveSupport()
              .getOrCreate()
            hiveSession = Some(h)
            h
          }
        }
        Tables.registerAll(hive, dir)
        hive.sql("DROP TABLE IF EXISTS hive_orders_agg")
        hive.sql(
          """CREATE TABLE hive_orders_agg
            |  (o_orderstatus STRING, n BIGINT, sum_cents BIGINT)
            |STORED AS PARQUET""".stripMargin)
        // prove it's the metastore catalog, not a temp view
        require(hive.catalog.tableExists("default.hive_orders_agg"),
          "hive_orders_agg must exist in the metastore catalog")
        hive.sql(
          """INSERT OVERWRITE TABLE hive_orders_agg
            |SELECT o_orderstatus, COUNT(*) AS n,
            |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
            |FROM orders GROUP BY o_orderstatus""".stripMargin)
        hive.sql(
          """SELECT o_orderstatus, n, sum_cents FROM hive_orders_agg
            |ORDER BY o_orderstatus""".stripMargin)
      } finally {
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        prevDefault.foreach(SparkSession.setDefaultSession)
        prevActive.foreach(SparkSession.setActiveSession)
      }
    }),

    // PARTITIONED BY sink: orders materialize hash-partitioned by
    // o_orderstatus (directory-per-status layout, dynamic-partition
    // OVERWRITE), plus a STATIC `PARTITION (o_orderstatus = 'X')` insert
    // whose rows take the literal from the clause. Read back through the
    // partitioned scan and aggregate per partition value — lost rows,
    // misrouted partitions, or a clobbered untouched partition each
    // diverge against the declarative oracle.
    "q_sql_ddl_part" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      val out = java.nio.file.Files.createTempDirectory("q_sql_ddl_part")
      Runtime.getRuntime.addShutdownHook(
        new Thread(() => Q.deleteRecursively(out)))
      graft.GraftSql.sql(s,
        s"""CREATE TABLE ddl_part (o_orderkey BIGINT, cents BIGINT,
           |  o_orderstatus STRING)
           |PARTITIONED BY (o_orderstatus)
           |WITH ('connector' = 'filesystem', 'path' = '$out/t',
           |      'format' = 'parquet')""".stripMargin)
      graft.GraftSql.sql(s,
        """INSERT OVERWRITE ddl_part
          |SELECT o_orderkey,
          |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
          |  o_orderstatus
          |FROM orders""".stripMargin)
      graft.GraftSql.sql(s,
        """INSERT INTO ddl_part PARTITION (o_orderstatus = 'X')
          |SELECT o_orderkey + 10000000,
          |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
          |FROM orders WHERE o_orderkey % 100 = 0""".stripMargin)
      graft.GraftSql.sql(s,
        """SELECT o_orderstatus, COUNT(*) AS n, SUM(cents) AS sum_cents
          |FROM ddl_part GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    })
  )

  // identical SQL text runs as the oracle (the DDL rows restate the
  // computed/materialized columns inline over the raw tables)
  val oracles: Map[String, String] = all ++ Map(
    "q_sql_ddl" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity * 2 AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty2,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_sql_ddl_sink" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_sql_mattable_cont" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS sum_cents
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_sql_dml" ->
      """WITH base AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
        |    o_orderstatus
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |u AS (SELECT o_orderstatus,
        |    CASE WHEN o_orderkey % 5 = 0 THEN cents + 5 ELSE cents END AS cents
        |  FROM base)
        |SELECT o_orderstatus, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM u GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_sql_mattable" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_sql_hive" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_sql_ddl_part" ->
      """WITH base AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
        |    o_orderstatus
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 10000000,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT), 'X'
        |  FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM base GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
}
