package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Q._

/** Batch aggregation parity — reference exec nodes `BatchExecHashAggregate`
  * (/root/reference/flink-table/flink-table-planner/src/main/java/org/apache/flink/table/planner/plan/nodes/exec/batch/BatchExecHashAggregate.java:55),
  * grouping sets via `StreamExecExpand`, distinct aggs, FILTER clauses and
  * the built-in agg function set of
  * BuiltInFunctionDefinitions.java:712-840 (SURVEY.md §2.4).
  *
  * All delegate to Catalyst `HashAggregateExec` with partial aggregation
  * (map-side combine) — at 100 TB the shuffle carries only the per-group
  * partial buffers, which is exactly the reference's two-stage agg design.
  */
object AggQueries {

  val queries: Map[String, QFn] = Map(
    // TPC-H Q1 shape: the reference's flagship batch agg
    // (flink-end-to-end-tests/flink-tpch-test).
    "q_agg_basic" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_quantity" < 30)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          sum(dec2($"l_extendedprice") * (lit(1) - dec2($"l_discount")))
            .cast(DoubleType).as("sum_disc_price"),
          sum(dec2($"l_extendedprice") * (lit(1) - dec2($"l_discount"))
            * (lit(1) + dec2($"l_tax"))).cast(DoubleType).as("sum_charge"),
          (dsum($"l_quantity") / count(lit(1))).as("avg_qty"),
          min(dec2($"l_extendedprice")).cast(DoubleType).as("min_price"),
          max(dec2($"l_extendedprice")).cast(DoubleType).as("max_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // COUNT(DISTINCT ...) single- and multi-column.
    "q_agg_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_orderkey").as("n_orders"),
          countDistinct($"l_partkey", $"l_suppkey").as("n_partsupp"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    }),

    // FILTER (WHERE ...) clauses — Calcite AggregateCall.filterArg parity.
    "q_agg_filter" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_linestatus")
        .agg(
          sum(when($"l_returnflag" === "R", dec2($"l_quantity")))
            .cast(DoubleType).as("qty_returned"),
          count(when($"l_discount" > 0.05, lit(1))).as("n_discounted"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_linestatus")
    }),

    // ROLLUP → Expand + agg (DecomposeGroupingSetsRule parity).
    "q_agg_rollup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          count(lit(1)).as("n_rows"),
          grouping_id().cast(LongType).as("gid"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    // CUBE over a join of dims.
    "q_agg_cube" -> ((s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      o.cube($"o_orderstatus", $"o_orderpriority")
        .agg(
          dsum($"o_totalprice").as("sum_price"),
          count(lit(1)).as("n_rows"),
          grouping($"o_orderstatus").cast(LongType).as("g_status"),
          grouping($"o_orderpriority").cast(LongType).as("g_prio"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    }),

    // LISTAGG / ARRAY_AGG with deterministic ordering
    // (ListAggWithRetractAggFunction / CollectAggFunction parity).
    "q_agg_listagg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "nation")
        .groupBy($"n_regionkey")
        .agg(
          array_join(array_sort(collect_list($"n_name")), ",").as("nations"),
          count(lit(1)).as("n"))
        .orderBy($"n_regionkey")
    }),

    // MIN_BY / MAX_BY (Flink FIRST_VALUE/LAST_VALUE-by-order analogue).
    "q_agg_minmax_by" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .agg(
          min_by($"o_orderkey", struct($"o_totalprice", $"o_orderkey")).as("cheapest_order"),
          max_by($"o_orderkey", struct($"o_totalprice", $"o_orderkey")).as("priciest_order"),
          min($"o_orderdate").as("first_date"),
          max($"o_orderdate").as("last_date"))
        .orderBy($"o_orderstatus")
    }),

    // Variance/stddev family computed via exact decimal sums so both engines
    // do the identical double arithmetic (reference: stddevPop:787 …
    // varSamp:814 in BuiltInFunctionDefinitions.java).
    "q_agg_stats" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val sx = sum($"l_quantity".cast(DecimalType(12, 2))).cast(DoubleType)
      val sxx = sum(($"l_quantity".cast(DecimalType(12, 2))
        * $"l_quantity".cast(DecimalType(12, 2)))).cast(DoubleType)
      val n = count(lit(1)).cast(DoubleType)
      li.groupBy($"l_returnflag")
        .agg(
          ((sxx - sx * sx / n) / n).as("var_pop"),
          ((sxx - sx * sx / n) / (n - lit(1.0))).as("var_samp"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    }),

    // User-defined aggregate (AggregateFunction surface, §2.11): typed
    // Aggregator registered through functions.udaf and used like a
    // built-in; exact long arithmetic keeps it partition-order-proof.
    "q_agg_udaf" -> ((s, dir) => {
      import s.implicits._
      val sumSq = udaf(graft.functions.SumOfSquares)
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(sumSq($"l_quantity".cast(LongType)).as("sum_sq"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    }),

    // Exact interpolated percentiles (median family): both engines use
    // linear interpolation over the sorted values.
    "q_agg_percentile" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          percentile($"l_quantity".cast(LongType), lit(0.5)).as("median_qty"),
          percentile($"l_quantity".cast(LongType), lit(0.9)).as("p90_qty"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    }),

    // approx_count_distinct — HLL++ sketches can't hash-match across
    // engines, so the hash-checkable surface is the exact count plus a
    // bounded-error flag: Spark's HLL++ is deterministic for fixed input,
    // so `within_5pct` is a stable boolean the DuckDB oracle emits as TRUE.
    "q_agg_approx_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_orderkey").as("exact_orders"),
          approx_count_distinct($"l_orderkey", rsd = 0.02).as("approx"))
        .select(
          $"l_returnflag",
          $"exact_orders",
          (abs($"approx" - $"exact_orders") / $"exact_orders" <= 0.05)
            .as("within_5pct"))
        .orderBy($"l_returnflag")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_agg_basic" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS min_price,
        |  CAST(MAX(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_quantity < 30
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_partsupp,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_filter" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) FILTER (WHERE l_returnflag = 'R') AS DOUBLE) AS qty_returned,
        |  COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n_rows,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_agg_listagg" ->
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  COUNT(*) AS n
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "q_agg_minmax_by" ->
      """WITH r AS (
        |  SELECT o_orderstatus, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS rn_asc,
        |    row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_desc
        |  FROM orders),
        |d AS (
        |  SELECT o_orderstatus, MIN(o_orderdate) AS first_date, MAX(o_orderdate) AS last_date
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT r.o_orderstatus,
        |  MAX(CASE WHEN rn_asc = 1 THEN o_orderkey END) AS cheapest_order,
        |  MAX(CASE WHEN rn_desc = 1 THEN o_orderkey END) AS priciest_order,
        |  d.first_date, d.last_date
        |FROM r JOIN d ON r.o_orderstatus = d.o_orderstatus
        |GROUP BY r.o_orderstatus, d.first_date, d.last_date
        |ORDER BY r.o_orderstatus""".stripMargin,

    "q_agg_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(CAST(l_quantity AS BIGINT), 0.5) AS median_qty,
        |  quantile_cont(CAST(l_quantity AS BIGINT), 0.9) AS p90_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_approx_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_udaf" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_sq,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_stats" ->
      """SELECT l_returnflag,
        |  (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |   - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
        |   / CAST(COUNT(*) AS DOUBLE) AS var_pop,
        |  (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |   - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
        |   / (CAST(COUNT(*) AS DOUBLE) - 1.0) AS var_samp,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
