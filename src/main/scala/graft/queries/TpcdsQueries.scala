package graft.queries

import graft.Tables
import Q._

/** TPC-DS hard-shape sweep — the reference ships all 99 TPC-DS queries
  * as its end-to-end bar (flink-end-to-end-tests/flink-tpcds-test/src/
  * main/java/org/apache/flink/table/tpcds/TpcdsTestProgram.java:48,
  * query loop :103-109). The TPC-DS tables don't exist in the testdata,
  * so each query here is the NAMED TPC-DS query's *shape* — its CTE
  * structure, set ops, decorrelation pattern, window/rollup interplay —
  * re-targeted at the TPC-H-ish tables, with `l_returnflag` ('A'/'N'/
  * 'R') standing in for the store/catalog/web channel split. The SQL is
  * dialect-shared: the identical text runs in Spark and in the DuckDB
  * oracle.
  *
  * Cross-engine determinism rules (same as [[SqlQueries]]): every
  * aggregate that feeds a comparison or an output column is an EXACT
  * decimal sum; ratios divide DOUBLE casts of those exact sums (IEEE
  * division of identical operands is identical in both engines), and
  * `x/y > t` thresholds are restated as cross-multiplications where the
  * operands stay integral. AVG/STDDEV never appear as engine builtins —
  * q39's stddev is restated from n·Σx² − (Σx)² so the value is a
  * deterministic function of exact sums.
  *
  * Scale notes (the 100 TB question): every query here is a pure
  * declarative plan — Catalyst handles the CTE reuse, semi-join
  * decorrelation, and partial aggregation; the only self-joins are on
  * grouped/deduplicated CTEs (q4/q31/q39/q47: post-aggregate frames,
  * orders of magnitude smaller than the fact table) or key-equi self
  * joins (q95's line-level ws_wh, the same shape the real q95 runs on a
  * 1000-node cluster). Nothing collects, nothing is quadratic in the
  * fact table.
  */
object TpcdsQueries {

  // q4-shape: year-over-year growth per customer across two channels; the
  // 4-way self-join of the year_total CTE with the cross-channel growth
  // ratio comparison (cross-multiplied on doubles of exact sums).
  private val q4 =
    """WITH year_total AS (
      |  SELECT c_custkey, c_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total,
      |    'store' AS channel
      |  FROM customer, orders, lineitem
      |  WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey AND l_returnflag = 'N'
      |  GROUP BY c_custkey, c_name, EXTRACT(YEAR FROM o_orderdate)
      |  UNION ALL
      |  SELECT c_custkey, c_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total,
      |    'web' AS channel
      |  FROM customer, orders, lineitem
      |  WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey AND l_returnflag = 'R'
      |  GROUP BY c_custkey, c_name, EXTRACT(YEAR FROM o_orderdate))
      |SELECT t_s_secyear.c_custkey, t_s_secyear.c_name,
      |  CAST(t_s_secyear.total AS DOUBLE) AS store_growth_total,
      |  CAST(t_w_secyear.total AS DOUBLE) AS web_growth_total
      |FROM year_total t_s_firstyear, year_total t_s_secyear,
      |     year_total t_w_firstyear, year_total t_w_secyear
      |WHERE t_s_secyear.c_custkey = t_s_firstyear.c_custkey
      |  AND t_s_firstyear.c_custkey = t_w_secyear.c_custkey
      |  AND t_s_firstyear.c_custkey = t_w_firstyear.c_custkey
      |  AND t_s_firstyear.channel = 'store' AND t_s_secyear.channel = 'store'
      |  AND t_w_firstyear.channel = 'web' AND t_w_secyear.channel = 'web'
      |  AND t_s_firstyear.yr = 1996 AND t_s_secyear.yr = 1997
      |  AND t_w_firstyear.yr = 1996 AND t_w_secyear.yr = 1997
      |  AND t_s_firstyear.total > 0 AND t_w_firstyear.total > 0
      |  AND CAST(t_w_secyear.total AS DOUBLE) * CAST(t_s_firstyear.total AS DOUBLE)
      |    > CAST(t_s_secyear.total AS DOUBLE) * CAST(t_w_firstyear.total AS DOUBLE)
      |ORDER BY t_s_secyear.c_custkey""".stripMargin

  // q9-shape: five CASE buckets, each choosing between two scalar
  // subqueries on a scalar COUNT condition, from a one-row source.
  private def q9Bucket(lo: Int, hi: Int, n: Int): String =
    s"""  CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN $lo AND $hi) > 12000
       |    THEN (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) FROM lineitem WHERE l_quantity BETWEEN $lo AND $hi)
       |    ELSE (SELECT CAST(COUNT(*) AS DOUBLE) FROM lineitem WHERE l_quantity BETWEEN $lo AND $hi) END AS bucket$n""".stripMargin
  private val q9 =
    "SELECT\n" + (1 to 5).map(i => q9Bucket(i * 10 - 9, i * 10, i))
      .mkString(",\n") + "\nFROM region WHERE r_regionkey = 0"

  // q14-shape: cross_items via double INTERSECT, a scalar average
  // threshold CTE referenced from three channel HAVINGs, UNION ALL of the
  // channels, outer ROLLUP over (channel, brand).
  private def q14Channel(flag: String): String =
    s"""  SELECT '$flag' AS channel, p_brand,
       |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS sales,
       |    COUNT(*) AS number_sales
       |  FROM lineitem, part
       |  WHERE l_partkey = p_partkey AND l_returnflag = '$flag'
       |    AND l_partkey IN (SELECT item FROM cross_items)
       |  GROUP BY p_brand
       |  HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
       |         > (SELECT average_sales FROM avg_sales)""".stripMargin
  private val q14 =
    s"""WITH cross_items AS (
       |  SELECT l_partkey AS item FROM lineitem WHERE l_returnflag = 'A'
       |  INTERSECT
       |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
       |  INTERSECT
       |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
       |avg_sales AS (
       |  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
       |       / COUNT(*) AS average_sales
       |  FROM lineitem),
       |channel_sales AS (
       |${q14Channel("A")}
       |  UNION ALL
       |${q14Channel("N")}
       |  UNION ALL
       |${q14Channel("R")})
       |SELECT channel, p_brand, CAST(SUM(sales) AS DOUBLE) AS sum_sales,
       |  CAST(SUM(number_sales) AS BIGINT) AS sum_number_sales
       |FROM channel_sales
       |GROUP BY ROLLUP (channel, p_brand)
       |ORDER BY channel NULLS FIRST, p_brand NULLS FIRST""".stripMargin

  // q23-shape: frequent items (per-year count HAVING) + best customers
  // (spend above half the max customer spend — scalar MAX subquery,
  // exact decimal cross-multiplication), final-year sum over both INs.
  private val q23 =
    """WITH frequent_items AS (
      |  SELECT l_partkey AS item
      |  FROM lineitem, orders
      |  WHERE l_orderkey = o_orderkey
      |  GROUP BY l_partkey, EXTRACT(YEAR FROM o_orderdate)
      |  HAVING COUNT(*) > 6),
      |customer_sales AS (
      |  SELECT o_custkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS csales
      |  FROM lineitem, orders
      |  WHERE l_orderkey = o_orderkey
      |  GROUP BY o_custkey),
      |best_customers AS (
      |  SELECT o_custkey FROM customer_sales
      |  WHERE 2 * csales > (SELECT MAX(csales) FROM customer_sales))
      |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sales,
      |  COUNT(*) AS n
      |FROM lineitem, orders
      |WHERE l_orderkey = o_orderkey
      |  AND EXTRACT(YEAR FROM o_orderdate) = 1997
      |  AND l_partkey IN (SELECT item FROM frequent_items)
      |  AND o_custkey IN (SELECT o_custkey FROM best_customers)""".stripMargin

  // q24-shape: grouped CTE re-aggregated with a HAVING against a scalar
  // fraction of the CTE-wide total (sum·cnt > 3·total ⇔ sum > 3·avg).
  private val q24 =
    """WITH ssales AS (
      |  SELECT c_name, s_name, n_name,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS netpaid
      |  FROM lineitem, orders, customer, supplier, nation
      |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      |    AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |    AND l_returnflag = 'R'
      |  GROUP BY c_name, s_name, n_name)
      |SELECT c_name, s_name, CAST(SUM(netpaid) AS DOUBLE) AS paid
      |FROM ssales
      |GROUP BY c_name, s_name
      |HAVING CAST(SUM(netpaid) AS DOUBLE) * (SELECT COUNT(*) FROM ssales)
      |     > 3 * (SELECT CAST(SUM(netpaid) AS DOUBLE) FROM ssales)
      |ORDER BY c_name, s_name""".stripMargin

  // q31-shape: per-nation quarter-over-quarter growth compared across two
  // channels (4-way join of two grouped CTE instances each).
  private val q31 =
    """WITH ss AS (
      |  SELECT n_name, CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS store_sales
      |  FROM lineitem, orders, customer, nation
      |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      |    AND c_nationkey = n_nationkey AND l_returnflag = 'N'
      |    AND EXTRACT(YEAR FROM o_orderdate) = 1997
      |  GROUP BY n_name, EXTRACT(QUARTER FROM o_orderdate)),
      |ws AS (
      |  SELECT n_name, CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS web_sales
      |  FROM lineitem, orders, customer, nation
      |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      |    AND c_nationkey = n_nationkey AND l_returnflag = 'R'
      |    AND EXTRACT(YEAR FROM o_orderdate) = 1997
      |  GROUP BY n_name, EXTRACT(QUARTER FROM o_orderdate))
      |SELECT ss1.n_name,
      |  CAST(ss1.store_sales AS DOUBLE) AS store_q1,
      |  CAST(ss2.store_sales AS DOUBLE) AS store_q2,
      |  CAST(ws1.web_sales AS DOUBLE) AS web_q1,
      |  CAST(ws2.web_sales AS DOUBLE) AS web_q2
      |FROM ss ss1, ss ss2, ws ws1, ws ws2
      |WHERE ss1.n_name = ss2.n_name AND ss1.n_name = ws1.n_name AND ss1.n_name = ws2.n_name
      |  AND ss1.qtr = 1 AND ss2.qtr = 2 AND ws1.qtr = 1 AND ws2.qtr = 2
      |  AND ss1.store_sales > 0 AND ws1.web_sales > 0
      |  AND CAST(ws2.web_sales AS DOUBLE) * CAST(ss1.store_sales AS DOUBLE)
      |    > CAST(ss2.store_sales AS DOUBLE) * CAST(ws1.web_sales AS DOUBLE)
      |ORDER BY ss1.n_name""".stripMargin

  // q35-shape: EXISTS and (EXISTS OR EXISTS) against three correlated
  // subqueries, grouped demographic stats over the survivors.
  private val q35 =
    """SELECT n_name, c_mktsegment, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal,
      |  CAST(MIN(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS min_bal,
      |  CAST(MAX(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS max_bal
      |FROM customer, nation
      |WHERE c_nationkey = n_nationkey
      |  AND EXISTS (SELECT 1 FROM orders WHERE c_custkey = o_custkey AND o_orderstatus = 'O')
      |  AND (EXISTS (SELECT 1 FROM orders, lineitem
      |         WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey AND l_returnflag = 'A')
      |    OR EXISTS (SELECT 1 FROM orders, lineitem
      |         WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey AND l_returnflag = 'R'))
      |GROUP BY n_name, c_mktsegment
      |ORDER BY n_name, c_mktsegment""".stripMargin

  // q36-shape: gross-margin ratio over ROLLUP(type, brand) with RANK
  // partitioned by the grouping level (lochierarchy) and the parent key.
  private val q36 =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)
      |     / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS gross_margin,
      |  p_type, p_brand,
      |  CAST(GROUPING(p_type) + GROUPING(p_brand) AS BIGINT) AS lochierarchy,
      |  CAST(RANK() OVER (
      |    PARTITION BY GROUPING(p_type) + GROUPING(p_brand),
      |      CASE WHEN GROUPING(p_brand) = 0 THEN p_type END
      |    ORDER BY CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)
      |           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) ASC) AS BIGINT) AS rank_within_parent
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |GROUP BY ROLLUP (p_type, p_brand)
      |ORDER BY lochierarchy DESC, p_type NULLS FIRST, rank_within_parent""".stripMargin

  // q39-shape: per-(supplier, month) mean and stddev — stddev restated
  // from exact decimal sums (n·Σx² − (Σx)²) so both engines agree
  // bit-for-bit — consecutive-month self-join of the high-variance rows.
  private val q39 =
    """WITH inv AS (
      |  SELECT l_suppkey, CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS mon,
      |    COUNT(*) AS n,
      |    SUM(CAST(l_quantity AS DECIMAL(12,2))) AS s,
      |    SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS sq
      |  FROM lineitem
      |  WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
      |  GROUP BY l_suppkey, EXTRACT(MONTH FROM l_shipdate)
      |  HAVING COUNT(*) > 1),
      |stats AS (
      |  SELECT l_suppkey, mon,
      |    CAST(s AS DOUBLE) / n AS mean,
      |    SQRT((n * CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / (n * (n - 1.0))) AS stdev
      |  FROM inv),
      |candidates AS (
      |  SELECT l_suppkey, mon, mean, stdev FROM stats
      |  WHERE mean > 0 AND 4 * stdev > 3 * mean)
      |SELECT c1.l_suppkey, c1.mon AS mon1, c1.mean AS mean1, c1.stdev AS stdev1,
      |  c2.mon AS mon2, c2.mean AS mean2, c2.stdev AS stdev2
      |FROM candidates c1, candidates c2
      |WHERE c1.l_suppkey = c2.l_suppkey AND c1.mon + 1 = c2.mon
      |ORDER BY c1.l_suppkey, c1.mon""".stripMargin

  // q47-shape: monthly brand sales vs the yearly average (deviation filter
  // cross-multiplied on exact decimals), sequenced by RANK and self-joined
  // to the previous and next month (the lag/lead triple).
  private val q47 =
    """WITH monthly AS (
      |  SELECT p_brand, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
      |    CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mon,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS msum
      |  FROM lineitem, orders, part
      |  WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
      |  GROUP BY p_brand, EXTRACT(YEAR FROM o_orderdate), EXTRACT(MONTH FROM o_orderdate)),
      |yearly AS (
      |  SELECT p_brand, yr, SUM(msum) AS ysum, COUNT(*) AS n_months
      |  FROM monthly GROUP BY p_brand, yr),
      |v1 AS (
      |  SELECT m.p_brand, m.yr, m.mon, m.msum, y.ysum, y.n_months,
      |    RANK() OVER (PARTITION BY m.p_brand ORDER BY m.yr, m.mon) AS rn
      |  FROM monthly m, yearly y
      |  WHERE m.p_brand = y.p_brand AND m.yr = y.yr)
      |SELECT v1.p_brand, v1.yr, v1.mon,
      |  CAST(v1.msum AS DOUBLE) AS sum_sales,
      |  CAST(v1.ysum AS DOUBLE) / v1.n_months AS avg_monthly_sales,
      |  CAST(v1_lag.msum AS DOUBLE) AS psum,
      |  CAST(v1_lead.msum AS DOUBLE) AS nsum
      |FROM v1, v1 v1_lag, v1 v1_lead
      |WHERE v1.p_brand = v1_lag.p_brand AND v1.p_brand = v1_lead.p_brand
      |  AND v1.rn = v1_lag.rn + 1 AND v1.rn = v1_lead.rn - 1
      |  AND v1.yr = 1997
      |  AND ABS(CAST(v1.msum AS DOUBLE) * v1.n_months - CAST(v1.ysum AS DOUBLE)) * 10
      |    > 3 * CAST(v1.ysum AS DOUBLE)
      |ORDER BY v1.p_brand, v1.yr, v1.mon""".stripMargin

  // q49-shape: per-channel return ratios ranked two ways (quantity- and
  // currency-based), top-10 by either rank, channels unioned.
  private def q49Channel(status: String): String =
    s"""  SELECT '$status' AS channel, l_partkey AS item,
       |    SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS ret,
       |    SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty,
       |    SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS ret_amt,
       |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS amt
       |  FROM lineitem WHERE l_linestatus = '$status' GROUP BY l_partkey""".stripMargin
  private val q49 =
    s"""WITH in_chan AS (
       |${q49Channel("F")}
       |  UNION ALL
       |${q49Channel("O")}),
       |ranked AS (
       |  SELECT channel, item,
       |    CAST(ret AS DOUBLE) / CAST(qty AS DOUBLE) AS return_ratio,
       |    RANK() OVER (PARTITION BY channel ORDER BY CAST(ret AS DOUBLE) / CAST(qty AS DOUBLE), item) AS return_rank,
       |    RANK() OVER (PARTITION BY channel ORDER BY CAST(ret_amt AS DOUBLE) / CAST(amt AS DOUBLE), item) AS currency_rank
       |  FROM in_chan WHERE qty > 0 AND amt > 0)
       |SELECT channel, item, return_ratio, CAST(return_rank AS BIGINT) AS return_rank,
       |  CAST(currency_rank AS BIGINT) AS currency_rank
       |FROM ranked
       |WHERE return_rank <= 10 OR currency_rank <= 10
       |ORDER BY channel, return_rank, currency_rank, item""".stripMargin

  // q51-shape: per-item cumulative channel revenues (SUM over an
  // aggregate, ROWS UNBOUNDED PRECEDING) FULL OUTER JOINed, running MAX
  // of each side compared — web pulling ahead of store. Cumulative sums
  // stay DECIMAL (exact), so the comparison has no FP-order hazard.
  private def q51Channel(flag: String): String =
    s"""  SELECT item, ym,
       |    SUM(SUM(price)) OVER (PARTITION BY item ORDER BY ym
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume_sales
       |  FROM (SELECT l_partkey AS item,
       |          CAST(EXTRACT(YEAR FROM l_shipdate) * 100 + EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS ym,
       |          CAST(l_extendedprice AS DECIMAL(12,2)) AS price
       |        FROM lineitem
       |        WHERE l_returnflag = '$flag' AND l_partkey < 200) t
       |  GROUP BY item, ym""".stripMargin
  private val q51 =
    s"""WITH web_v1 AS (
       |${q51Channel("R")}),
       |store_v1 AS (
       |${q51Channel("N")}),
       |x AS (
       |  SELECT CASE WHEN web.item IS NOT NULL THEN web.item ELSE store.item END AS item,
       |    CASE WHEN web.ym IS NOT NULL THEN web.ym ELSE store.ym END AS ym,
       |    web.cume_sales AS web_sales, store.cume_sales AS store_sales
       |  FROM web_v1 web FULL OUTER JOIN store_v1 store
       |    ON web.item = store.item AND web.ym = store.ym)
       |SELECT item, ym,
       |  CAST(web_cumulative AS DOUBLE) AS web_cumulative,
       |  CAST(store_cumulative AS DOUBLE) AS store_cumulative
       |FROM (
       |  SELECT item, ym,
       |    MAX(web_sales) OVER (PARTITION BY item ORDER BY ym ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS web_cumulative,
       |    MAX(store_sales) OVER (PARTITION BY item ORDER BY ym ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS store_cumulative
       |  FROM x) y
       |WHERE web_cumulative > store_cumulative
       |ORDER BY item, ym""".stripMargin

  // q67-shape: sales over a deep ROLLUP (5 dims), RANK per category
  // partition (NULL rollup keys form their own partition), top-5 kept.
  private val q67 =
    """SELECT * FROM (
      |  SELECT p_type, p_brand, l_linestatus, yr, qtr, sumsales,
      |    CAST(RANK() OVER (PARTITION BY p_type ORDER BY sumsales DESC NULLS LAST) AS BIGINT) AS rk
      |  FROM (
      |    SELECT p_type, p_brand, l_linestatus,
      |      CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
      |      CAST(EXTRACT(QUARTER FROM l_shipdate) AS BIGINT) AS qtr,
      |      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sumsales
      |    FROM lineitem, part
      |    WHERE l_partkey = p_partkey AND EXTRACT(YEAR FROM l_shipdate) = 1997
      |    GROUP BY ROLLUP (p_type, p_brand, l_linestatus, EXTRACT(YEAR FROM l_shipdate), EXTRACT(QUARTER FROM l_shipdate))) dw1) dw2
      |WHERE rk <= 5
      |ORDER BY p_type NULLS FIRST, p_brand NULLS FIRST, l_linestatus NULLS FIRST,
      |  yr NULLS FIRST, qtr NULLS FIRST, rk, sumsales""".stripMargin

  // q70-shape: ROLLUP(region, nation) with RANK partitioned by grouping
  // level, nations pre-filtered by a windowed-rank IN subquery.
  private val q70 =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_sum,
      |  r_name, n_name,
      |  CAST(GROUPING(r_name) + GROUPING(n_name) AS BIGINT) AS lochierarchy,
      |  CAST(RANK() OVER (
      |    PARTITION BY GROUPING(r_name) + GROUPING(n_name),
      |      CASE WHEN GROUPING(n_name) = 0 THEN r_name END
      |    ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(12,2))) DESC) AS BIGINT) AS rank_within_parent
      |FROM lineitem, supplier, nation, region
      |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |  AND n_regionkey = r_regionkey
      |  AND n_name IN (
      |    SELECT n_name FROM (
      |      SELECT n_name, RANK() OVER (ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(12,2))) DESC) AS ranking
      |      FROM lineitem, supplier, nation
      |      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |      GROUP BY n_name) tmp
      |    WHERE ranking <= 12)
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY lochierarchy DESC, r_name NULLS FIRST, n_name NULLS FIRST, rank_within_parent""".stripMargin

  // q88-shape: eight scalar-count subqueries cross-joined into one row.
  private val q88 =
    "SELECT * FROM\n" + (1 to 8).map { m =>
      s"""  (SELECT COUNT(*) AS h$m FROM lineitem WHERE EXTRACT(MONTH FROM l_shipdate) = $m AND l_quantity < 25) s$m"""
    }.mkString(",\n")

  // q95-shape: multi-supplier orders CTE used twice (plain IN + an IN
  // whose subquery itself INs the CTE), distinct-order aggregate.
  private val q95 =
    """WITH ws_wh AS (
      |  SELECT DISTINCT l1.l_orderkey
      |  FROM lineitem l1, lineitem l2
      |  WHERE l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey)
      |SELECT COUNT(DISTINCT o_orderkey) AS order_count,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      |FROM orders
      |WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
      |  AND o_orderstatus = 'F'
      |  AND o_orderkey IN (SELECT l_orderkey FROM ws_wh)
      |  AND o_orderkey IN (
      |    SELECT l_orderkey FROM lineitem
      |    WHERE l_returnflag = 'R' AND l_orderkey IN (SELECT l_orderkey FROM ws_wh))""".stripMargin

  // q97-shape: two per-channel DISTINCT (customer, item) CTEs FULL OUTER
  // JOINed, counting both/store-only/web-only.
  private val q97 =
    """WITH ssci AS (
      |  SELECT DISTINCT o_custkey AS customer, l_partkey AS item
      |  FROM lineitem, orders
      |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'N'),
      |csci AS (
      |  SELECT DISTINCT o_custkey AS customer, l_partkey AS item
      |  FROM lineitem, orders
      |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |SELECT CAST(SUM(CASE WHEN ssci.customer IS NOT NULL AND csci.customer IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS store_only,
      |  CAST(SUM(CASE WHEN ssci.customer IS NULL AND csci.customer IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS catalog_only,
      |  CAST(SUM(CASE WHEN ssci.customer IS NOT NULL AND csci.customer IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS store_and_catalog
      |FROM ssci FULL OUTER JOIN csci
      |  ON ssci.customer = csci.customer AND ssci.item = csci.item""".stripMargin

  private val all: Map[String, String] = Map(
    "q_tpcds4" -> q4,
    "q_tpcds9" -> q9,
    "q_tpcds14" -> q14,
    "q_tpcds23" -> q23,
    "q_tpcds24" -> q24,
    "q_tpcds31" -> q31,
    "q_tpcds35" -> q35,
    "q_tpcds36" -> q36,
    "q_tpcds39" -> q39,
    "q_tpcds47" -> q47,
    "q_tpcds49" -> q49,
    "q_tpcds51" -> q51,
    "q_tpcds67" -> q67,
    "q_tpcds70" -> q70,
    "q_tpcds88" -> q88,
    "q_tpcds95" -> q95,
    "q_tpcds97" -> q97
  )

  val queries: Map[String, QFn] = all.map { case (name, sql) =>
    name -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(sql)
    }): (String, QFn)
  }

  // identical SQL text runs as the oracle (dialect-shared by design)
  val oracles: Map[String, String] = all
}
