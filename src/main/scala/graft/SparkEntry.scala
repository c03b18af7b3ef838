package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has a `queries` entry, and
  * (when SQL-expressible) a DuckDB `oracleSql` entry with IDENTICAL output
  * column names, producing deterministic values (rounded money aggregates,
  * tie-broken top-k orderings).
  */
object SparkEntry {

  /** Flagship query (TPC-H Q3) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3Batch(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference parity: TPC-H Q3 (SURVEY.md §0) ---
    "q3_batch" -> (Relational.q3Batch _),
    "q3_sql" -> (Relational.q3ViaSql _),
    // --- §2.3 projections / filters ---
    "filter_customer_segment" -> (Relational.filterCustomerSegment _),
    "filter_orders_date" -> (Relational.filterOrdersDate _),
    "filter_lineitem_date" -> (Relational.filterLineitemDate _),
    // --- §2.4 joins ---
    "join_customer_orders" -> (Relational.joinCustomerOrders _),
    "join_orders_lineitem" -> (Relational.joinOrdersLineitem _),
    "join_broadcast_dims" -> (Relational.joinBroadcastDims _),
    "join_semi" -> (Relational.joinSemi _),
    "join_anti" -> (Relational.joinAnti _),
    "join_outer" -> (Relational.joinOuter _),
    // --- §2.5 aggregations ---
    "agg_group_sum" -> (Relational.aggGroupSum _),
    "agg_stats" -> (Relational.aggStats _),
    "agg_rollup" -> (Relational.aggRollup _),
    // --- §2.6 sort / limit / top-k ---
    "topn_orders" -> (Relational.topNOrders _),
    "window_rank" -> (Relational.windowRank _),
    // --- §2.10 set ops ---
    "set_ops" -> (Relational.setOps _),
    // --- §2.2 sink contract (JSON message shape) ---
    "sink_json_contract" -> (Relational.sinkJsonContract _),
    // --- §2.8 changelog streaming (signed-weight incremental Q3) ---
    "changelog_counts" -> (streaming.StreamQueries.changelogCounts _),
    "stream_q3_converged" -> (streaming.StreamQueries.q3Converged _),
    "stream_q3_full_cycle" -> (streaming.StreamQueries.q3FullCycle _),
  )

  def oracleSql: Map[String, String] = Map(
    "q3_batch" -> Relational.q3Sql,
    "q3_sql" -> Relational.q3Sql,
    "filter_customer_segment" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    "filter_orders_date" ->
      """SELECT o_orderkey, o_custkey, o_orderdate FROM orders
        |WHERE CAST(o_orderdate AS DATE) < DATE '1995-03-15'""".stripMargin,
    "filter_lineitem_date" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice, l_discount
        |FROM lineitem WHERE CAST(l_shipdate AS DATE) > DATE '1995-03-15'""".stripMargin,
    "join_customer_orders" ->
      """SELECT c_custkey, c_name, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name""".stripMargin,
    "join_orders_lineitem" ->
      """SELECT o_orderkey, o_orderdate, COUNT(*) AS n_lines,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey, o_orderdate""".stripMargin,
    "join_broadcast_dims" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "join_outer" ->
      """SELECT c_nationkey, COUNT(*) AS n_orders
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey""".stripMargin,
    "agg_group_sum" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_revenue,
        |       COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "agg_stats" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |       COUNT(DISTINCT o_custkey) AS n_customers,
        |       MIN(o_totalprice) AS min_price,
        |       MAX(o_totalprice) AS max_price,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "agg_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)""".stripMargin,
    "topn_orders" ->
      """SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,
    "window_rank" ->
      """SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         CAST(ROW_NUMBER() OVER (
        |           PARTITION BY o_orderpriority
        |           ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3""".stripMargin,
    "set_ops" ->
      """SELECT cohort, COUNT(*) AS n_users FROM (
        |  SELECT user_id, 'purchase_and_error' AS cohort FROM (
        |    SELECT user_id FROM events WHERE event_type = 'purchase'
        |    INTERSECT
        |    SELECT user_id FROM events WHERE event_type = 'error') a
        |  UNION ALL
        |  SELECT user_id, 'view_never_click' AS cohort FROM (
        |    SELECT user_id FROM events WHERE event_type = 'view'
        |    EXCEPT
        |    SELECT user_id FROM events WHERE event_type = 'click') b
        |) u GROUP BY cohort""".stripMargin,
    "sink_json_contract" ->
      s"""WITH top AS (${Relational.q3Sql}),
         |ranked AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (
         |    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC) AS INTEGER) AS rank
         |  FROM top)
         |SELECT rank,
         |       '{"rank":' || CAST(rank AS VARCHAR)
         |       || ',"orderkey":' || CAST(l_orderkey AS VARCHAR)
         |       || ',"revenue":' || CAST(CAST(revenue AS DECIMAL(18,2)) AS VARCHAR)
         |       || ',"orderdate":"' || CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
         |       || '"}' AS json
         |FROM ranked""".stripMargin,
    "changelog_counts" ->
      """SELECT relation, action, n FROM (
        |  SELECT 'customer' AS relation, 'Insert' AS action, COUNT(*) AS n FROM customer
        |  UNION ALL SELECT 'customer', 'Delete', COUNT(*) FROM customer
        |  UNION ALL SELECT 'orders', 'Insert', COUNT(*) FROM orders
        |  UNION ALL SELECT 'orders', 'Delete', COUNT(*) FROM orders
        |  UNION ALL SELECT 'lineitem', 'Insert', COUNT(*) FROM lineitem
        |  UNION ALL SELECT 'lineitem', 'Delete', COUNT(*) FROM lineitem) t""".stripMargin,
    "stream_q3_converged" ->
      """SELECT l_orderkey,
        |       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
        |       o_orderpriority,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND CAST(o_orderdate AS DATE) < DATE '1995-03-15'
        |  AND CAST(l_shipdate AS DATE) > DATE '1995-03-15'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
        |LIMIT 20""".stripMargin,
    "stream_q3_full_cycle" ->
      """SELECT CAST(NULL AS BIGINT) AS l_orderkey,
        |       CAST(NULL AS VARCHAR) AS o_orderdate,
        |       CAST(NULL AS VARCHAR) AS o_orderpriority,
        |       CAST(NULL AS DOUBLE) AS revenue
        |WHERE 1 = 0""".stripMargin,
  )
}
