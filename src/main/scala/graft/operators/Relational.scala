package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables

/** Batch relational operator surface (SURVEY.md §2) re-expressed Spark-first.
  *
  * The reference implements TPC-H Q3 (scan → filter → 3-way equi-join →
  * group-sum → order/limit) five ways; here the declarative DataFrame plan
  * subsumes all of them: Catalyst does predicate pushdown, column pruning,
  * join selection (broadcast for the small post-filter build sides) and
  * partial/final hash aggregation that the reference hand-codes
  * (TPCHQuery3_BatchProcessor.java:137–374, no_websocket.java:168–241).
  *
  * Schema note: the driver fixtures (TESTDATA.md) have no `o_shippriority`
  * column, so `o_orderpriority` plays its role in Q3's grouping; money
  * columns are doubles, so aggregates cast to exact decimal before summing
  * (see [[d2]]) to be oracle-stable across summation orders.
  */
object Relational {

  /** The reference's Q3 constant: orders strictly before / shipments
    * strictly after this date (TPCHQuery3SQL_Batch.java:110–111).
    */
  val Q3Date = "1995-03-15"

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(spark, dir, name)

  /** Money columns are stored as doubles but carry exactly 2 decimal digits;
    * casting to decimal before arithmetic makes every aggregate EXACT and
    * summation-order-independent (a double `round(sum(..),2)` flips on .xx5
    * boundaries depending on add order — observed at sf0.01). The exact
    * decimal sum cast back to double is bit-identical on Spark and DuckDB.
    */
  def d2(c: Column): Column = c.cast("decimal(18,2)")

  /** Exact money sum, emitted as a stable double. */
  def moneySum(c: Column): Column = sum(d2(c)).cast("double")

  /** `l_extendedprice * (1 - l_discount)` — the only scalar expression in the
    * reference (TPCHQuery3SQL_Batch.java:102; no_websocket.java:502) — in
    * exact decimal arithmetic.
    */
  def revenueExpr: Column = d2(col("l_extendedprice")) * (lit(1) - d2(col("l_discount")))

  // ---------------------------------------------------------------------
  // TPC-H Q3 — the flagship (SURVEY.md §0 capability 1)
  // ---------------------------------------------------------------------

  /** Q3 via the DataFrame API (mirrors the hand-built DataStream graph of
    * TPCHQuery3_BatchProcessor.java:137–374, minus its lost-lineitem defect —
    * SURVEY.md §7.4a).
    */
  def q3Batch(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = to_date(lit(Q3Date))
    val customer = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val orders = t(spark, dir, "orders")
      .filter(to_date(col("o_orderdate")) < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val lineitem = t(spark, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    customer
      .join(orders, col("c_custkey") === col("o_custkey"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(revenueExpr).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
      .limit(20)
  }

  /** The same Q3 as SQL text — runs verbatim on Spark and DuckDB, mirroring
    * the reference's Table-API oracle (TPCHQuery3SQL_Batch.java:97–124).
    */
  val q3Sql: String =
    s"""SELECT l_orderkey,
       |       o_orderdate,
       |       o_orderpriority,
       |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
       |                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
       |FROM customer, orders, lineitem
       |WHERE c_mktsegment = 'BUILDING'
       |  AND c_custkey = o_custkey
       |  AND l_orderkey = o_orderkey
       |  AND CAST(o_orderdate AS DATE) < DATE '$Q3Date'
       |  AND CAST(l_shipdate AS DATE) > DATE '$Q3Date'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
       |LIMIT 20""".stripMargin

  def q3ViaSql(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q3Sql)
  }

  /** TPC-H Q1 proper — the pricing summary report, all eight aggregates
    * over one scan: the canonical "how fast is your scan+agg" kernel. One
    * map-side-combined hash aggregate on the two low-cardinality flags;
    * every money aggregate is exact decimal (the chained
    * `price·(1−disc)·(1+tax)` stays a decimal product), averages divide
    * the exact sums at the edge — engine-identical closed forms.
    */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = to_date(lit(Q3Date))
    val li = t(spark, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) <= cutoff)
    val disc = lit(1) - d2(col("l_discount"))
    val chrg = d2(col("l_extendedprice")) * disc * (lit(1) + d2(col("l_tax")))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum(d2(col("l_extendedprice")) * disc).cast("double").as("sum_disc_price"),
        sum(chrg).cast("double").as("sum_charge"),
        // averages as DOUBLE division of the exact sums: decimal division
        // scale rules differ between engines, IEEE double division doesn't
        (sum(d2(col("l_quantity"))).cast("double")
          / count(lit(1)).cast("double")).as("avg_qty"),
        (sum(d2(col("l_extendedprice"))).cast("double")
          / count(lit(1)).cast("double")).as("avg_price"),
        (sum(d2(col("l_discount"))).cast("double")
          / count(lit(1)).cast("double")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1OracleSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
       |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
       |           * (1 - CAST(l_discount AS DECIMAL(18,2)))
       |           * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS avg_qty,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS avg_price,
       |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE CAST(l_shipdate AS DATE) <= DATE '$Q3Date'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q5 shape — local-supplier revenue per nation: the SIX-WAY join
    * (region → nation → {customer, supplier} → orders → lineitem with the
    * c_nationkey = s_nationkey locality condition) the reference never
    * attempts, and the classic join-reorder stress test. Declared flat;
    * Catalyst + AQE pick the order and broadcast the three dimension
    * tables (region/nation are KB-sized at any SF, supplier after the
    * region filter is dimension-sized) so the only shuffles are the
    * customer⋈orders⋈lineitem fact chain. Exact-decimal revenue, stable
    * double at the edge, same money discipline as Q3.
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val lo = to_date(lit("1996-01-01")); val hi = to_date(lit("1997-01-01"))
    t(spark, dir, "region").filter(col("r_name") === "ASIA")
      .join(t(spark, dir, "nation"), col("n_regionkey") === col("r_regionkey"))
      .join(t(spark, dir, "supplier"), col("s_nationkey") === col("n_nationkey"))
      .join(t(spark, dir, "customer"), col("c_nationkey") === col("s_nationkey"))
      .join(t(spark, dir, "orders"),
        col("o_custkey") === col("c_custkey") &&
          to_date(col("o_orderdate")) >= lo && to_date(col("o_orderdate")) < hi)
      .join(t(spark, dir, "lineitem"),
        col("l_orderkey") === col("o_orderkey") && col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"))
      .agg(sum(revenueExpr).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5OracleSql: String =
    """SELECT n_name,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |       count(*) AS n_lines
      |FROM region, nation, supplier, customer, orders, lineitem
      |WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
      |  AND s_nationkey = n_nationkey AND c_nationkey = s_nationkey
      |  AND o_custkey = c_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey
      |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(o_orderdate AS DATE) <  DATE '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q10 shape — top returned-item customers: the
    * fact-chain-then-rank report (customer ⋈ orders ⋈ returned lineitem ⋈
    * nation, one quarter, top 20 by lost revenue). Fact joins shuffle on
    * their keys; the nation dim broadcasts; the top-20 is
    * TakeOrderedAndProject, never a global sort.
    */
  def q10Returned(spark: SparkSession, dir: String): DataFrame = {
    val lo = to_date(lit("1996-01-01")); val hi = to_date(lit("1996-04-01"))
    t(spark, dir, "customer")
      .join(t(spark, dir, "nation"), col("n_nationkey") === col("c_nationkey"))
      .join(t(spark, dir, "orders"),
        col("o_custkey") === col("c_custkey") &&
          to_date(col("o_orderdate")) >= lo && to_date(col("o_orderdate")) < hi)
      .join(t(spark, dir, "lineitem"),
        col("l_orderkey") === col("o_orderkey") && col("l_returnflag") === "R")
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(revenueExpr).cast("double").as("revenue"),
        count(lit(1)).as("n_returned"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10OracleSql: String =
    """SELECT c_custkey, c_name, n_name,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |       count(*) AS n_returned
      |FROM customer, nation, orders, lineitem
      |WHERE n_nationkey = c_nationkey AND o_custkey = c_custkey
      |  AND l_orderkey = o_orderkey AND l_returnflag = 'R'
      |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(o_orderdate AS DATE) <  DATE '1996-04-01'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // Subquery decorrelation family (TPC-H Q4/Q17/Q18 shapes)
  // ---------------------------------------------------------------------
  // The reference has no subquery support at all; these three pin the
  // Catalyst rewrites a declarative engine gets for free — each is the
  // scale-critical transformation (a correlated subquery executed naively
  // is a per-row rescan; decorrelated it is one join):
  //   EXISTS            → left semi join               (q4 shape)
  //   IN (agg HAVING)   → aggregate + left semi join   (q18 shape)
  //   correlated scalar → aggregate + equi-join        (q17 shape)
  // Specs assert the physical plans contain the semi joins and never a
  // nested-loop/cartesian fallback.

  /** TPC-H Q4 shape — order-priority checking: orders in a quarter with at
    * least one returned line item, counted per priority. Spelled with a
    * correlated EXISTS; Catalyst plans it as one left semi join with the
    * returnflag filter pushed below the shuffle. (The fixture lacks
    * l_commitdate/l_receiptdate, so `l_returnflag = 'R'` plays Q4's
    * late-delivery predicate.) Integer counts ⇒ engine-exact.
    */
  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(o_orderdate AS DATE) <  DATE '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  def q4PriorityExists(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q4Sql)
  }

  /** TPC-H Q17 shape — small-quantity-order revenue: line items whose
    * quantity is below 20% of their part's average, grouped by brand. The
    * textbook spelling compares against `0.2 * avg(..)` from a correlated
    * scalar subquery; an IEEE average flips `<` on summation order across
    * engines, so the predicate is cross-multiplied into exact integers:
    * `qty < 0.2 * sum/cnt  ⇔  5·qty·cnt < sum` with decimal qty sums —
    * bit-stable on both engines while keeping TWO correlated scalar
    * subqueries for Catalyst to decorrelate into one per-part aggregate
    * joined back to the fact scan.
    */
  val q17Sql: String =
    """SELECT p_brand,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |       count(*) AS n_small
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey
      |  AND 5 * CAST(l_quantity AS DECIMAL(18,2))
      |        * (SELECT count(*) FROM lineitem l2
      |           WHERE l2.l_partkey = part.p_partkey)
      |      < (SELECT SUM(CAST(l_quantity AS DECIMAL(18,2))) FROM lineitem l2
      |         WHERE l2.l_partkey = part.p_partkey)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q17Sql)
  }

  /** TPC-H Q18 shape — large-volume customers: orders whose total quantity
    * exceeds 300, with their customer, top 20 by quantity. The
    * IN (GROUP BY … HAVING) subquery decorrelates to an aggregate + left
    * semi join; the outer three-way join then re-aggregates only the
    * surviving orders. Exact decimal quantity sums on both sides of the
    * HAVING ⇒ engine-exact membership.
    */
  val q18Sql: String =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
      |                     GROUP BY l_orderkey
      |                     HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
      |ORDER BY sum_qty DESC, o_orderkey
      |LIMIT 20""".stripMargin

  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q18Sql)
  }

  // ---------------------------------------------------------------------
  // TPC-H plan-shape completions (r7 wave 4). Six more canonical report
  // shapes, each exercising a DISTINCT Catalyst capability the suite did
  // not yet pin: a dual-role dimension (Q7), a conditional-aggregate ratio
  // (Q14), a null-aware anti join from NOT IN (Q16), disjunctive
  // predicate extraction (Q19), semi+anti self-joins from EXISTS/NOT
  // EXISTS over the same table (Q21), and uncorrelated scalar subqueries
  // feeding an anti join (Q22). All are identical SQL text on Spark and
  // DuckDB; money/quantity aggregates follow the exact-decimal convention
  // ([[d2]]) so both engines compute bit-identical values.
  // ---------------------------------------------------------------------

  /** TPC-H Q7 shape — volume shipping between two nations: the nation
    * dimension participates TWICE (supplier's and customer's nation), so
    * Catalyst must broadcast it on both legs and extract the symmetric
    * pair predicate. Five-way join, grouped by (supp_nation, cust_nation,
    * year). The year is cast to INT explicitly — DuckDB's EXTRACT yields
    * BIGINT, Spark's INT.
    */
  val q7Sql: String =
    """SELECT supp_nation, cust_nation, l_year,
      |       CAST(SUM(volume) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |         CAST(EXTRACT(YEAR FROM CAST(l_shipdate AS DATE)) AS INT) AS l_year,
      |         CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
      |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
      |  WHERE s_suppkey = l_suppkey
      |    AND o_orderkey = l_orderkey
      |    AND c_custkey = o_custkey
      |    AND s_nationkey = n1.n_nationkey
      |    AND c_nationkey = n2.n_nationkey
      |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |    AND CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
      |) shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  def q7NationVolume(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q7Sql)
  }

  /** TPC-H Q14 shape — promotion-effect ratio by ship month over one year:
    * a conditional aggregate (CASE inside SUM, no ELSE so non-promo rows
    * contribute NULL) divided by the total. Both sums are exact decimals
    * cast to double BEFORE the division, so the ratio is one IEEE divide
    * of bit-identical operands — engine-exact without rounding.
    */
  val q14Sql: String =
    """SELECT CAST(EXTRACT(MONTH FROM CAST(l_shipdate AS DATE)) AS INT) AS ship_month,
      |       CAST(100.0 AS DOUBLE)
      |         * CAST(SUM(CASE WHEN p_type = 'PROMO'
      |                         THEN CAST(l_extendedprice AS DECIMAL(18,2))
      |                              * (1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE)
      |         / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS promo_pct,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      |  AND CAST(l_shipdate AS DATE) <  DATE '1998-01-01'
      |GROUP BY ship_month
      |ORDER BY ship_month""".stripMargin

  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q14Sql)
  }

  /** TPC-H Q16 shape — parts/supplier relationship count: distinct
    * suppliers per (brand, type, size) bucket, excluding a supplier
    * denylist via NOT IN (subquery). The fixture has no partsupp table, so
    * lineitem plays the part↔supplier association. `l_suppkey NOT IN
    * (SELECT s_suppkey …)` is the canonical null-aware anti join shape —
    * the spec asserts the plan carries a LeftAnti (and, since s_suppkey is
    * small, a broadcast one) rather than a nested loop.
    */
  val q16Sql: String =
    """SELECT p_brand, p_type, p_size,
      |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM part, lineitem
      |WHERE p_partkey = l_partkey
      |  AND p_brand <> 'Brand#1'
      |  AND p_type <> 'PROMO'
      |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 500.0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  def q16SupplierCount(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q16Sql)
  }

  /** TPC-H Q19 shape — discounted revenue under three OR'd brand/size/
    * quantity envelopes. The equi-key `p_partkey = l_partkey` is repeated
    * inside every disjunct exactly as the TPC-H text spells it: Catalyst
    * must EXTRACT the common conjunct to plan a hash join, then push the
    * per-side residues (brand/size → part scan, quantity/flag → lineitem
    * scan) below the join. The spec asserts no product join survives.
    */
  val q19Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |       CAST(count(*) AS BIGINT) AS n_lines
      |FROM lineitem, part
      |WHERE (p_partkey = l_partkey AND p_brand = 'Brand#1'
      |       AND p_size BETWEEN 1 AND 10
      |       AND l_quantity >= 1 AND l_quantity <= 20 AND l_returnflag = 'N')
      |   OR (p_partkey = l_partkey AND p_brand = 'Brand#2'
      |       AND p_size BETWEEN 1 AND 20
      |       AND l_quantity >= 10 AND l_quantity <= 30 AND l_returnflag = 'N')
      |   OR (p_partkey = l_partkey AND p_brand = 'Brand#3'
      |       AND p_size BETWEEN 1 AND 30
      |       AND l_quantity >= 20 AND l_quantity <= 40 AND l_returnflag = 'N')""".stripMargin

  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q19Sql)
  }

  /** TPC-H Q21 shape — suppliers who alone returned goods on a shared
    * order: EXISTS (another supplier touched the order) AND NOT EXISTS
    * (another supplier also returned) — a semi join AND an anti join over
    * the SAME fact table with a non-equi residual (`l_suppkey <>`), the
    * multi-subquery decorrelation stress case. (The fixture lacks
    * commit/receipt dates, so `l_returnflag = 'R'` plays Q21's
    * late-delivery predicate, as in Q4.)
    */
  val q21Sql: String =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey
      |  AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F'
      |  AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin

  def q21WaitingSupplier(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q21Sql)
  }

  /** TPC-H Q22 shape — global sales opportunity: customers above the
    * average positive balance with no RECENT order (every fixture customer
    * has some order, so Q22's "never ordered" is spelled as dormant-since-
    * 1999 — same anti-join shape, non-degenerate result), bucketed by
    * nation. The average-balance threshold uses the cross-multiplied exact
    * form (`bal · cnt > sum` in decimals — an IEEE AVG flips `>` on
    * summation order across engines); the two uncorrelated scalar
    * subqueries become broadcast scalars, and NOT EXISTS becomes a left
    * anti join against the date-filtered orders scan.
    */
  val q22Sql: String =
    """SELECT CAST(c_nationkey AS INT) AS cntrycode,
      |       CAST(count(*) AS BIGINT) AS numcust,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE CAST(c_acctbal AS DECIMAL(18,2))
      |        * (SELECT count(*) FROM customer WHERE c_acctbal > 0.0)
      |      > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2)))
      |         FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND CAST(o_orderdate AS DATE) >= DATE '1999-01-01')
      |GROUP BY c_nationkey
      |ORDER BY cntrycode""".stripMargin

  def q22GlobalSales(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q22Sql)
  }

  /** TPC-H Q8 shape — national market share: the fraction of ASIA-market
    * ECONOMY-part revenue supplied by NATION_3, per order year. An
    * eight-way join where nation again plays two roles (the customer's
    * region membership and the supplier's nationality), and the share is
    * a conditional aggregate over the SAME grouped rows as its
    * denominator — one aggregate, two exact-decimal sums, one IEEE
    * divide (the Q14 discipline; COALESCE(…, 0) covers years where the
    * focal nation sold nothing, keeping the ratio non-NULL).
    */
  val q8Sql: String =
    """SELECT o_year,
      |       COALESCE(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume END) AS DOUBLE), 0.0)
      |         / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
      |       CAST(SUM(volume) AS DOUBLE) AS total_volume
      |FROM (
      |  SELECT CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) AS INT) AS o_year,
      |         CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
      |         n2.n_name AS nation
      |  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      |  WHERE p_partkey = l_partkey
      |    AND s_suppkey = l_suppkey
      |    AND l_orderkey = o_orderkey
      |    AND o_custkey = c_custkey
      |    AND c_nationkey = n1.n_nationkey
      |    AND n1.n_regionkey = r_regionkey
      |    AND r_name = 'ASIA'
      |    AND s_nationkey = n2.n_nationkey
      |    AND p_type = 'ECONOMY'
      |) all_nations
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q8Sql)
  }

  /** TPC-H Q13 shape — customer order-count distribution: a LEFT OUTER
    * join with a predicate ON THE JOIN CONDITION (not a WHERE — customers
    * whose orders all fail the filter must survive with count 0), then a
    * histogram of the per-customer counts: aggregate-of-aggregate, the
    * one TPC-H shape exercising outer-join semantics under grouping.
    * Integer counts ⇒ engine-exact.
    */
  val q13Sql: String =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey
      |) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  def q13OrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q13Sql)
  }

  /** TPC-H Q15 shape — top supplier by quarterly revenue: an aggregated
    * CTE (the reference view) consumed TWICE — once as the join input and
    * once under a scalar MAX subquery — with the top filter comparing the
    * two. The revenue stays an exact decimal through the MAX and the
    * equality (a double here could tie-break differently per engine),
    * cast to double only in the output projection.
    */
  val q15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
      |  FROM lineitem
      |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      |    AND CAST(l_shipdate AS DATE) <  DATE '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
      |FROM supplier, revenue
      |WHERE s_suppkey = supplier_no
      |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q15Sql)
  }

  /** TPC-H Q20 shape — suppliers with significant PROMO-part volume:
    * CHAINED membership subqueries (an IN whose inner query itself
    * filters by another IN and aggregates under HAVING) — two stacked
    * semi joins with an aggregate between them, the nesting depth Q18
    * doesn't reach. Exact-decimal quantity sum under the HAVING.
    */
  val q20Sql: String =
    """SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      |  GROUP BY l_suppkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 2600)
      |ORDER BY s_name""".stripMargin

  def q20PromoSuppliers(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q20Sql)
  }

  /** TPC-H Q2 shape — minimum-cost supplier: a CORRELATED scalar MIN
    * subquery over a five-way dimension join, correlated on the OUTER
    * part key (the one canonical plan shape the r7 family still lacked).
    * Catalyst must decorrelate the inner MIN into a per-part aggregate
    * and join it back — the spec pins that no nested-loop survives. The
    * fixture has no partsupp, so lineitem plays the part↔supplier
    * association (as in Q16/Q20) and `l_extendedprice` plays the supply
    * cost; DISTINCT collapses repeat quotes of the same (part, supplier)
    * at the minimum price. Doubles compare raw on both engines (same
    * stored bits, same literal parse), never arithmetic.
    */
  val q2Sql: String =
    """SELECT DISTINCT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name,
      |                p_partkey, p_name
      |FROM part, supplier, lineitem, nation, region
      |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |  AND p_size <= 5 AND p_type = 'LARGE'
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE'
      |  AND l_extendedprice = (
      |    SELECT min(l2.l_extendedprice)
      |    FROM lineitem l2, supplier s2, nation n2, region r2
      |    WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
      |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      |      AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q2Sql)
  }

  /** TPC-H Q6 shape — the forecasting-revenue-change kernel: a pure
    * scan+filter+global-sum with BETWEEN-style range predicates on three
    * columns and zero joins — the query whose whole cost is how much the
    * scan prunes. All three predicates must reach the parquet reader as
    * pushed filters (the spec asserts `PushedFilters` carries the
    * quantity and discount bounds); the revenue is the exact-decimal
    * `price × discount` product summed once.
    */
  val q6Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |       CAST(count(*) AS BIGINT) AS n_lines
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q6Sql)
  }

  /** TPC-H Q9 shape — product-type profit by nation and year: a LIKE
    * substring filter on the part name (the plan's only non-equi
    * predicate, pushed to the part scan) feeding a five-way join whose
    * profit measure SUBTRACTS two exact-decimal products (revenue minus
    * cost — the fixture has no partsupp, so `p_retailprice × l_quantity`
    * plays the supply cost). Group keys come from two different dims
    * (supplier nation × order year) — the aggregate only forms after all
    * joins, the Q9 signature.
    */
  val q9Sql: String =
    """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
      |FROM (
      |  SELECT n_name AS nation,
      |         CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) AS INT) AS o_year,
      |         CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |           - CAST(p_retailprice AS DECIMAL(18,2))
      |             * CAST(l_quantity AS DECIMAL(18,2)) AS amount
      |  FROM part, supplier, lineitem, orders, nation
      |  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      |    AND p_name LIKE '%red%'
      |) profit
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin

  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q9Sql)
  }

  /** TPC-H Q11 shape — important parts: a grouped aggregate FILTERED BY A
    * GLOBAL SCALAR (HAVING sum > fraction × total), where the total is
    * the same aggregate re-run uncorrelated — Catalyst plans the scalar
    * subqueries once each and broadcasts the results into the HAVING
    * filter. TPC-H's `0.0001/SF` fraction is spelled scale-free: a part
    * is "important" if its value share exceeds 2× the average share
    * among parts seen in the region slice (`sum · n_parts > 2 · total`),
    * cross-multiplied in exact decimals so no IEEE division decides
    * membership. The fixture has no partsupp; value =
    * `l_extendedprice × l_quantity` over the EUROPE supplier slice.
    */
  val q11Sql: String =
    """SELECT l_partkey AS ps_partkey,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS value
      |FROM lineitem, supplier, nation, region
      |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |  AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
      |GROUP BY l_partkey
      |HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * CAST(l_quantity AS DECIMAL(18,2)))
      |       * (SELECT count(DISTINCT l_partkey)
      |          FROM lineitem, supplier, nation, region
      |          WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |            AND n_regionkey = r_regionkey AND r_name = 'EUROPE') >
      |       (SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |                   * CAST(l_quantity AS DECIMAL(18,2))) * 2
      |        FROM lineitem, supplier, nation, region
      |        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |          AND n_regionkey = r_regionkey AND r_name = 'EUROPE')
      |ORDER BY value DESC, ps_partkey""".stripMargin

  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q11Sql)
  }

  /** TPC-H Q12 shape — shipping priority counts: one order⋈lineitem join
    * feeding TWO complementary conditional counts per group (high- and
    * low-priority line counts from the same rows — the conditional-
    * aggregation signature). The fixture has no shipmode/commitdate, so
    * `l_linestatus` plays the shipmode group and the returnflag+shipdate
    * window plays the receipt predicate; the counts partition each group
    * exactly (high + low = group size, pinned in the spec).
    */
  val q12Sql: String =
    """SELECT l_linestatus AS linestatus,
      |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders, lineitem
      |WHERE o_orderkey = l_orderkey
      |  AND l_returnflag = 'R'
      |  AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
      |GROUP BY l_linestatus
      |ORDER BY linestatus""".stripMargin

  def q12ShipPriority(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q12Sql)
  }

  /** §2.1 CSV/TBL source roundtrip: stage lineitem as pipe-delimited text
    * (the reference's input format) and aggregate from the CSV scan; the
    * oracle computes the same aggregate from parquet, so equality proves
    * the schema'd CSV path (delimiter, dateFormat, DROPMALFORMED) is
    * lossless.
    */
  def sourceCsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    // staging path is unique per session AND per fixture dir: concurrent
    // sessions over the same fixture must not overwrite each other's stage
    // mid-scan (ADVICE r1), and one session may stage several fixtures
    val tmp = System.getProperty("java.io.tmpdir") +
      s"/graft_csv_${spark.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}/lineitem"
    graft.sources.Csv.stage(spark, dir, "lineitem", tmp)
    graft.sources.Csv.read(spark, tmp, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        moneySum(col("l_quantity")).as("sum_qty"),
        sum(revenueExpr).cast("double").as("revenue"))
  }

  /** §2.1 JSONL source roundtrip: stage documents as JSON lines and
    * aggregate from the JSON scan; the oracle computes the same aggregate
    * from parquet, so equality (incl. a distinct-content-hash column)
    * proves text survives JSON string escaping byte-for-byte.
    */
  def sourceJsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = System.getProperty("java.io.tmpdir") +
      s"/graft_json_${spark.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}/documents"
    graft.sources.Json.stage(spark, dir, "documents", tmp)
    graft.sources.Json.read(spark, tmp, "documents")
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(md5(col("text"))).as("n_distinct_texts"))
  }

  /** §2.1 ORC source roundtrip: stage orders as ORC and aggregate from the
    * ORC scan (stripe-statistics pushdown works like parquet row groups);
    * the oracle aggregates the same table from parquet, so equality proves
    * the format path end to end including the timestamp column.
    */
  def sourceOrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = System.getProperty("java.io.tmpdir") +
      s"/graft_orc_${spark.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}/orders"
    graft.sources.Orc.stage(spark, dir, "orders", tmp)
    graft.sources.Orc.read(spark, tmp, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        moneySum(col("o_totalprice")).as("sum_price"),
        max(to_date(col("o_orderdate")).cast("string")).as("max_date"))
  }

  /** §2.1 partitioned layout + partition pruning — THE 100 TB scan lever:
    * the table is written `partitionBy(lang)` (hive-style directories), so
    * a `lang = 'en'` predicate prunes to one directory at PLANNING time —
    * the other partitions are never listed, opened, or read. The pruning
    * is asserted on the physical plan in RelationalSpec (the scan's
    * partition filters must carry the predicate); the oracle computes the
    * same aggregate with a WHERE over the unpartitioned table.
    */
  def sourcePartitionedPruning(spark: SparkSession, dir: String): DataFrame = {
    val tmp = System.getProperty("java.io.tmpdir") +
      s"/graft_part_${spark.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}/documents"
    t(spark, dir, "documents")
      .write.mode("overwrite").partitionBy("lang").parquet(tmp)
    partitionPrunedFrame(spark, tmp)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
  }

  /** The pruned scan itself, exposed for the plan assertion in
    * RelationalSpec.
    */
  private[operators] def partitionPrunedFrame(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).filter(col("lang") === "en")

  /** Top-3 orders per priority class by price — through the CUSTOM
    * bounded-heap top-k-per-group operator ([[graft.plans.TopKPerGroup]]:
    * logical node + strategy + partial/final heap execs), NOT the
    * window-sort spelling. The ordering is total (price desc, key asc) so
    * the result is deterministic; the trailing orderBy is presentational.
    * TopKPerGroupSpec pins equality against the window spelling and the
    * absence of any Sort/Window under the heap nodes.
    */
  def topnPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    graft.plans.TopKPerGroup.topKPerGroup(o, Seq("o_orderpriority"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))
  }

  /** DYNAMIC partition pruning — the RUNTIME companion of
    * [[sourcePartitionedPruning]]'s planning-time prune, and the other
    * half of the 100 TB scan lever: here the partition predicate is not
    * in the query text at all. The fact table is hive-partitioned by
    * `lang`; which languages survive is decided by a JOIN against a dim
    * table carrying a keep flag. Spark's DPP turns the dim's broadcast
    * into a partition filter on the fact scan at execution time — the
    * dropped languages' directories are never read — which is exactly
    * the fact⋈filtered-dim shape of every warehouse star query at scale.
    * The plan-level proof (a `dynamicpruning` subquery in the scan's
    * PartitionFilters) is asserted in RelationalSpec; the driver query
    * proves values.
    */
  def joinDpp(spark: SparkSession, dir: String): DataFrame =
    dppJoinedFrame(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"))

  private[operators] def dppJoinedFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Marker-gated staging (ADVICE r5): both writes must complete before
    // the directory is reusable — a documents write that succeeded while
    // the lang_dim write failed must re-stage, not silently half-reuse.
    val base = graft.sources.Staging.ensure(
      graft.sources.Staging.dirFor(spark, "dpp", dir)) { out =>
      t(spark, dir, "documents")
        .write.mode("overwrite").partitionBy("lang").parquet(s"$out/documents")
      // the dim: every language, a keep flag on three. Staged as PARQUET,
      // not a literal frame: Catalyst folds a filtered LocalRelation into
      // its result rows, erasing the selective Filter node the
      // PartitionPruning rule requires — a dim SCAN keeps it (and matches
      // reality: warehouse dims are tables, not literals).
      Seq(("de", 0), ("en", 1), ("es", 0), ("fr", 1), ("zh", 1))
        .toDF("d_lang", "keep")
        .write.mode("overwrite").parquet(s"$out/lang_dim")
    }
    // the keep filter lives on the DIM, never on the fact — only runtime
    // DPP can prune the fact scan's partitions
    spark.read.parquet(s"$base/documents")
      .join(broadcast(spark.read.parquet(s"$base/lang_dim")
        .filter(col("keep") === 1)),
        col("lang") === col("d_lang"))
  }

  /** PIVOT (beyond-parity): per-source document counts spread across an
    * EXPLICIT language column list. The explicit values list matters at
    * scale: `pivot(col)` without values runs an extra distinct-collect
    * job over the full input to discover columns; with values it is one
    * pass, a plain partial/final aggregate with one output column per
    * listed value.
    */
  val PivotLangs: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  def aggPivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(col("source"))
      .pivot("lang", PivotLangs)
      .agg(count(lit(1)))
      .na.fill(0L, PivotLangs)

  /** Collections function library (beyond-parity: SURVEY §2.7 notes the
    * reference has "no string/math/array/map/JSON function library"):
    * array indexing/size/membership, sort+distinct+slice, a higher-order
    * transform+aggregate fold, and map construction+lookup — all emitted
    * as scalars (never array columns) so the cross-engine compare is on
    * values, not on engine-specific array stringification.
    */
  def scalarCollections(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), graft.functions.TextOps.tokens.as("w"))
      .select(
        col("doc_id"),
        element_at(col("w"), 1).as("first_token"),
        size(col("w")).cast("long").as("n_tokens"),
        array_contains(col("w"), "the").cast("int").as("has_the"),
        array_join(slice(sort_array(array_distinct(col("w"))), 1, 3), ",")
          .as("first3_distinct"),
        aggregate(transform(col("w"), x => length(x)), lit(0),
          (acc, x) => acc + x).cast("long").as("chars_in_tokens"),
        element_at(
          map_from_arrays(array(lit("n")), array(size(col("w")))), lit("n"))
          .cast("long").as("map_lookup"))

  /** NTILE decile bucketing over a TOTAL order ((o_totalprice,
    * o_orderkey) — price alone has ties, and ntile over a tied order is
    * partition-layout-dependent): per-decile count and exact money
    * bounds, the spend-distribution summary an analyst reads.
    *
    * NTILE semantically needs a total order, but `ntile().over(Window
    * .orderBy(...))` plans as a single-partition sort of the whole table —
    * the 100×-unsafe shape. This is the two-pass realization with the
    * identical answer: a distributed global rank ([[Ranked.globalRank]] —
    * range-partitioned local sorts + per-partition offsets), then SQL
    * NTILE's bucket rule applied in closed form (first n%k buckets hold
    * ⌈n/k⌉ rows, the rest ⌊n/k⌋ — what the window's incremental bucketing
    * computes row-at-a-time).
    */
  def windowNtile(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val n = orders.count()
    val q = n / 10; val r = n % 10
    val decile = (
      if (q == 0) col("idx") // n < 10: one row per bucket, decile = rank
      else when(col("idx") <= lit(r * (q + 1)),
        expr(s"(idx - 1) DIV ${q + 1}") + 1)
        .otherwise(expr(s"(idx - 1 - ${r * (q + 1)}) DIV $q") + lit(r) + 1)
    ).cast("int")
    Ranked.globalRank(orders, Seq(col("o_totalprice"), col("o_orderkey")))
      .withColumn("decile", decile)
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
  }

  /** Explicit GROUPING SETS (beyond rollup/cube: an arbitrary set list —
    * here per-priority and per-status marginals WITHOUT the cross
    * product). SQL-only surface in Spark, so this query exercises the
    * parser path; one Expand feeds both groupings in a single scan.
    */
  def aggGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))""".stripMargin)
  }

  /** Several DISTINCT aggregates over different columns in one query —
    * planner-wise a different animal from single-distinct: Catalyst
    * expands the input N ways and aggregates each stream, visible as one
    * Expand + double aggregation in the plan.
    */
  def aggDistinctMulti(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        count(lit(1)).as("n"))

  /** JSON function library: build a JSON document per row (`to_json` over
    * a struct — integers/strings/pre-stringified dates only, so the text
    * is engine-portable; float formatting is not) and extract fields back
    * out (`get_json_object` path queries). Round-tripping through the
    * TEXT proves both directions.
    */
  def scalarJson(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderkey") < 100)
      .select(col("o_orderkey"),
        to_json(struct(
          col("o_orderkey").as("k"),
          col("o_orderstatus").as("s"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))).as("js"))
      .select(col("o_orderkey"), col("js"),
        get_json_object(col("js"), "$.s").as("status_extracted"),
        get_json_object(col("js"), "$.k").cast("long").as("key_extracted"),
        get_json_object(col("js"), "$.d").as("date_extracted"))

  /** UNPIVOT/melt (the pivot inverse): wide per-document metrics into
    * (doc_id, metric, value) long form — the shape feature stores and
    * plotting/aggregation layers want. `Dataset.unpivot` is a zero-shuffle
    * Expand: each input row fans out to one row per metric in place.
    */
  def aggUnpivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
        size(graft.functions.TextOps.tokens).cast("long").as("n_tokens"))
      .unpivot(Array(col("doc_id")), Array(col("n_chars"), col("n_tokens")),
        "metric", "value")

  // ---------------------------------------------------------------------
  // §2.3 projections / filters
  // ---------------------------------------------------------------------

  /** `c_mktsegment = 'BUILDING'` (no_websocket.java:329–337). */
  def filterCustomerSegment(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_name", "c_mktsegment")

  /** `o_orderdate < DATE '1995-03-15'` (no_websocket.java:340–354). */
  def filterOrdersDate(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(to_date(col("o_orderdate")) < to_date(lit(Q3Date)))
      .select("o_orderkey", "o_custkey", "o_orderdate")

  /** `l_shipdate > DATE '1995-03-15'` + parse-time projection 16→5 cols
    * (no_websocket.java:292–315, 357–371). Catalyst pushes both the filter
    * and the column pruning into the parquet scan.
    */
  def filterLineitemDate(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) > to_date(lit(Q3Date)))
      .select("l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice", "l_discount")

  // ---------------------------------------------------------------------
  // §2.4 joins
  // ---------------------------------------------------------------------

  /** customer ⋈ orders on custkey — the reference's first CoProcessFunction
    * join (BatchProcessor.java:172–217), as a plain equi-join. Aggregated to
    * one row per customer so the output is small and deterministic.
    */
  def joinCustomerOrders(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(lit(1)).as("n_orders"),
           moneySum(col("o_totalprice")).as("total_spend"))

  /** orders ⋈ lineitem on orderkey with per-line revenue — the reference's
    * second join incl. its revenue computation (BatchProcessor.java:219–276,
    * no_websocket.java:447–512), without the lost-lineitem defect.
    */
  def joinOrdersLineitem(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(t(spark, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(count(lit(1)).as("n_lines"), sum(revenueExpr).cast("double").as("revenue"))

  /** Star-schema dimension join: customer ⋈ nation ⋈ region with both dims
    * explicitly broadcast — the 100 TB-scale plan (tiny dims never shuffle
    * the fact table).
    */
  def joinBroadcastDims(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), moneySum(col("c_acctbal")).as("acctbal_sum"))

  /** Left-semi join (EXISTS): customers that have at least one order. */
  def joinSemi(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")

  /** Left-anti join (NOT EXISTS): customers with no orders. */
  def joinAnti(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** Left-outer join with null handling: every order with its (possibly
    * missing) customer name.
    */
  def joinOuter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"), "left_outer")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"))

  /** Skew-resilient join via key salting: the `events`→user profile join
    * concentrates on 150 hot users, so the dimension side is replicated
    * across `nSalts` sub-keys and the fact side scatters uniformly —
    * every straggler partition becomes `nSalts` even ones. (AQE's runtime
    * skew-join split handles this adaptively too; explicit salting is the
    * deterministic 100 TB-safe form.) Result equals the unsalted join.
    */
  def joinSkewSalted(spark: SparkSession, dir: String): DataFrame = {
    val nSalts = 8
    val events = t(spark, dir, "events")
      .withColumn("salt", pmod(hash(col("event_id")), lit(nSalts)))
    val users = t(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("user_events"))
      .crossJoin(spark.range(nSalts).select(col("id").cast("int").as("salt")))
    events.join(users, Seq("user_id", "salt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        moneySum(col("value")).as("value_sum"),
        max(col("user_events")).as("max_user_events"))
  }

  /** Semi-join reduction via a Bloom filter ([[graft.functions.BloomFilter]]):
    * the selective side (pre-1996 orders, ~15% of the table) is summarized
    * into a 128 KiB bitset in ONE distributed aggregate (merge = bitwise
    * OR, map-side combined), and the big probe side is filtered with a
    * codegen'd `might_contain` BEFORE its shuffle — at 100 TB the probe
    * exchange, not the join, is the bill, and this drops ~85% of it for
    * the cost of broadcasting 128 KiB. False positives pass the filter
    * but not the exact join that follows, so the result is bit-exact
    * (oracle: the plain join).
    */
  def joinBloomPruned(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.BloomFilter.register(spark)
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1996-01-01"))
    // one row, 8 + numBits/8 bytes — the bounded summary a cluster would
    // broadcast (Spark's InSubqueryExec runtime filter makes this same
    // collect-then-reship motion for its semi-join reduction)
    val filter = o.agg(graft.functions.BloomFilter.bloomAgg(col("o_orderkey")))
      .head().getAs[Array[Byte]](0)
    val li = t(spark, dir, "lineitem")
      .filter(graft.functions.BloomFilter.mightContain(lit(filter), col("l_orderkey")))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(revenueExpr).cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** The orders⋈lineitem join over BUCKETED tables — the co-located-join
    * strategy the brief's 100 TB story names: both sides are written
    * `bucketBy(8, key).sortBy(key)`, so the sort-merge join reads
    * bucket-aligned files and plans ZERO Exchange below the join. The
    * shuffle happened once, at write time; every subsequent join on that
    * key is shuffle-free (RelationalSpec asserts the no-Exchange
    * property on this frame's physical plan).
    */
  private[operators] def bucketedJoinFrame(spark: SparkSession, dir: String): DataFrame = {
    val tok = Integer.toHexString(dir.hashCode)
    val (ot, lt) = (s"orders_bkt_$tok", s"lineitem_bkt_$tok")
    val base = System.getProperty("java.io.tmpdir") +
      s"/graft_bkt_${spark.sparkContext.applicationId}"
    def stage(name: String, df: DataFrame, key: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      df.write.mode("overwrite").option("path", s"$base/$name")
        .bucketBy(8, key).sortBy(key).saveAsTable(name)
    }
    stage(ot, t(spark, dir, "orders")
      .select("o_orderkey", "o_orderpriority"), "o_orderkey")
    stage(lt, t(spark, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount"), "l_orderkey")
    spark.table(ot).hint("merge")
      .join(spark.table(lt), col("o_orderkey") === col("l_orderkey"))
  }

  /** Driver query over [[bucketedJoinFrame]]: per-priority lineitem count
    * and revenue. The aggregation's partial/final exchange is the ONLY
    * shuffle in the whole plan.
    */
  def joinBucketed(spark: SparkSession, dir: String): DataFrame =
    bucketedJoinFrame(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(revenueExpr).cast("double").as("revenue"))
      .orderBy("o_orderpriority")

  /** Exact percentiles (linear interpolation) of event values per type —
    * the distribution profiling every data-quality pass needs. Spark
    * `percentile` and DuckDB `quantile_cont` share the interpolation rule.
    */
  def aggPercentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))

  // ---------------------------------------------------------------------
  // §2.5 aggregations
  // ---------------------------------------------------------------------

  /** Group-sum matching the reference's SQL aggregate shape
    * (TPCHQuery3SQL_Batch.java:112–115) over the whole lineitem table
    * (TPC-H Q1-flavored so the output is small + deterministic).
    */
  def aggGroupSum(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum(revenueExpr).cast("double").as("sum_revenue"),
        count(lit(1)).as("count_order"))

  /** Per-group MODE with a deterministic tie rule (max count, ties to the
    * smallest value). Spark's builtin `mode()` is tie-nondeterministic —
    * oracle-hostile and replay-hostile — so the engine form is two hash
    * aggregates plus an equi-join on (group, max count): the counts frame
    * is group × distinct-value sized (never row-sized past the first
    * map-side-combined aggregate), no sort, no window.
    */
  def aggMode(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
    val m = c.groupBy(col("l_returnflag")).agg(max(col("cnt")).as("cnt"))
    c.join(m, Seq("l_returnflag", "cnt"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("l_quantity")).as("mode_quantity"),
        max(col("cnt")).as("n_occurrences"))
      .orderBy(col("l_returnflag"))
  }

  /** Full scalar-aggregate battery: count / min / max (+ exactly-rounded
    * avg) — beyond the reference (it only has SUM) but table stakes for an
    * engine; SURVEY.md §2.10.
    */
  def aggStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("o_custkey")).as("n_customers"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        (moneySum(col("o_totalprice")) / count(lit(1))).as("avg_price"))

  /** ROLLUP grouping sets (absent from the reference; SURVEY.md §2.10). */
  def aggRollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))

  /** CUBE grouping sets — all 4 grouping combinations in one pass. */
  def aggCube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))

  /** Scalar-function library breadth (the reference has no scalar library
    * at all, SURVEY §2.7 — Spark's comes with the engine): string, math,
    * date, and conditional functions in one deterministic projection.
    */
  def scalarFunctions(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderkey") < 100)
      .select(
        col("o_orderkey"),
        upper(substring(col("o_orderpriority"), 1, 8)).as("prio_upper"),
        length(col("o_orderstatus")).cast("long").as("status_len"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("tagged"),
        round(abs(col("o_totalprice") - 1000.0), 2).as("dist_1k"),
        floor(col("o_totalprice") / 100).cast("long").as("price_bucket"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        datediff(to_date(lit(Q3Date)), to_date(col("o_orderdate")))
          .cast("long").as("days_to_cutoff"),
        when(col("o_totalprice") > 100000, "big").otherwise("small").as("size_class"))
      .orderBy("o_orderkey")

  // ---------------------------------------------------------------------
  // §2.6 sort / limit / top-k
  // ---------------------------------------------------------------------

  /** ORDER BY … LIMIT — Catalyst plans `TakeOrderedAndProject`, which
    * keeps a bounded per-partition heap instead of a global sort: exactly
    * the scale-out fix for the reference's single-task `TopNFunction`
    * (no_websocket.java:590–650).
    */
  def topNOrders(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice", "o_orderdate")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)

  /** Distribution window functions (absent from the reference; SURVEY.md
    * §2.10): percent_rank + cume_dist of each customer's balance within
    * its market segment. Tie-stable by definition (equal balances share
    * the value), so deterministic without a row-order tiebreak.
    */
  def windowDistribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"))
    t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy("c_custkey")
  }

  /** Date/time scalar library (the reference's only date ops are parse +
    * compare, SURVEY.md §2.7): extract fields, truncate, offset, diff —
    * all constant-folded Catalyst date arithmetic on the scan output.
    */
  def scalarDatetime(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("d"))
      .select(
        col("o_orderkey"),
        year(col("d")).as("y"),
        month(col("d")).as("m"),
        quarter(col("d")).as("q"),
        dayofmonth(col("d")).as("dom"),
        trunc(col("d"), "month").cast("string").as("month_start"),
        last_day(col("d")).cast("string").as("month_end"),
        datediff(col("d"), to_date(lit("1995-01-01"))).as("days_since_95"),
        date_add(col("d"), 30).cast("string").as("plus30"))
      .orderBy("o_orderkey")

  /** Per-group top-k via window rank (absent from the reference;
    * SURVEY.md §2.10): top-3 orders per priority class.
    */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("o_orderpriority", "rnk", "o_orderkey", "o_totalprice")
  }

  // ---------------------------------------------------------------------
  // set operations (absent from the reference; SURVEY.md §2.10)
  // ---------------------------------------------------------------------

  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    def users(kind: String) = ev.filter(col("event_type") === kind).select("user_id")
    val purchasedAndErrored = users("purchase").intersect(users("error"))
      .withColumn("cohort", lit("purchase_and_error"))
    val viewedNeverClicked = users("view").except(users("click"))
      .withColumn("cohort", lit("view_never_click"))
    purchasedAndErrored.unionByName(viewedNeverClicked)
      .groupBy(col("cohort")).agg(count(lit(1)).as("n_users"))
  }

  /** JSON sink contract of the reference's WebSocket push
    * (TPCHQuery3_StreamProcessor.java:1037–1052): rank + orderkey + revenue
    * + orderdate as a JSON string per row, built with deterministic casts so
    * Spark and the oracle agree byte-for-byte.
    */
  def sinkJsonContract(spark: SparkSession, dir: String): DataFrame = {
    // rank via the distributed total-order rank, not an empty-frame window
    // (bounded to the top-N today, but the engine rule is: never plan a
    // single-partition WindowExec); cast to int = row_number's type
    val top = graft.operators.Ranked.globalRank(q3Batch(spark, dir),
        Seq(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc),
        "__rank")
      .withColumn("rank", col("__rank").cast("int")).drop("__rank")
    top.select(
      col("rank"),
      concat(
        lit("{\"rank\":"), col("rank").cast("string"),
        lit(",\"orderkey\":"), col("l_orderkey").cast("string"),
        lit(",\"revenue\":"), col("revenue").cast("decimal(18,2)").cast("string"),
        lit(",\"orderdate\":\""), to_date(col("o_orderdate")).cast("string"),
        lit("\"}")).as("json"))
  }
}
