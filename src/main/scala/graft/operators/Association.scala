package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Market-basket association-rule mining over the order/part fact — the
  * classic frequent-itemset workload (Agrawal & Srikant, VLDB'94 family)
  * re-expressed as three hash aggregates and one broadcast-shaped join:
  * for every directed part pair a→b co-ordered at least twice, emit
  * support, confidence P(b|a), and lift P(a,b)/(P(a)P(b)).
  *
  * Determinism design: confidence and lift are exact integer
  * PARTS-PER-MILLION (`x·10⁶ DIV y` on counts), never doubles — lift's
  * cross-multiplied numerator `n_ab·N·10⁶` is width-GUARDED in the plan
  * (raise_error when n_ab·N would push it past 2⁶³−1), not assumed: past
  * ~3·10⁹ baskets the product wraps silently under non-ANSI eval, and a
  * wrong-sign lift is worse than a loud stop.
  *
  * Scale shape: the per-basket pair expansion is bounded (TPC-H orders
  * hold ≤ 7 distinct parts, production baskets are capped the same way
  * before pairing); pair counts and item counts are map-side-combined
  * hash aggregates; the item-count side is items-sized (ids + one long)
  * and joins the pair table twice by id — both broadcastable at any
  * realistic dictionary size. The basket total N rides in as a 1-row
  * cross join, never a driver collect. Top-20 by (lift, confidence, pair)
  * is TakeOrderedAndProject.
  */
object Association {

  def basketRules(spark: SparkSession, dir: String): DataFrame = {
    // li feeds FOUR consumers (both self-join sides, items, total) and
    // pairs/items feed two each — without pins Catalyst inlines every
    // use (measured: 7 lineitem scans, no ReusedExchange). Each pin is
    // ids-only: li is (ok, p), pairs/items are ids + one count.
    val li = Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
      .localCheckpoint()
    // n_baskets as a 1-row frame (broadcast into the final projection)
    val total = li.select(col("ok")).distinct().agg(count(lit(1)).as("n"))
    // undirected pair support (a < b), minimum support 2
    val pairs = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
      .groupBy(col("x.p").as("a"), col("y.p").as("b"))
      .agg(count(lit(1)).as("n_ab")).filter(col("n_ab") >= 2)
      .localCheckpoint()
    val items = li.groupBy(col("p")).agg(count(lit(1)).as("n_i"))
      .localCheckpoint()
    rulesFrom(pairs, items, total)
  }

  /** The rule finisher over count frames — `pairs(a, b, n_ab)` (already
    * support-filtered), `items(p, n_i)`, `total(n)` (1 row). Shared by
    * the batch operator and [[graft.streaming.StreamingBaskets]], whose
    * accumulated per-batch deltas sum to the identical counts.
    */
  private[graft] def rulesFrom(pairs: DataFrame, items: DataFrame,
                               total: DataFrame): DataFrame = {
    // both directions of every surviving pair become candidate rules
    val directed = pairs.select(col("a").as("ante"), col("b").as("cons"), col("n_ab"))
      .union(pairs.select(col("b").as("ante"), col("a").as("cons"), col("n_ab")))
    directed
      .join(items.select(col("p").as("ante"), col("n_i").as("n_a")), "ante")
      .join(items.select(col("p").as("cons"), col("n_i").as("n_c")), "cons")
      .crossJoin(total)
      .select(col("ante"), col("cons"), col("n_ab").as("support_ct"),
        expr("n_ab * 1000000 DIV n_a").as("confidence_ppm"),
        // Lift width guards (the dpoPairs raise_error discipline): BOTH
        // sides of the division must fit int64 — numerator n_ab·n·10⁶
        // (require n_ab ≤ ⌊(2⁶³−1)/10⁶⌋ DIV n) and denominator n_a·n_c
        // (require n_a ≤ (2⁶³−1) DIV n_c). Each guard divides first and
        // so never overflows itself, and x ≤ floor(L/y) ⟹ x·y ≤ L
        // exactly. Trips loudly at ~3·10⁹ baskets instead of silently
        // wrapping to a wrong-sign lift under non-ANSI eval.
        expr("""CASE
                WHEN n_ab > 9223372036854 DIV n THEN raise_error(CONCAT(
                  'basketRules: lift numerator n_ab*n*1e6 exceeds int64 (n_ab=',
                  n_ab, ', n=', n, ')'))
                WHEN n_a > 9223372036854775807 DIV n_c THEN raise_error(CONCAT(
                  'basketRules: lift denominator n_a*n_c exceeds int64 (n_a=',
                  n_a, ', n_c=', n_c, ')'))
                ELSE n_ab * n * 1000000 DIV (n_a * n_c) END""").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("confidence_ppm").desc,
        col("ante"), col("cons"))
      .limit(20)
  }

  /** DuckDB oracle: identical counts and integer-ppm scores. */
  val basketRulesOracleSql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      |total AS (SELECT count(DISTINCT ok) AS n FROM li),
      |pairs AS (SELECT x.p AS a, y.p AS b, count(*) AS n_ab
      |          FROM li x JOIN li y ON x.ok = y.ok AND x.p < y.p
      |          GROUP BY 1, 2 HAVING count(*) >= 2),
      |items AS (SELECT p, count(*) AS n_i FROM li GROUP BY p),
      |directed AS (SELECT a AS ante, b AS cons, n_ab FROM pairs
      |             UNION ALL SELECT b AS ante, a AS cons, n_ab FROM pairs)
      |SELECT d.ante, d.cons, d.n_ab AS support_ct,
      |       CAST(d.n_ab * 1000000 // ia.n_i AS BIGINT) AS confidence_ppm,
      |       CAST(d.n_ab * t.n * 1000000 // (ia.n_i * ic.n_i) AS BIGINT) AS lift_ppm
      |FROM directed d
      |JOIN items ia ON d.ante = ia.p
      |JOIN items ic ON d.cons = ic.p
      |CROSS JOIN total t
      |ORDER BY lift_ppm DESC, confidence_ppm DESC, ante, cons
      |LIMIT 20""".stripMargin
}
