package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.KmvSketch
import graft.sources.Tables

/** Sketch-based approximate aggregates.
  *
  * The reference has no sketches (SURVEY §2.5: "no HLL/approx anywhere");
  * at 100 TB a distinct-count over a key column is exactly the query one
  * cannot afford to run exactly, so the engine ships a K-minimum-values
  * sketch ([[graft.functions.KmvSketch]]) — deterministic given the hash
  * column, hence still oracle-checkable bit-for-bit, unlike
  * `approx_count_distinct`'s engine-specific HLL.
  */
object Sketches {

  private val TwoPow60 = 1152921504606846976.0 // 16^15, exact in double

  /** `D̂ = (K−1)/h₍K₎` from the sketch array `s` (lexicographic order on
    * fixed-width lowercase hex IS numeric order, so `s[K]` is the K-th
    * smallest hash). Under-full sketch ⇒ it holds every distinct value ⇒
    * its size is the exact count. The hex→long→double chain mirrors the
    * oracle's CAST path so both engines produce the identical IEEE double.
    */
  def kmvEstimate(s: Column, k: Int): Column =
    when(size(s) < k, size(s).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        (conv(substring(element_at(s, k), 1, 15), 16, 10)
          .cast("long").cast("double") / lit(TwoPow60)))

  /** Approximate distinct `l_partkey` over lineitem next to the exact
    * count. One aggregation: the sketch's partial/merge path does map-side
    * combine, so the shuffle carries ≤ K hashes per partition — the whole
    * point at scale, where `COUNT(DISTINCT)` shuffles every distinct value.
    */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    KmvSketch.register(spark)
    val k = KmvSketch.DefaultK
    Tables.table(spark, dir, "lineitem")
      .select(md5(col("l_partkey").cast("string")).as("h"))
      .agg(countDistinct(col("h")).as("n_exact"), KmvSketch(col("h")).as("s"))
      .select(lit(k).as("kmv_k"), col("n_exact"),
        kmvEstimate(col("s"), k).as("kmv_estimate"))
  }

  // ---- HyperLogLog, the engine-portable way -------------------------------

  /** m = 64 registers (b = 6 bucket bits out of the 60-bit md5 prefix). */
  private val HllM = 64
  /** Remaining hash width after the bucket bits: 60 − 6 = 54 bits, so the
    * leading-zero rank ranges over [1, 55].
    */
  private val HllRankCap = 55
  /** α₆₄·m²·2⁵⁵ precomputed ONCE in Scala; both the engine and the
    * generated oracle SQL embed this exact double literal, so the final
    * estimate is one identical IEEE division on both sides.
    */
  private val HllAlphaNum = 0.709 * (HllM.toDouble * HllM) * math.pow(2, HllRankCap)

  /** HyperLogLog distinct count as ONE declarative aggregation — no custom
    * state, no engine-specific sketch. Everything up to the final division
    * is integer arithmetic: register `M_j` is an integer max, and the
    * harmonic sum `Σ 2^(−M_j)` is kept scaled by 2⁵⁵ so it is an EXACT
    * BIGINT sum (each term a power of two ≤ 2⁵⁴, 64 terms < 2⁶¹) —
    * order-independent and bit-identical across engines, where the
    * textbook double harmonic sum is neither. That is what makes this HLL
    * oracle-checkable against DuckDB while `approx_count_distinct`'s
    * binary HLL++ state is not.
    *
    * Scale shape: one scan, one shuffle keyed by the 64 buckets with
    * map-side combine — register max AND the per-bucket exact distinct
    * (buckets partition hash space, so Σ per-bucket distinct = global
    * distinct; `n_exact` rides the same shuffle instead of a second
    * Expand pass, and exists only to demo sketch accuracy — production
    * drops it). Register state is mergeable by construction (max), the
    * same property HLL union needs.
    *
    * The small-range linear-counting correction is deliberately NOT
    * folded in: it needs `ln`, whose last-ulp behavior is libm-specific.
    * `v_zero` (empty-register count) is emitted so a consumer can apply
    * any correction; the raw estimate itself is engine-exact.
    */
  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val cap = HllRankCap
    val regs = Tables.table(spark, dir, "lineitem")
      .select(conv(substring(md5(col("l_partkey").cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .groupBy((col("h") % HllM).as("bucket"))
      .agg(max(when(expr(s"h DIV $HllM") === 0L, lit(cap))
          .otherwise(lit(cap) - length(bin(expr(s"h DIV $HllM"))))).as("m"),
        countDistinct(col("h")).as("nd"))
    regs
      .agg(sum(col("nd")).as("n_exact"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $cap - m)")).as("s_present"),
        count(lit(1)).as("nb"))
      .select(lit(HllM).as("hll_m"), col("n_exact"),
        (lit(HllM.toLong) - col("nb")).as("v_zero"),
        (col("s_present") + (lit(HllM.toLong) - col("nb")) * lit(1L << cap)).as("s_int"))
      .withColumn("hll_estimate", lit(HllAlphaNum) / col("s_int").cast("double"))
  }

  /** DuckDB oracle for [[hllDistinct]], generated from the same constants.
    * `printf('%b', w)` is DuckDB's no-leading-zeros binary — same length
    * semantics as Spark's `bin(w)`; `//` mirrors `DIV` on the
    * all-positive hashes.
    */
  def hllOracleSql: String = {
    val (m, cap) = (HllM, HllRankCap)
    s"""WITH hh AS (SELECT CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
       |            FROM lineitem),
       |r AS (SELECT h % $m AS bucket,
       |             max(CASE WHEN h // $m = 0 THEN $cap
       |                      ELSE $cap - length(printf('%b', h // $m)) END) AS m,
       |             count(DISTINCT h) AS nd
       |      FROM hh GROUP BY 1),
       |s AS (SELECT CAST(sum(nd) AS BIGINT) AS n_exact,
       |             CAST(sum((CAST(1 AS BIGINT) << ($cap - m))) AS BIGINT) AS s_present,
       |             count(*) AS nb FROM r)
       |SELECT $m AS hll_m, n_exact,
       |       CAST($m - nb AS BIGINT) AS v_zero,
       |       s_present + ($m - nb) * (CAST(1 AS BIGINT) << $cap) AS s_int,
       |       $HllAlphaNum / CAST(s_present + ($m - nb) * (CAST(1 AS BIGINT) << $cap) AS DOUBLE) AS hll_estimate
       |FROM s""".stripMargin
  }
}
