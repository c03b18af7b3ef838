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
}
