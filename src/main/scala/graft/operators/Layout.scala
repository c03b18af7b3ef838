package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Physical data layout for scan pruning — Z-ORDER (Morton) clustering.
  *
  * At 100 TB the dominant cost of a selective multi-dimension query is the
  * files it can NOT skip: parquet min/max footers prune a file only when
  * the filtered column is clustered, and sorting by column A destroys any
  * clustering on column B. The Z-order curve interleaves the bits of both
  * keys so files hold small RECTANGLES of (A, B) space — a box predicate
  * on either (or both) dimensions intersects few files. This is the
  * standard lakehouse `OPTIMIZE ZORDER BY` operation, expressed here as a
  * pure Catalyst column expression plus the ordinary range-partitioned
  * write path — no custom shuffle machinery needed.
  *
  * The interleave itself is 16 shift/mask terms per dimension, folded into
  * one codegen'd integer expression — row-local, zero shuffle; the only
  * wide operation in a Z-order rewrite is the `repartitionByRange` on the
  * resulting key, which is exactly the sort-shaped shuffle any clustered
  * write pays.
  */
object Layout {

  /** Morton-interleave the low 16 bits of two non-negative integral
    * columns: bit i of `a` lands at position 2i+1, bit i of `b` at 2i.
    * Pure integer arithmetic (shift/and/or), so the same value is
    * reproducible in any engine — and codegen keeps all 32 terms in one
    * whole-stage span.
    */
  def morton16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** The driver-checked query: lineitem keyed by the Z-value of
    * (l_partkey, l_suppkey), first 200 cells of the curve. `orderBy +
    * limit` plans as TakeOrderedAndProject — per-partition top-k then a
    * driver-side merge of k-sized heaps, never a global sort, so the
    * "show me the head of the curve" check costs one scan at any scale.
    */
  def zorderKeys(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        morton16(col("l_partkey"), col("l_suppkey")).as("zval"))
      .orderBy(col("zval"), col("l_orderkey"), col("l_linenumber"))
      .limit(200)

  /** Cluster `df` into `n` Z-ordered shards: range-partition on the
    * Z-value (so shard boundaries adapt to the data distribution — the
    * same sampling-based partitioner a sorted write uses) and sort within
    * each shard. Each output shard then covers a compact rectangle of
    * (a, b) space, which is what makes per-file min/max pruning effective
    * on BOTH columns. The LayoutSpec quantifies the effect.
    */
  def zorderShards(df: DataFrame, a: Column, b: Column, n: Int): DataFrame = {
    val keyed = df.withColumn("zval", morton16(a, b))
    keyed.repartitionByRange(n, col("zval")).sortWithinPartitions(col("zval"))
  }

  /** Matching DuckDB oracle for [[zorderKeys]] — the same 32-term
    * interleave spelled in portable SQL bit operators, generated from the
    * same loop so engine and oracle cannot drift.
    */
  def zorderOracleSql: String = {
    val terms = (0 until 16).flatMap(i => Seq(
      s"(((l_partkey >> $i) & 1) << ${2 * i + 1})",
      s"(((l_suppkey >> $i) & 1) << ${2 * i})"))
    s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |       (${terms.mkString(" | ")}) AS zval
       |FROM lineitem
       |ORDER BY zval, l_orderkey, l_linenumber LIMIT 200""".stripMargin
  }

  /** COMPACTION PLANNING — the lakehouse `OPTIMIZE` sibling of
    * [[zorderShards]]: assign the corpus, in (source, doc_id) order, to
    * fixed-size output files of [[CompactionTargetBytes]] target bytes (a
    * document opens a new file when its first byte crosses a boundary).
    * Small-file compaction is the other half of layout hygiene at 100 TB
    * — pruning statistics are useless across a million 100 KB files.
    *
    * The global ordered byte offset is [[Ranked.runningSum]] — the
    * scale-safe two-pass prefix sum (range-partition + per-partition
    * totals to the driver, O(#partitions) longs) — NOT a
    * `sum().over(Window.orderBy)` whose empty frame serializes the corpus
    * through one task. File assignment and the per-file rollup are then
    * row-local arithmetic and one hash aggregate.
    */
  val CompactionTargetBytes = 16384L

  def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(spark, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
    val cum = graft.operators.Ranked.runningSum(
      docs, Seq(col("source"), col("doc_id")), col("n_chars"), "cum")
    cum.select(col("doc_id"), col("n_chars"),
        expr(s"(cum - n_chars) DIV ${CompactionTargetBytes}L").as("file_id"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("bytes"),
        min(col("doc_id")).as("doc_lo"),
        max(col("doc_id")).as("doc_hi"))
      .orderBy(col("file_id"))
  }

  /** DuckDB oracle for [[compactionPlan]] — the same assignment via a
    * window prefix sum (fine at oracle scale; the engine's two-pass form
    * exists precisely because this window does not distribute).
    */
  val compactionOracleSql: String =
    s"""WITH c AS (SELECT doc_id, n_chars,
       |    SUM(n_chars) OVER (ORDER BY source, doc_id
       |                       ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM documents),
       |f AS (SELECT doc_id, n_chars,
       |    CAST((cum - n_chars) // $CompactionTargetBytes AS BIGINT) AS file_id
       |  FROM c)
       |SELECT file_id, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS bytes,
       |       min(doc_id) AS doc_lo, max(doc_id) AS doc_hi
       |FROM f GROUP BY file_id ORDER BY file_id""".stripMargin
}
