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

  /** HILBERT index of (x, y) on a 2^bits × 2^bits grid — the
    * strictly-better space-filling curve next to [[morton16]]: Morton has
    * locality "jumps" (cell 0b0111 → 0b1000 teleports across the space),
    * while consecutive Hilbert cells are ALWAYS Manhattan-adjacent, so
    * range-partitioned files cover even tighter rectangles. The cost is
    * that the index is not a flat bit-interleave: the standard iterative
    * rotate-and-reflect recurrence carries (x, y, d) state across the
    * `bits` steps. Here the loop is UNROLLED at plan-build time into pure
    * CASE/arithmetic columns — one whole-stage-codegen span, and the
    * DuckDB oracle unrolls the identical steps from the same generator so
    * the two cannot drift. (LayoutSpec proves curve-ness itself: over the
    * full 8-bit grid, consecutive d values sit in adjacent cells.)
    */
  def withHilbert(df: DataFrame, x: Column, y: Column, bits: Int,
                  out: String): DataFrame = {
    // per-step NAMED columns, never one inlined expression: the recurrence
    // references each intermediate several times, so full inlining grows
    // the tree ~4× per step (4^16 nodes at 16 bits — driver OOM).
    // Multi-use aliases also stop CollapseProject from re-inlining them.
    var cur = df
      .withColumn("__hx", x.cast("long"))
      .withColumn("__hy", y.cast("long"))
      .withColumn("__hd", lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      cur = cur
        .withColumn("__rx", when(col("__hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("__ry", when(col("__hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("__hd", col("__hd") + lit(s * s) *
          (when(col("__rx") === 1 && col("__ry") === 0, 3L)
            .when(col("__rx") === 1 && col("__ry") === 1, 2L)
            .when(col("__rx") === 0 && col("__ry") === 1, 1L).otherwise(0L)))
        // reflect (when ry=0 ∧ rx=1), then swap (when ry=0)
        .withColumn("__x1",
          when(col("__ry") === 0 && col("__rx") === 1, lit(s - 1) - col("__hx"))
            .otherwise(col("__hx")))
        .withColumn("__y1",
          when(col("__ry") === 0 && col("__rx") === 1, lit(s - 1) - col("__hy"))
            .otherwise(col("__hy")))
        .withColumn("__hx", when(col("__ry") === 0, col("__y1")).otherwise(col("__x1")))
        .withColumn("__hy", when(col("__ry") === 0, col("__x1")).otherwise(col("__y1")))
    }
    cur.withColumn(out, col("__hd"))
      .drop("__hx", "__hy", "__hd", "__rx", "__ry", "__x1", "__y1")
  }

  /** Driver query: lineitem keyed by the Hilbert value of
    * (l_partkey, l_suppkey), first 200 cells — [[zorderKeys]]' twin.
    */
  def hilbertKeys(spark: SparkSession, dir: String): DataFrame =
    withHilbert(
      Tables.table(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey")),
      col("l_partkey"), col("l_suppkey"), 16, "hval")
      .orderBy(col("hval"), col("l_orderkey"), col("l_linenumber"))
      .limit(200)

  /** DuckDB oracle for [[hilbertKeys]] — the same 16 rotate-and-reflect
    * steps unrolled as chained CTEs from the same constants.
    */
  def hilbertOracleSql: String = {
    val steps = (15 to 0 by -1).zipWithIndex.map { case (i, n) =>
      val s = 1L << i
      s"""h${n + 1} AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |  CASE WHEN ry = 0 THEN y1 ELSE x1m END AS hx,
         |  CASE WHEN ry = 0 THEN x1m ELSE y1 END AS hy,
         |  hd + $s * $s * (CASE WHEN rx = 1 AND ry = 0 THEN 3
         |                       WHEN rx = 1 AND ry = 1 THEN 2
         |                       WHEN rx = 0 AND ry = 1 THEN 1 ELSE 0 END) AS hd
         |  FROM (SELECT *,
         |    CASE WHEN ry = 0 AND rx = 1 THEN ${s - 1} - hx ELSE hx END AS x1m,
         |    CASE WHEN ry = 0 AND rx = 1 THEN ${s - 1} - hy ELSE hy END AS y1
         |    FROM (SELECT *,
         |      CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |      CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END AS ry
         |      FROM h$n) a) b)""".stripMargin
    }.mkString(",\n")
    s"""WITH h0 AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |  CAST(l_partkey AS BIGINT) AS hx, CAST(l_suppkey AS BIGINT) AS hy,
       |  CAST(0 AS BIGINT) AS hd FROM lineitem),
       |$steps
       |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, hd AS hval
       |FROM h16
       |ORDER BY hval, l_orderkey, l_linenumber LIMIT 200""".stripMargin
  }

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
