package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Iterative graph analytics over relational edges — PageRank on the
  * part↔supplier co-purchase graph ([[Dedup.dedupClusters]] already covers
  * connected components via pointer-jumping; PageRank adds the
  * fixed-point-iteration family: influence/centrality scoring, the shape
  * of label propagation, embedding propagation, and every "repeat a join +
  * aggregate until done" workload).
  *
  * Determinism design: ranks are FIXED-POINT integers (scaled by 10^12),
  * not doubles. Every step is integer multiply / integer DIV / integer
  * sum, all associative and engine-exact, so the result is bit-identical
  * regardless of aggregation order, partitioning, or engine — a double
  * PageRank cannot promise that (float sums reorder across runs), and the
  * round-4 lesson (bm25/quality midpoint flips) is that cross-engine
  * doubles are a correctness tax. Truncation toward zero loses ≤1 unit in
  * 10^12 per term — far below any ranking-relevant difference.
  *
  * Scale shape: the symmetric edge list with per-source out-degree is
  * computed ONCE and pinned (at cluster scale: a bucketed table on `src`,
  * making every iteration's join shuffle-free on the edge side). Each of
  * the 5 iterations is one hash join (edges ⋈ ranks on src — ranks is
  * nodes-sized, ids + one long) and one hash aggregate by dst with
  * map-side partial sums; rank state is pinned per iteration
  * (`localCheckpoint`) to truncate the growing lineage — the standard
  * iterative-DataFrame discipline. Nothing driver-side except the loop
  * counter; the final top-20 is TakeOrderedAndProject.
  */
object Graph {

  private val One = 1000000000000L // fixed-point 1.0

  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    val e0 = Tables.table(spark, dir, "lineitem")
      .select(concat(lit("p:"), col("l_partkey")).as("src"),
        concat(lit("s:"), col("l_suppkey")).as("dst"))
      .distinct()
    // undirected: every edge contributes in both directions, so the graph
    // has no dangling nodes (every node has outdeg ≥ 1 by construction)
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val adj = sym
      .join(sym.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint()

    var ranks = adj.select(col("src").as("id")).distinct()
      .select(col("id"), lit(One).as("r"))
      .localCheckpoint()
    for (_ <- 1 to 5) {
      ranks = adj.join(ranks, adj("src") === ranks("id"))
        .select(col("dst"), expr("r DIV outdeg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("sc"))
        // r' = 0.15 + 0.85·Σ contrib, as 17/20 in exact integer arithmetic
        .select(col("dst").as("id"),
          (lit(One * 3 / 20) + expr("17 * sc DIV 20")).as("r"))
        .localCheckpoint()
    }
    ranks.orderBy(col("r").desc, col("id")).limit(20)
      .select(col("id"), col("r").as("rank"))
  }

  /** DuckDB oracle: the same 5 iterations unrolled as chained CTEs,
    * generated from the same constants. `//` is DuckDB's integer floor
    * division — identical to Spark's DIV on the all-positive ranks.
    * Sums are cast back to BIGINT (DuckDB sums BIGINT into HUGEINT).
    */
  def pageRankOracleSql: String = {
    val base =
      s"""WITH e0 AS (SELECT DISTINCT 'p:' || CAST(l_partkey AS VARCHAR) AS src,
         |                            's:' || CAST(l_suppkey AS VARCHAR) AS dst
         |            FROM lineitem),
         |sym AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |deg AS (SELECT src, count(*) AS outdeg FROM sym GROUP BY src),
         |r0 AS (SELECT src AS id, CAST($One AS BIGINT) AS r FROM deg)""".stripMargin
    val iters = (1 to 5).map { i =>
      s"""r$i AS (SELECT s.dst AS id,
         |            CAST(${One * 3 / 20} + (17 * CAST(sum(r.r // d.outdeg) AS BIGINT)) // 20 AS BIGINT) AS r
         |        FROM sym s JOIN r${i - 1} r ON s.src = r.id
         |                   JOIN deg d ON s.src = d.src
         |        GROUP BY s.dst)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$iters\nSELECT id, r AS rank FROM r5 ORDER BY rank DESC, id LIMIT 20"
  }
}
