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
    // node ids stay LONGS through the whole fixed-point loop — part p is
    // node 2p, supplier s is node 2s+1 — and become display strings only
    // on the final 20 rows, so every join/aggregate moves (long, long)
    // pairs instead of strings and the dedup shuffle runs on the two
    // integer keys. At fixture scale this is wall-clock-neutral (~7 s
    // warm either way — the time is ~11 AQE stages' scheduling + codegen,
    // a fixed cost that data volume amortizes); at corpus scale the
    // payload halving is the difference that matters.
    val pairs = Tables.table(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val e0 = pairs.select((col("l_partkey") * 2L).as("src"),
      (col("l_suppkey") * 2L + 1L).as("dst"))
    // undirected: every edge contributes in both directions, so the graph
    // has no dangling nodes (every node has outdeg ≥ 1 by construction)
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val deg = sym.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val adj = sym.join(deg, "src").localCheckpoint()

    // the degree frame IS the node set — no second distinct pass
    var ranks = deg.select(col("src").as("id"), lit(One).as("r"))
    // 5 iterations nest into ONE lazy plan executed in a single job: each
    // intermediate ranks frame feeds exactly one consumer, so nothing is
    // recomputed, and AQE sizes each iteration's join strategy from the
    // previous stage's actual output (the nodes-sized ranks side comes
    // back broadcast-small here; at 100 TB it shuffles against a
    // src-bucketed adj instead). Deep fixed-point runs (50+ rounds) would
    // re-introduce a localCheckpoint every ~10 iterations to bound plan
    // depth — at 5 rounds a per-iteration pin costs more than it saves
    // (measured 8.0 s pinned vs 6.4 s unpinned, warm, sf0.1).
    for (_ <- 1 to 5) {
      ranks = adj.join(ranks, adj("src") === ranks("id"))
        .select(col("dst"), expr("r DIV outdeg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("sc"))
        // r' = 0.15 + 0.85·Σ contrib, as 17/20 in exact integer arithmetic
        .select(col("dst").as("id"),
          (lit(One * 3 / 20) + expr("17 * sc DIV 20")).as("r"))
    }
    ranks
      .select(when(col("id") % 2 === 0, concat(lit("p:"), expr("id DIV 2")))
        .otherwise(concat(lit("s:"), expr("id DIV 2"))).as("id"), col("r"))
      .orderBy(col("r").desc, col("id")).limit(20)
      .select(col("id"), col("r").as("rank"))
  }

  /** DuckDB oracle: the same 5 iterations unrolled as chained CTEs,
    * generated from the same constants. `//` is DuckDB's integer floor
    * division — identical to Spark's DIV on the all-positive ranks.
    * Sums are cast back to BIGINT (DuckDB sums BIGINT into HUGEINT).
    */
  def pageRankOracleSql: String = {
    val base =
      s"""WITH e0 AS (SELECT DISTINCT l_partkey * 2 AS src,
         |                            l_suppkey * 2 + 1 AS dst
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
    s"""$base,
       |$iters,
       |named AS (SELECT CASE WHEN id % 2 = 0 THEN 'p:' || CAST(id // 2 AS VARCHAR)
       |                      ELSE 's:' || CAST(id // 2 AS VARCHAR) END AS id,
       |                 r FROM r5)
       |SELECT id, r AS rank FROM named ORDER BY rank DESC, id LIMIT 20""".stripMargin
  }
}
