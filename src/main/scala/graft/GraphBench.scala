package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Graph-kernel throughput at a scaled graph — the graph-family
  * counterpart of [[DedupBench]]/[[AnnBench]]: key-shift `scale` disjoint
  * copies of the sf co-purchase baskets (both order and part ids offset
  * by `i·10⁹`) and run the IDENTICAL frame-parametric kernels —
  * triangle count, k-core peeling, weighted SSSP — on the union.
  *
  * Each copy is graph-isomorphic to the base, so the ground truth is
  * CLOSED-FORM, not statistical:
  *  - triangle stats scale exactly `scale ×` (nodes, edges, wedges,
  *    triangles) while the clustering coefficient is INVARIANT;
  *  - every k-core trajectory row scales exactly `scale ×`;
  *  - SSSP output is EXACTLY the base output: the max-degree seed ties
  *    break to the smallest id, which lands in copy 0, whose component
  *    (ids < 10⁹) is untouched by the shift.
  * Each `require` below enforces those identities — a broken shuffle,
  * join, or orientation at scale fails loudly rather than drifting.
  *
  * {{{ SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.GraphBench 10" }}}
  */
object GraphBench {

  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val off = 1000000000L
    val base = Graph.basketFrame(spark, sfDir).localCheckpoint()
    val nBase = base.count()

    def scaled(k: Int): DataFrame =
      (0 until k).map { i =>
        base.select((col("ok") + lit(i * off)).as("ok"),
          (col("p") + lit(i * off)).as("p"))
      }.reduce(_ unionByName _).localCheckpoint()

    def timed[A](what: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = what
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // base truths (also timed — the 1× row of the table)
    val (triBase, triBaseSec) = timed(Graph.triangleCore(base).collect().head)
    val (kcBase, kcBaseSec) = timed(Graph.kCorePeel(base).collect().toSeq)
    val (ssspBase, ssspBaseSec) = timed(Graph.ssspCore(base).collect().toSeq)
    println(f"""{"scale":1,"baskets":$nBase,"triangle_s":$triBaseSec%.1f,"kcore_s":$kcBaseSec%.1f,"sssp_s":$ssspBaseSec%.1f}""")

    Seq(scale).foreach { k =>
      val big = scaled(k)
      val nBig = big.count()
      require(nBig == k * nBase, s"scaled basket count $nBig != $k x $nBase")

      val (tri, triSec) = timed(Graph.triangleCore(big).collect().head)
      Seq(0, 1, 2, 3).foreach { c => // nodes, edges, wedges, triangles
        require(tri.getLong(c) == k * triBase.getLong(c),
          s"triangle col $c: ${tri.getLong(c)} != $k x ${triBase.getLong(c)}")
      }
      require(tri.getLong(4) == triBase.getLong(4),
        s"clustering coefficient drifted: ${tri.getLong(4)} vs ${triBase.getLong(4)}")

      val (kc, kcSec) = timed(Graph.kCorePeel(big).collect().toSeq)
      kc.zip(kcBase).foreach { case (a, b) =>
        require(a.getInt(0) == b.getInt(0) &&
          a.getLong(1) == k * b.getLong(1) && a.getLong(2) == k * b.getLong(2),
          s"kcore round ${b.getInt(0)}: $a != $k x $b")
      }

      val (sssp, ssspSec) = timed(Graph.ssspCore(big).collect().toSeq)
      require(sssp.map(_.toSeq) == ssspBase.map(_.toSeq),
        "scaled SSSP must equal the base output exactly (copy-0 seed)")

      val perEdge1 = triBaseSec / triBase.getLong(1)
      val perEdgeK = triSec / tri.getLong(1)
      println(f"""{"scale":$k,"baskets":$nBig,"triangle_s":$triSec%.1f,"kcore_s":$kcSec%.1f,"sssp_s":$ssspSec%.1f,"tri_us_per_edge_1x":${perEdge1 * 1e6}%.2f,"tri_us_per_edge_${k}x":${perEdgeK * 1e6}%.2f}""")
    }
    spark.stop()
  }
}
