package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{ProductQuant, Similarity}
import graft.sources.Tables

/** ANN-family throughput at a scaled corpus — the similarity-search
  * counterpart of [[DedupBench]] (r7 VERDICT item 7): key-shift `scale`
  * copies of the sf0.1 embeddings into a larger corpus and measure
  * `ann_lsh` / `ann_ivf` / `ann_ivf_pq` index build + query cost against
  * a brute-force ground truth computed ON THE SCALED CORPUS (no
  * invariance argument needed — recall is checked against the real
  * answer).
  *
  * Each copy i CYCLICALLY ROTATES the coordinates by i — an orthogonal
  * transform, so all within-copy geometry (norms, pairwise cosines) is
  * EXACTLY preserved while cross-copy vectors decorrelate; the corpus
  * grows honestly (scale× vectors, same intra-copy neighbor structure)
  * without manufacturing duplicate points whose cos=1 ties would make
  * top-K degenerate.
  *
  * The query batch stays FIXED (the base copy's [[Similarity.NumQueries]]
  * ids), so per-query cost across scales is directly comparable. The
  * selectivity knobs grow with the corpus exactly as the operators
  * document (`graft.ann.bits` for LSH bucket count, `graft.ann.cells` /
  * `graft.pq.cells` for IVF) — pass them as args; they are JVM-wide
  * lazy-initialized, hence one (scale, bits, cells) config per run:
  *
  * {{{ SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.AnnBench 10 6 64" }}}
  *
  * Self-checks: LSH recall vs truth ≥ 0.99 (multi-probe family argument
  * — the measured misses are the documented recall curve, not bugs);
  * IVF ≡ truth EXACTLY (triangle-inequality pruning); IVF×PQ ≡ flat ADC
  * EXACTLY (reconstruction-space pruning).
  */
object AnnBench {

  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(10)
    // knobs must be set BEFORE any lazy init in Similarity/ProductQuant
    args.drop(1).headOption.foreach(b => sys.props("graft.ann.bits") = b)
    args.drop(2).headOption.foreach { c =>
      sys.props("graft.ann.cells") = c
      sys.props("graft.pq.cells") =
        math.min(c.toInt, ProductQuant.Codes * 16).toString
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExprs.register(spark)

    val off = 1000000000L
    val base = Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e0"))
    val dim = 64
    val scaled = (0 until scale).map { i =>
      val s = i % dim
      val rot = if (s == 0) col("e0")
        else concat(slice(col("e0"), s + 1, dim - s), slice(col("e0"), 1, s))
      base.select((col("vec_id") + lit(i * off)).as("vec_id"), rot.as("embedding"))
    }.reduce(_ unionByName _)
    val v = scaled
      .select(col("vec_id"), col("embedding").as("e"))
      .withColumn("nrm", graft.functions.VectorExprs.norm(col("e")))
      .localCheckpoint()
    val n = v.count()
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def pairSet(df: DataFrame): Set[(Long, Long)] = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet

    // ground truth: the Q×N exact scan on the SCALED corpus — also the
    // baseline every pruned path's cost is judged against
    val (truth, tBrute) = timed {
      val t = Similarity.bruteForceOn(v).localCheckpoint(); t.count(); t
    }
    val truthSet = pairSet(truth)
    val nq = truth.select("query_id").distinct().count()

    // LSH: index build (the amortized cost) + fixed-batch query
    val (idx, tIndex) = timed {
      val i = Similarity.bucketedIds(v).localCheckpoint(); i.count(); i
    }
    val (lsh, tLsh) = timed {
      val r = Similarity.lshTopKAgainstBase(
        v.filter(col("vec_id") < Similarity.NumQueries), v, idx)
        .localCheckpoint()
      r.count(); r
    }
    val hit = pairSet(lsh).intersect(truthSet).size
    val recall = hit.toDouble / truthSet.size
    require(recall >= 0.99,
      f"LSH recall $recall%.4f below 0.99 ($hit of ${truthSet.size})")
    println(f"""{"metric":"ann_lsh","docs":$n,"queries":$nq,"index_sec":$tIndex%.1f,"query_sec":$tLsh%.1f,"queries_per_sec":${nq / tLsh}%.0f,"recall":$recall%.4f,"brute_sec":$tBrute%.1f,"scale":$scale,"bits":${sys.props.getOrElse("graft.ann.bits", "3")}}""")

    // IVF: exact by construction — equality with truth, not a recall bound
    val (ivf, tIvf) = timed {
      val r = Similarity.annIvfOn(spark, v).localCheckpoint(); r.count(); r
    }
    require(pairSet(ivf) == truthSet, "IVF must equal brute force exactly")
    println(f"""{"metric":"ann_ivf","docs":$n,"queries":$nq,"query_sec":$tIvf%.1f,"queries_per_sec":${nq / tIvf}%.0f,"scale":$scale,"cells":${sys.props.getOrElse("graft.ann.cells", "16")}}""")

    // IVF×PQ vs flat ADC: the pruned form must reproduce the flat scan
    val q = ProductQuant.quantizedOf(
      scaled.select(col("vec_id"), col("embedding"))).localCheckpoint()
    q.count()
    val (flatAdc, tFlat) = timed {
      val r = ProductQuant.adcTop1On(q).localCheckpoint(); r.count(); r
    }
    val (ivfPq, tIvfPq) = timed {
      val r = ProductQuant.ivfAdcTop1On(q).localCheckpoint(); r.count(); r
    }
    val nPq = flatAdc.count()
    require(ivfPq.collect().map(_.toSeq).toSet ==
      flatAdc.collect().map(_.toSeq).toSet,
      "IVF×PQ must equal the flat ADC scan exactly")
    println(f"""{"metric":"ann_ivf_pq","docs":$n,"queries":$nPq,"query_sec":$tIvfPq%.1f,"queries_per_sec":${nPq / tIvfPq}%.0f,"flat_adc_sec":$tFlat%.1f,"scale":$scale,"pq_cells":${sys.props.getOrElse("graft.pq.cells", "16")}}""")
    spark.stop()
  }
}
