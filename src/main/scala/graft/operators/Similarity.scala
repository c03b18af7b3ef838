package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (builder brief): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH-bucketed variant as the scale path.
  */
object Similarity {

  val K = 5
  val NumQueries = 10

  /** Cosine similarity between two double arrays: codegen'd left-fold dot
    * product / norms ([[graft.functions.VectorExprs.DotProduct]]), the
    * identical sequence of double operations as the DuckDB oracle's
    * `list_sum(list_transform(list_zip(..)))` (bit-stable comparison).
    */
  def cosine(a: Column, b: Column): Column = {
    import graft.functions.VectorExprs.{dot, norm}
    dot(a, b) / (norm(a) * norm(b))
  }

  /** `(vec_id, e, nrm)` — norms computed ONCE per vector, not per pair. */
  private[operators] def vectors(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExprs.register(spark)
    Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", graft.functions.VectorExprs.norm(col("e")))
  }

  private def topK(scored: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("c").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("c"), 6).as("cosine"))
      .orderBy("query_id", "rank")
  }

  /** Exact top-K: broadcast the (small) query set against the full corpus —
    * one scan, no all-pairs shuffle; per-query heap via window rank. At
    * 100 TB the corpus side stays partitioned and only the queries move.
    */
  def annBruteForce(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorExprs.dot
    val v = vectors(spark, dir)
    val q = v.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    val scored = v.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("qe"), col("e")) / (col("qn") * col("nrm"))).as("c"))
    topK(scored)
  }

  // --- random-hyperplane LSH ---------------------------------------------

  private val Dim = 64
  // Few bits + many tables: fixture embeddings are near-orthogonal (top
  // neighbors at cos ≈ 0.37 ⇒ P(bit agree) ≈ 0.62), so recall per b-bit
  // table is 0.62^b; 16 tables × 4 bits ⇒ expected recall ≈ 0.92.
  private val NumTables = 16
  private val BitsPerTable = 4

  /** Deterministic ±1 hyperplane components, seeded once — the engine's
    * fixed hash family (analogous to MinHash's seeds).
    */
  private lazy val hyperplanes: Array[Array[Double]] = {
    val rnd = new Random(42)
    Array.fill(NumTables * BitsPerTable, Dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  private def bucketCols: Seq[Column] = {
    def proj(p: Array[Double]): Column =
      aggregate(zip_with(col("e"), typedLit(p.toSeq), (x, s) => x * s),
        lit(0.0), (acc, v) => acc + v)
    (0 until NumTables).map { t =>
      (0 until BitsPerTable).map { b =>
        when(proj(hyperplanes(t * BitsPerTable + b)) >= 0, lit(1L << b)).otherwise(0L)
      }.reduce[Column](_ bitwiseOR _).as(s"bucket$t")
    }
  }

  // --- IVF (inverted-file) ANN -------------------------------------------

  private val IvfCells = 16
  private val IvfProbes = 4

  /** IVF-bucketed ANN — the other classic scale path: a coarse k-means
    * quantizer (MLlib, trained once over the corpus) partitions vectors
    * into cells; each query scores only its [[IvfProbes]] nearest cells
    * (~25% of the corpus here instead of all of it; at 100 TB the cell
    * count grows with the corpus and the scan fraction shrinks).
    * Approximate: recall vs the exact baseline is spec'd, like [[annLsh]].
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorExprs.dot
    val v = vectors(spark, dir).localCheckpoint()
    val withVec = v.withColumn("fv",
      org.apache.spark.ml.functions.array_to_vector(col("e")))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(IvfCells).setSeed(42).setMaxIter(10)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(withVec)
    val assigned = model.transform(withVec).select("vec_id", "e", "nrm", "cell")
    // probe list per query: nearest cells by euclidean distance to centroid
    val centers = model.clusterCenters.map(_.toArray)
    val queries = v.filter(col("vec_id") < NumQueries)
      .select("vec_id", "e", "nrm").collect()
    val probes = queries.flatMap { r =>
      val q = r.getSeq[Double](1).toArray
      centers.zipWithIndex
        .map { case (c, i) =>
          (i, math.sqrt(q.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum))
        }
        .sortBy(_._2).take(IvfProbes)
        .map { case (cell, _) => (r.getLong(0), cell) }
    }
    import spark.implicits._
    val probeDf = probes.toSeq.toDF("query_id", "cell")
    val q = v.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"))
    val cand = assigned
      .join(broadcast(probeDf), "cell")
      .join(broadcast(q),
        col("vec_id") =!= col("qid") && col("qid") === col("query_id"))
    topK(cand.select(col("query_id"), col("vec_id").as("neighbor_id"),
      (dot(col("qe"), col("e")) / (col("qn") * col("nrm"))).as("c")))
  }

  /** LSH-bucketed ANN: sign-of-projection sketches put each vector in
    * `NumTables` buckets; a query only scores vectors sharing ≥1 bucket.
    * Approximate (recall measured in SimilaritySpec against the exact
    * baseline) — the shuffle is bucket-sized, never corpus².
    */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorExprs.dot
    val v = vectors(spark, dir)
      .select(col("vec_id") +: col("e") +: col("nrm") +: bucketCols: _*)
    val flat = v.select(col("vec_id"), col("e"), col("nrm"),
      posexplode(array((0 until NumTables).map(t => col(s"bucket$t")): _*)))
      .toDF("vec_id", "e", "nrm", "table", "bucket")
    val q = flat.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"),
        col("table").as("qt"), col("bucket").as("qb"))
    val cand = flat.join(q,
        col("table") === col("qt") && col("bucket") === col("qb") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("qe"), col("e"), col("qn"), col("nrm"))
      .distinct()
    topK(cand.select(col("query_id"), col("neighbor_id"),
      (dot(col("qe"), col("e")) / (col("qn") * col("nrm"))).as("c")))
  }
}
