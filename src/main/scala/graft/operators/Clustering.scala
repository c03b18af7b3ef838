package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** K-MEANS over the embedding corpus — Lloyd's algorithm in the shape a
  * 100 TB training-data pipeline actually runs it (semantic sharding,
  * coreset selection, topic bucketing all start with "cluster the
  * embeddings"):
  *
  *  - **assignment is a PROJECTION, not a join**: the k centroids are
  *    tiny (k·dim longs), so they ride into the plan as array literals
  *    and every row computes its own argmin with `zip_with`/`aggregate`
  *    HOFs inside whole-stage codegen — zero shuffle, zero UDF, works
  *    identically on 10³ or 10¹² rows;
  *  - **the update is one hash aggregate** on (cluster, dim) — k·dim
  *    groups with map-side partial sums, the only shuffle per iteration,
  *    collected to the driver as the next iteration's k·dim literals
  *    (O(k·dim) driver state is the canonical distributed k-means
  *    contract — the DATA never moves to the driver);
  *  - **fixed-point integer arithmetic end to end** (the [[Graph]]
  *    lesson): embeddings are quantized once to integer millionths, so
  *    distances, sums, and truncating-division means are exact,
  *    associative, and bit-identical across engines, partitionings, and
  *    runs — a float Lloyd's loop can tie-break differently per run and
  *    cannot be oracle-checked.
  *
  * Contract: k=8 centroids seeded from `vec_id` 0..7, 3 assign+update
  * rounds, then a final assignment; per-cluster size / inertia /
  * membership checksums come from that final assignment. Empty clusters
  * keep their previous centroid (the standard Lloyd's convention, and
  * mirrored literally in the oracle SQL).
  */
object Clustering {

  val K = 8
  val Iters = 3
  val Scale = 1000000L // float → integer millionths, exact in double

  /** `floor(x·10⁶)` on the double-widened float: float→double is exact,
    * the product is one correctly-rounded IEEE op, floor is exact — the
    * same three deterministic steps DuckDB's `floor(CAST(x AS DOUBLE) *
    * 1000000)` performs, so both engines quantize bit-identically.
    */
  private def quantized: Column =
    transform(col("embedding"),
      x => floor(x.cast("double") * Scale).cast("long"))

  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), quantized.as("e"))

  /** Squared L2 distance between the row's vector and one centroid
    * literal — pure codegen HOFs, exact int64 (|q| ≤ 10⁶ ⇒ per-dim square
    * ≤ 4·10¹², ×64 dims ≪ 2⁶³).
    */
  private def dist2(ce: Seq[Long]): Column =
    aggregate(zip_with(col("e"), typedlit(ce), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** argmin over the k centroids as an `array_min` of (dist, cid) structs
    * — lexicographic struct ordering IS the tie-break-by-cid contract.
    */
  private def assign(centroids: Seq[(Long, Seq[Long])]): Column =
    array_min(array(centroids.map { case (cid, ce) =>
      struct(dist2(ce).as("dist"), lit(cid).as("cid"))
    }: _*))

  /** One update round: per-(cluster, dim) integer sums/counts — the k·dim
    * hash aggregate — merged driver-side into the next centroid map.
    */
  private def updated(q: DataFrame, centroids: Seq[(Long, Seq[Long])])
      : Seq[(Long, Seq[Long])] = {
    val rows = q.select(assign(centroids).getField("cid").as("cid"), col("e"))
      .select(col("cid"), posexplode(col("e")).as(Seq("dim", "v")))
      .groupBy(col("cid"), col("dim"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
      .collect() // k·dim rows — bounded by the contract, not the data
    val byCid = rows.groupBy(_.getLong(0))
    centroids.map { case (cid, old) =>
      cid -> byCid.get(cid).fold(old) { rs =>
        val m = rs.map(r => r.getInt(1) -> {
          val s = r.getLong(2); val c = r.getLong(3)
          // truncate toward zero, matching both Spark DIV and DuckDB //
          s / c
        }).toMap
        old.indices.map(i => m(i))
      }
    }
  }

  def kmeans(spark: SparkSession, dir: String): DataFrame = {
    val q = vecs(spark, dir).localCheckpoint() // 3+1 passes over one scan
    val init = q.filter(col("vec_id") < K).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq)
      .sortBy(_._1).toSeq
    var centroids: Seq[(Long, Seq[Long])] = init
    for (_ <- 1 to Iters) centroids = updated(q, centroids)
    q.select(col("vec_id"), assign(centroids).as("m"))
      .groupBy(col("m.cid").as("cluster_id"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("m.dist")).as("inertia"),
        sum(col("vec_id")).as("sum_vec_ids"),
        min(col("vec_id")).as("min_vec_id"))
      .orderBy(col("cluster_id"))
  }

  /** DuckDB oracle: the same 3 rounds unrolled as chained CTEs over the
    * same quantization, truncating `//` means, carry-forward for empty
    * clusters, and the same (dist, cid) tie-break.
    */
  val kmeansOracleSql: String = {
    val base =
      s"""WITH q AS (SELECT vec_id,
         |      list_transform(CAST(embedding AS DOUBLE[]),
         |        x -> CAST(floor(x * $Scale) AS BIGINT)) AS e
         |    FROM embeddings),
         |c0 AS (SELECT vec_id AS cid, e AS ce FROM q WHERE vec_id < $K)""".stripMargin
    def assignCte(a: String, c: String) =
      s"""$a AS (
         |  SELECT vec_id, e, cid, dist FROM (
         |    SELECT q.vec_id, q.e, c.cid,
         |      CAST(list_sum(list_transform(list_zip(q.e, c.ce),
         |        p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS dist,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        CAST(list_sum(list_transform(list_zip(q.e, c.ce),
         |          p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT), c.cid) AS rn
         |    FROM q, $c c) t WHERE rn = 1)""".stripMargin
    val iters = (1 to Iters).map { i =>
      s"""${assignCte(s"a$i", s"c${i - 1}")},
         |u$i AS (
         |  SELECT cid, list(m ORDER BY dim) AS ce FROM (
         |    SELECT a.cid, t.i AS dim,
         |      CAST(sum(a.e[t.i + 1]) AS BIGINT) // count(*) AS m
         |    FROM a$i a, range(64) t(i)
         |    GROUP BY a.cid, t.i) s
         |  GROUP BY cid),
         |c$i AS (SELECT cid, ce FROM u$i
         |        UNION ALL
         |        SELECT p.cid, p.ce FROM c${i - 1} p
         |        WHERE p.cid NOT IN (SELECT cid FROM u$i))""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$iters,
       |${assignCte("fin", s"c$Iters")}
       |SELECT cid AS cluster_id, count(*) AS n_vecs,
       |       CAST(sum(dist) AS BIGINT) AS inertia,
       |       CAST(sum(vec_id) AS BIGINT) AS sum_vec_ids,
       |       min(vec_id) AS min_vec_id
       |FROM fin GROUP BY cid ORDER BY cluster_id""".stripMargin
  }
}
