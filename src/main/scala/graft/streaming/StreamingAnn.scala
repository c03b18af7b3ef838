package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Similarity
import graft.sources.{Staging, Tables}

/** CONTINUOUS ANN index maintenance — the streaming twin of the LSH
  * similarity index (r7 VERDICT item 4), mirroring [[StreamingDedup]]'s
  * delta-vs-base shape: a `foreachBatch` ingest where every micro-batch
  * of arriving embeddings is (a) APPENDED into the persisted bucket index
  * — the index a vector store maintains online — and (b) top-K-queried
  * against the FIXED base corpus through [[Similarity.lshTopKAgainstBase]]
  * (multi-probe bucket join, ids-only candidates, exact cosine rerank),
  * so per-batch cost is ∝ batch × bucket-collision rate and the base is
  * never re-bucketed or re-paired.
  *
  * Determinism contract: each delta vector lives in exactly one
  * micro-batch and only ever scores against the fixed base, so the
  * accumulated result set is BATCHING-INVARIANT — however AvailableNow
  * chops the staged delta, the union of per-batch top-K sets equals the
  * one-shot delta-vs-base query, and (the LSH family's full-recall
  * regime + exact rerank) that equals brute-force cosine top-K — the
  * driver's DuckDB oracle. Likewise the accumulated index union equals a
  * from-scratch [[Similarity.bucketedIds]] over base ∪ delta
  * (StreamingAnnSpec pins both, kill-and-resume included).
  *
  * Operability contract: offsets under `ckpt`; each batch writes its
  * index shard and its results to their own `batch_<id>` directories
  * with overwrite — idempotent under retry, so a killed-and-resumed
  * ingest neither loses nor duplicates rows.
  */
object StreamingAnn {

  private val runCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** What a deployment persists: base payloads (for the exact rerank),
    * the base bucket index, and the staged arrival directory.
    */
  final case class IngestContext(baseVecs: DataFrame, baseIndex: DataFrame,
                                 staged: String, splitId: Long)

  /** Build the base state ONCE (norms + bucketing paid before the stream
    * starts) and stage the delta (trailing 10% of vec_ids) as multiple
    * files so `maxFilesPerTrigger=1` exercises real multi-batch ingest.
    */
  def prepare(spark: SparkSession, dir: String): IngestContext = {
    val v = Similarity.vectors(spark, dir).localCheckpoint()
    val maxId = v.agg(max(col("vec_id"))).head().getLong(0)
    val splitId = maxId * 9 / 10
    val baseVecs = v.filter(col("vec_id") < splitId).localCheckpoint()
    val baseIndex = Similarity.bucketedIds(baseVecs).localCheckpoint()
    val staged = Staging.ensure(Staging.dirFor(spark, "streamann", dir)) { out =>
      Tables.table(spark, dir, "embeddings")
        .filter(col("vec_id") >= splitId)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .repartition(4)
        .write.mode("overwrite").parquet(out)
    }
    IngestContext(baseVecs, baseIndex, staged, splitId)
  }

  /** Start the checkpointed ingest: per batch, one index shard under
    * `acc/index/batch_<id>` and one result set under
    * `acc/results/batch_<id>` (overwrite = retry-idempotent).
    */
  def startCheckpointed(spark: SparkSession, ctx: IngestContext,
                        ckpt: String, acc: String): StreamingQuery = {
    StreamTune.prepare(spark)
    spark.readStream.schema("vec_id bigint, e array<double>")
      .option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "*.parquet")
      .parquet(ctx.staged)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val bv = batch
          .withColumn("nrm", graft.functions.VectorExprs.norm(col("e")))
          .localCheckpoint() // index shard + query both read it
        Similarity.bucketedIds(bv)
          .write.mode("overwrite").parquet(s"$acc/index/batch_$id")
        Similarity.lshTopKAgainstBase(bv, ctx.baseVecs, ctx.baseIndex)
          .write.mode("overwrite").parquet(s"$acc/results/batch_$id")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** All delta top-K results accumulated so far. */
  def accumulatedResults(spark: SparkSession, acc: String): DataFrame =
    spark.read.parquet(s"$acc/results/batch_*")
      .orderBy(col("query_id"), col("rank"))

  /** The maintained index: base ∪ every appended batch shard. */
  def accumulatedIndex(spark: SparkSession, ctx: IngestContext,
                       acc: String): DataFrame =
    ctx.baseIndex.unionByName(spark.read.parquet(s"$acc/index/batch_*"))

  /** Driver-contract entry: prepare, drain the checkpointed ingest,
    * return the accumulated delta top-K (= brute-force delta-vs-base —
    * the DuckDB oracle).
    */
  def streamAnnIncremental(spark: SparkSession, dir: String): DataFrame = {
    val ctx = prepare(spark, dir)
    val run = System.getProperty("java.io.tmpdir") +
      s"/graft_streamann_run_${spark.sparkContext.applicationId}_${runCounter.incrementAndGet()}"
    val q = startCheckpointed(spark, ctx, s"$run/ckpt", s"$run/acc")
    q.awaitTermination()
    accumulatedResults(spark, s"$run/acc")
  }
}
