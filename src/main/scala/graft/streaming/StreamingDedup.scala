package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup
import graft.sources.{Staging, Tables}

/** CONTINUOUS near-dup intake — the streaming twin of
  * [[graft.operators.Dedup.dedupIncremental]] (r5 VERDICT item 7): a
  * `foreachBatch` ingest where every micro-batch of arriving documents is
  * shingled, banded, and joined against the PERSISTED base LSH index, so
  * per-batch cost is ∝ batch × bucket-collision rate and the base corpus
  * is never re-paired. This is the production shape of a training-data
  * intake: the index is built once (and appended to out-of-band); arrival
  * batching carries no semantic weight.
  *
  * Determinism contract: each delta document lives in exactly one
  * micro-batch and only ever pairs against the fixed base index, so the
  * accumulated pair set is BATCHING-INVARIANT — however AvailableNow chops
  * the staged delta into micro-batches, the union of per-batch pair sets
  * equals the one-shot [[Dedup.dedupIncremental]] answer, which is what
  * lets a true streaming run share the batch query's exact-Jaccard oracle.
  *
  * Operability contract: the ingest runs CHECKPOINTED (source offsets
  * under `ckpt`) and each micro-batch writes its pairs to its own
  * `batch_<id>` directory with overwrite — idempotent under retry, so a
  * killed-and-resumed ingest neither loses nor duplicates pairs
  * (StreamingDedupSpec's kill-and-resume test).
  */
object StreamingDedup {

  private val runCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The pieces a deployment persists: the base shingle store, the base
    * LSH index, and the staged arrival directory.
    */
  final case class IngestContext(baseSh: DataFrame, baseIndex: DataFrame,
                                 staged: String)

  /** Build the base corpus state ONCE (shingling + banding paid before
    * the stream starts) and stage the delta (trailing 10% of doc_ids) as
    * multiple files so `maxFilesPerTrigger=1` exercises real multi-batch
    * ingest.
    */
  def prepare(spark: SparkSession, dir: String): IngestContext = {
    val sh = Dedup.shingled(spark, dir).localCheckpoint()
    // bounded scalar: the split point, delta = trailing 10% of the id space
    val maxId = sh.agg(max(col("doc_id"))).head().getLong(0)
    val splitId = maxId * 9 / 10
    val baseSh = sh.filter(col("doc_id") < splitId).localCheckpoint()
    val baseIndex = Dedup.lshIndex(baseSh).localCheckpoint()
    val staged = Staging.ensure(Staging.dirFor(spark, "streamdedup", dir)) { out =>
      Tables.table(spark, dir, "documents")
        .filter(col("doc_id") >= splitId)
        .select(col("doc_id"), col("text"))
        .repartition(4)
        .write.mode("overwrite").parquet(out)
    }
    IngestContext(baseSh, baseIndex, staged)
  }

  /** Start the checkpointed ingest: offsets live under `ckpt`, each
    * micro-batch's verified pairs land in `acc/batch_<id>` (overwrite =
    * retry-idempotent). Resuming with the same `ckpt` continues from the
    * first uncommitted file.
    */
  def startCheckpointed(spark: SparkSession, ctx: IngestContext,
                        ckpt: String, acc: String): StreamingQuery = {
    StreamTune.prepare(spark)
    spark.readStream.schema("doc_id bigint, text string")
      .option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "*.parquet")
      .parquet(ctx.staged)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val batchSh = Dedup.shingledDocs(batch)
        // shAll = base ∪ this batch: candidate pairs are base×batch, and
        // the exact-Jaccard verify only fetches shingles of touched docs
        Dedup.incrementalPairs(ctx.baseIndex, ctx.baseSh.union(batchSh), batchSh)
          .write.mode("overwrite").parquet(s"$acc/batch_$id")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** All pairs accumulated so far across batch directories. */
  def accumulated(spark: SparkSession, acc: String): DataFrame =
    spark.read.parquet(s"$acc/batch_*").orderBy("doc_a", "doc_b")

  /** Driver-contract entry: prepare, run the checkpointed ingest to
    * end-of-available, return the accumulated pair set — equals the batch
    * [[Dedup.dedupIncremental]] answer (shared oracle).
    */
  def streamIncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val ctx = prepare(spark, dir)
    val run = System.getProperty("java.io.tmpdir") +
      s"/graft_streamdedup_run_${spark.sparkContext.applicationId}_${runCounter.incrementAndGet()}"
    val q = startCheckpointed(spark, ctx, s"$run/ckpt", s"$run/acc")
    q.awaitTermination()
    accumulated(spark, s"$run/acc")
  }
}
