package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

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
  */
object StreamingDedup {

  private val runCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  def streamIncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingled(spark, dir).localCheckpoint()
    // bounded scalar: the split point, delta = trailing 10% of the id space
    val maxId = sh.agg(max(col("doc_id"))).head().getLong(0)
    val splitId = maxId * 9 / 10
    val baseSh = sh.filter(col("doc_id") < splitId).localCheckpoint()
    // the base pays its banding cost ONCE, before the stream starts — the
    // persisted index is what each micro-batch probes
    val baseIndex = Dedup.lshIndex(baseSh).localCheckpoint()
    // stage the delta as multiple files; maxFilesPerTrigger=1 makes each
    // file a micro-batch, so the run exercises real multi-batch ingest
    val staged = Staging.ensure(Staging.dirFor(spark, "streamdedup", dir)) { out =>
      Tables.table(spark, dir, "documents")
        .filter(col("doc_id") >= splitId)
        .select(col("doc_id"), col("text"))
        .repartition(4)
        .write.mode("overwrite").parquet(out)
    }
    val acc = System.getProperty("java.io.tmpdir") +
      s"/graft_streamdedup_acc_${spark.sparkContext.applicationId}_${runCounter.incrementAndGet()}"
    val q = spark.readStream.schema("doc_id bigint, text string")
      .option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "*.parquet")
      .parquet(staged)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val batchSh = Dedup.shingledDocs(batch)
        // shAll = base ∪ this batch: candidate pairs are base×batch, and
        // the exact-Jaccard verify only fetches shingles of touched docs
        Dedup.incrementalPairs(baseIndex, baseSh.union(batchSh), batchSh)
          .write.mode("append").parquet(acc)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(acc).orderBy("doc_a", "doc_b")
  }
}
