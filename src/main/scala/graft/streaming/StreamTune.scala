package graft.streaming

import org.apache.spark.sql.SparkSession

/** Session tuning for the REAL Structured Streaming query paths —
  * measured-first knobs (guide §1, §2) with scale-adaptive derivations,
  * never constants tuned to the local harness:
  *
  *  1. '''Checkpoint-file checksums''' (Spark 4.1 writes a checksum twin
  *     for every checkpoint file — state deltas, offsets, commits — and
  *     every file close BLOCKS on the checksum write through one fixed
  *     thread pool; `ChecksumCancellableFSDataOutputStream.close` →
  *     `awaitResult` was the top frame of every executor task in a
  *     thread dump of the stream-stream join). Measured on
  *     `stream_join_interval` at sf0.1/local[32]: 24.5 s → 15.8 s wall,
  *     per-batch task time 181 s → 79 s, from this switch alone. The
  *     checksums exist to detect checkpoint corruption on unreliable
  *     stores; this engine's harness checkpoints to local disk where the
  *     kernel already CRCs, so the default here is OFF — a deployment on
  *     object storage re-enables with `-Dgraft.stream.checkpoint.checksum=true`
  *     (cost there is per FILE, so it also shrinks with the partition
  *     sizing below, which reduces file count).
  *
  *  2. '''State partition count''' derived from INPUT SIZE (guide §2:
  *     "make partitioning scale-adaptive — derive from input size —
  *     rather than a constant tuned for either local mode or the
  *     cluster"). A stateful operator instantiates one state store per
  *     shuffle partition per micro-batch; each instance is a FIXED cost
  *     (RocksDB open + commit measured 0.3–1.3 s/task under 32-way
  *     contention at sf0.1, for partitions holding a few KB of state).
  *     Partitions should be sized so each holds real state:
  *     `ceil(inputBytes / targetPartitionBytes)`, floored at 1 and
  *     capped at the session's configured `spark.sql.shuffle.partitions`
  *     — the cluster-sized ceiling an operator raises at scale, so a
  *     100 TB input saturates the cluster while a 2 MB fixture does not
  *     pay 32 store instances per batch. Target is 32 MB per partition
  *     (`-Dgraft.stream.state.targetPartitionBytes` overrides; half the
  *     AQE advisory default, because stateful partitions pay store I/O
  *     on top of compute). Measured on `stream_join_interval`:
  *     15.8 s → 9.6 s on top of the checksum switch.
  *
  * The derivation is deterministic in the input, so a kill/resume of a
  * checkpointed query re-derives the same partition count (Spark pins
  * the stateful-operator partition count in the checkpoint and would
  * reject a change).
  */
object StreamTune {

  /** Apply engine streaming defaults to the session (idempotent; called
    * at every streaming entry point rather than at session build so any
    * caller-constructed session gets them).
    */
  def prepare(spark: SparkSession): Unit = {
    val checksum = java.lang.Boolean.getBoolean("graft.stream.checkpoint.checksum")
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled",
      checksum.toString)
  }

  private def targetPartitionBytes: Long =
    java.lang.Long.getLong("graft.stream.state.targetPartitionBytes", 32L << 20)

  /** Scale-adaptive stateful-operator parallelism for a stream whose
    * total input is `inputBytes`: one partition per `targetPartitionBytes`
    * of input, in [1, session shuffle partitions].
    */
  def statePartitions(spark: SparkSession, inputBytes: Long): Int = {
    val cap = spark.sessionState.conf.numShufflePartitions
    val derived = ((inputBytes + targetPartitionBytes - 1) / targetPartitionBytes)
    math.max(1, math.min(cap.toLong, derived).toInt)
  }

  /** Total bytes under a local staging dir (the input-size measurement
    * for [[statePartitions]] when the stream reads staged files).
    */
  def dirBytes(path: String): Long = {
    val root = new java.io.File(path)
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
    if (root.exists()) walk(root) else 0L
  }

  /** Run `body` (start query + await termination) with the session's
    * shuffle-partition count set to `n`, restoring the previous value
    * after. The stateful operators capture the value at query start and
    * pin it in the checkpoint; restoring after termination cannot affect
    * the finished query. Callers must run their query to termination
    * INSIDE `body` — restoring while the first batch is still planning
    * would race the capture.
    */
  def withStatePartitions[A](spark: SparkSession, n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, old)
  }
}
