package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bucketed-table state spill ([[IncrementalQ3]]'s 100× memory story):
  *  - SEMANTICS: a spilled fold is bit-identical to the in-memory fold at
  *    every batch boundary, including exact empty convergence;
  *  - PHYSICS: after a compaction the spilled state is a bucketed scan,
  *    so a delta join against it shuffles ONLY the delta side;
  *  - HYGIENE: at most the two newest spill versions stay on disk.
  *
  * The changelog is capacity-windowed so deletes interleave mid-stream
  * and a compaction (hence a spill) fires well before teardown ends.
  */
class IncrementalSpillSpec extends SparkSpec {

  private val K = 8

  private lazy val events: DataFrame =
    Changelog.generate(spark, sfDir, capacity = Some(1500L)).localCheckpoint()

  private def fold(onBatch: (Int, IncrementalQ3.State) => Unit)
      : IncrementalQ3.State =
    IncrementalQ3.runBatches(spark, events, K, onBatch = onBatch)

  private def tops(): Seq[Seq[Seq[Any]]] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[Seq[Any]]]
    fold((_, st) => buf += IncrementalQ3.topN(st).collect().map(_.toSeq).toSeq)
    buf.toSeq
  }

  test("spilled fold ≡ in-memory fold at every batch; versions pruned to two") {
    val plain = tops()
    val root = java.nio.file.Files
      .createTempDirectory("graft-ivm-spill").toString
    System.setProperty("graft.ivm.spill.dir", root)
    val spilled = try tops()
    finally System.clearProperty("graft.ivm.spill.dir")
    assert(spilled == plain,
      "state spill is a storage change, never a semantic one")
    assert(plain.last.isEmpty, "full cycle converges to exactly-empty state")
    val versions = Option(new java.io.File(root).listFiles()).getOrElse(Array())
      .filter(_.getName.startsWith("v")).map(_.getName)
    assert(versions.nonEmpty,
      "interleaved deletes must have compacted — and so spilled — mid-fold")
    assert(versions.length <= 2, s"stale spill versions not pruned: ${versions.toSeq}")
  }

  test("delta join against a spilled state shuffles only the delta side") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-ivm-spill-plan").toString
    System.setProperty("graft.ivm.spill.dir", root)
    // Run the probe INSIDE the hook, at the first compaction with live
    // rows: spillHistory just grew, so the state frame is a pure
    // bucketed-table scan (later batches union fresh deltas on top, which
    // rightly erases the bucketing) AND its version is guaranteed live —
    // executing a stashed old State after the fold ends would race
    // version pruning once the fixture produces 3+ compactions
    // (ADVICE r10: latent FileNotFound flake).
    var plan0: Option[String] = None
    var seen = 0
    try fold { (_, st) =>
      if (st.spillHistory.length > seen) {
        seen = st.spillHistory.length
        if (plan0.isEmpty && !st.o.isEmpty) {
          // a batch-sized delta equi-joined on the state's bucket key: the
          // state side must inherit the bucketing — exactly one Exchange
          // (the delta's), never a re-shuffle of the state
          val delta = spark.range(50)
            .select(col("id").as("d_custkey"), lit(1L).as(ZSet.W))
          val j = ZSet.join(delta.hint("merge"), st.o,
            col("d_custkey") === col("o_custkey"))
          j.collect()
          plan0 = Some(j.queryExecution.executedPlan.toString)
        }
      }
    } finally System.clearProperty("graft.ivm.spill.dir")
    val plan = plan0.getOrElse(
      fail("no compaction with live rows — capacity too large?"))
    assert(plan.contains("Bucketed: true"),
      s"the state side must plan as a bucketed scan:\n$plan")
    // every Exchange in the plan repartitions the DELTA (d_custkey); the
    // state's rows never move — that is the whole point of the spill shape
    val exchangeLines = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchangeLines.nonEmpty && exchangeLines.forall(_.contains("d_custkey")),
      s"only the delta side may shuffle:\n$plan")
  }

  test("snapshot save/load composes with spill: resume ≡ uninterrupted") {
    // operability × memory-bound together: a fold running WITH spill is
    // snapshotted mid-stream (its states are bucketed-table scans),
    // reloaded, and folded on — still bit-equal and still exactly empty
    val tMax = events.agg(max(col("t"))).head().getLong(0)
    val batched = events.withColumn("batch",
      least(expr(s"CAST(((t - 1L) * ${K}L) DIV ${tMax}L AS INT)"), lit(K - 1)))
      .localCheckpoint()
    val bs = (0 until K).map(i => batched.filter(col("batch") === i).select("line"))
    val root = java.nio.file.Files
      .createTempDirectory("graft-ivm-spill-snap").toString
    System.setProperty("graft.ivm.spill.dir", s"$root/spill")
    try {
      val direct = bs.foldLeft(IncrementalQ3.init(spark))(IncrementalQ3.step(_, _))
      val half = bs.take(K / 2 + 1)
        .foldLeft(IncrementalQ3.init(spark))(IncrementalQ3.step(_, _))
      assert(half.spillHistory.nonEmpty,
        "the snapshot must be taken AFTER a spill to exercise the composition")
      Snapshots.save(half, s"$root/snap")
      val loaded = Snapshots.load(spark, s"$root/snap")
      assert(loaded.spillHistory == half.spillHistory,
        "the snapshot must carry the spill history, or a resumed fold " +
          "leaks every pre-snapshot version forever")
      val resumed = bs.drop(K / 2 + 1)
        .foldLeft(loaded)(IncrementalQ3.step(_, _))
      val a = IncrementalQ3.topN(direct).collect().map(_.toSeq).toSeq
      val b = IncrementalQ3.topN(resumed).collect().map(_.toSeq).toSeq
      assert(a == b, "spilled-fold resume must equal the uninterrupted fold")
      assert(b.isEmpty, "full cycle still cancels to exactly empty")
    } finally System.clearProperty("graft.ivm.spill.dir")
  }
}
