package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Restart-from-snapshot: folding a changelog with a save/load cycle in
  * the middle must be indistinguishable from an uninterrupted fold.
  */
class SnapshotsSpec extends SparkSpec {

  private def batches(insertOnly: Boolean, k: Int) = {
    val ev = Changelog.generateCached(spark, sfDir, insertOnly = insertOnly)
    val tMax = ev.agg(max(col("t"))).head().getLong(0)
    val b = ev.withColumn("batch",
      least(expr(s"CAST(((t - 1L) * ${k}L) DIV ${tMax}L AS INT)"), lit(k - 1)))
      .localCheckpoint()
    (0 until k).map(i => b.filter(col("batch") === i).select("line"))
  }

  test("save/load mid-stream resumes to the exact uninterrupted answer") {
    val bs = batches(insertOnly = true, k = 4)
    val direct = bs.foldLeft(IncrementalQ3.init(spark))(IncrementalQ3.step(_, _))
    val snapDir = java.nio.file.Files.createTempDirectory("graft-snap").toString

    val half = bs.take(2).foldLeft(IncrementalQ3.init(spark))(IncrementalQ3.step(_, _))
    Snapshots.save(half, snapDir)
    val resumed = bs.drop(2).foldLeft(Snapshots.load(spark, snapDir))(IncrementalQ3.step(_, _))

    val a = IncrementalQ3.topN(direct).collect().map(_.toSeq).toSeq
    val b = IncrementalQ3.topN(resumed).collect().map(_.toSeq).toSeq
    assert(a.nonEmpty && a == b)
  }

  test("delta snapshots resume to the exact uninterrupted answer at every kill point") {
    // a SPILLED fold saved with saveBatchAuto persists only the pending
    // deltas + the spill-version pointer once spillMeta exists; resuming
    // from that delta snapshot must equal the uninterrupted fold no matter
    // where the kill lands relative to the compaction cadence (before the
    // first spill → full form; right after a compaction → pure metadata;
    // mid-window → base + pending chain)
    val k = 6 // CompactEvery = 4: kill points straddle the first compaction
    val bs = batches(insertOnly = true, k = k)
    val spillA = java.nio.file.Files.createTempDirectory("graft-dsnap-a").toString
    val direct = bs.foldLeft(IncrementalQ3.init(spark))(
      IncrementalQ3.step(_, _, spillDir = Some(spillA)))
    val truth = IncrementalQ3.topN(direct).collect().map(_.toSeq).toSeq
    assert(truth.nonEmpty)
    // kill points: pre-spill, at-compaction, mid-window — and mid-window
    // again over the MERGELOG root binding (the delta snapshot's resume
    // resolves the root's FORMAT marker, so the pending-chain composition
    // must hold under either layout)
    for ((cut, fmt) <- Seq(2 -> "parquet", 4 -> "parquet",
                           5 -> "parquet", 5 -> "mergelog")) {
      val spillB = java.nio.file.Files
        .createTempDirectory(s"graft-dsnap-b$cut-$fmt").toString
      SpillFormat.pin(spillB, fmt)
      val snapDir = java.nio.file.Files
        .createTempDirectory(s"graft-dsnap-s$cut-$fmt").toString
      var st = IncrementalQ3.init(spark)
      bs.take(cut).zipWithIndex.foreach { case (b, i) =>
        st = IncrementalQ3.step(st, b, spillDir = Some(spillB))
        Snapshots.saveBatchAuto(st, snapDir, i.toLong)
      }
      // the snapshot form must match the kill point: delta once spilled
      val latest = s"$snapDir/b${cut - 1}"
      val isDelta = java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$latest/DELTA"))
      assert(isDelta == (cut >= 4),
        s"cut=$cut: expected ${if (cut >= 4) "delta" else "full"} snapshot form")
      val (resumedSt, lastId) = Snapshots.loadLatest(spark, snapDir).get
      assert(lastId == cut - 1)
      val fin = bs.drop(cut).foldLeft(resumedSt)(
        IncrementalQ3.step(_, _, spillDir = Some(spillB)))
      val got = IncrementalQ3.topN(fin).collect().map(_.toSeq).toSeq
      assert(got == truth,
        s"delta-snapshot resume diverged at cut=$cut fmt=$fmt")
      IncrementalQ3.cleanupSpillRoot(spark, spillB)
    }
    IncrementalQ3.cleanupSpillRoot(spark, spillA)
  }

  test("full-cycle resume still cancels to exactly empty") {
    val bs = batches(insertOnly = false, k = 3)
    val snapDir = java.nio.file.Files.createTempDirectory("graft-snap2").toString
    val first = IncrementalQ3.step(IncrementalQ3.init(spark), bs.head)
    Snapshots.save(first, snapDir)
    val fin = bs.tail.foldLeft(Snapshots.load(spark, snapDir))(IncrementalQ3.step(_, _))
    assert(IncrementalQ3.topN(fin).collect().isEmpty)
  }

  test("continuous query kill-and-resume equals the uninterrupted run") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.Relational

    val ev = Changelog.generateCached(spark, sfDir, insertOnly = true)
    val live = Files.createTempDirectory("graft-resume-live").toString
    val stage = Files.createTempDirectory("graft-resume-stage").toString
    val ckpt = Files.createTempDirectory("graft-resume-ckpt").toString
    val snap = Files.createTempDirectory("graft-resume-snap").toString
    val half = ev.agg(max(col("t"))).head().getLong(0) / 2
    Changelog.write(ev.filter(col("t") <= half), live, nFiles = 2)
    Changelog.write(ev.filter(col("t") > half), stage, nFiles = 2)

    def run(expectBatches: Option[Int]): Seq[Seq[Any]] = {
      @volatile var last: Array[org.apache.spark.sql.Row] = Array.empty
      var n = 0
      val q = StreamingQ3.start(spark, live, trigger = Trigger.AvailableNow(),
        checkpointDir = Some(ckpt), snapshotDir = Some(snap),
        onEmit = (rows, _) => { last = rows; n += 1 })
      assert(q.awaitTermination(300000), "streaming query did not finish in time")
      expectBatches.foreach(e => assert(n == e, s"expected $e batches, ran $n"))
      last.map(r => Seq(r.getLong(0), r.getDate(1).toString,
        r.getString(2), r.getDouble(3))).toSeq
    }

    run(expectBatches = Some(2)) // phase 1: two files → batches 0, 1
    // "kill": q1's driver-held state is gone. Stage the rest of the
    // changelog (fresh mtimes) and restart with the same dirs — resume
    // must load snapshot b1 and fold ONLY the two new batches.
    val files = Files.list(Paths.get(stage))
    try files.filter(p => p.getFileName.toString.matches("part-.*\\.txt"))
      .forEach(p => Files.copy(p, Paths.get(live, "z-" + p.getFileName),
        StandardCopyOption.REPLACE_EXISTING))
    finally files.close()
    val resumed = run(expectBatches = Some(2)) // batches 2, 3 only

    val want = Relational.q3Batch(spark, sfDir)
      .select(col("l_orderkey"), to_date(col("o_orderdate")).cast("string"),
        col("o_orderpriority"), col("revenue"))
      .collect().map(_.toSeq).toSeq
    assert(resumed.nonEmpty && resumed == want)

    // crash between snapshot flip and offset commit: drop the last commit
    // marker so batch 3 is re-delivered. The resume path must SKIP
    // re-folding it (snapshot b3 already contains it) — a re-fold would
    // double-count batch 3 and shift the top-20 revenues.
    val commits = Files.list(Paths.get(ckpt, "commits"))
    val lastCommit = try {
      import scala.jdk.CollectionConverters._
      commits.iterator().asScala
        .filter(_.getFileName.toString.forall(_.isDigit))
        .maxBy(_.getFileName.toString.toLong)
    } finally commits.close()
    Files.delete(lastCommit)
    // the local FS keeps a checksum sibling; a stale one fails the re-write
    Files.deleteIfExists(
      lastCommit.resolveSibling("." + lastCommit.getFileName + ".crc"))
    val redelivered = run(expectBatches = Some(1)) // batch 3 again, skipped
    assert(redelivered == want)
  }
}
