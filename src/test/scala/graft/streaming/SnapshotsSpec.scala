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
    val direct = bs.foldLeft(IncrementalQ3.init(spark))(IncrementalQ3.step)
    val snapDir = java.nio.file.Files.createTempDirectory("graft-snap").toString

    val half = bs.take(2).foldLeft(IncrementalQ3.init(spark))(IncrementalQ3.step)
    Snapshots.save(half, snapDir)
    val resumed = bs.drop(2).foldLeft(Snapshots.load(spark, snapDir))(IncrementalQ3.step)

    val a = IncrementalQ3.topN(direct).collect().map(_.toSeq).toSeq
    val b = IncrementalQ3.topN(resumed).collect().map(_.toSeq).toSeq
    assert(a.nonEmpty && a == b)
  }

  test("full-cycle resume still cancels to exactly empty") {
    val bs = batches(insertOnly = false, k = 3)
    val snapDir = java.nio.file.Files.createTempDirectory("graft-snap2").toString
    val first = IncrementalQ3.step(IncrementalQ3.init(spark), bs.head)
    Snapshots.save(first, snapDir)
    val fin = bs.tail.foldLeft(Snapshots.load(spark, snapDir))(IncrementalQ3.step)
    assert(IncrementalQ3.topN(fin).collect().isEmpty)
  }
}
