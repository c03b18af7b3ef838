package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-job attribution for a registered query (guide §1: decide whether
  * time goes to shuffle, compute, or scheduling BEFORE changing code).
  * Runs each named query like [[Solo]] (fresh JVM, per-query isolation)
  * with a listener that records every Spark job's wall time, summed task
  * time, task count, and shuffle bytes — the local-mode stand-in for the
  * Spark UI's Jobs/Stages pages (the UI is disabled in this harness).
  *
  * {{{ SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Prof changelog_counts" }}}
  */
object Prof {

  private final class JobRec(val id: Int) {
    @volatile var start = 0L
    @volatile var end = 0L
    @volatile var desc = ""
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong
    val shuffleRead = new java.util.concurrent.atomic.AtomicLong
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    val stages = ConcurrentHashMap.newKeySet[Int]()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val jobs = new ConcurrentHashMap[Int, JobRec]()
    val stageToJob = new ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val r = new JobRec(e.jobId)
        r.start = e.time
        r.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        e.stageIds.foreach(s => stageToJob.put(s, e.jobId))
        jobs.put(e.jobId, r)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId); if (r != null) r.end = e.time
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val jid = stageToJob.get(e.stageId)
        val r = jobs.get(jid)
        if (r != null && e.taskMetrics != null) {
          r.tasks.incrementAndGet()
          r.taskTimeMs.addAndGet(e.taskMetrics.executorRunTime)
          r.shuffleRead.addAndGet(e.taskMetrics.shuffleReadMetrics.totalBytesRead)
          r.shuffleWrite.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
          r.stages.add(e.stageId)
        }
      }
    })

    for (name <- args) {
      jobs.clear(); stageToJob.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async — let the tail land
      Thread.sleep(500)
      import scala.jdk.CollectionConverters._
      val rs = jobs.values.asScala.toSeq.sortBy(_.id)
      println(f"[prof] $name: $wall%.1f s wall, ${rs.size} jobs, " +
        f"${rs.map(r => (r.end - r.start) / 1e3).sum}%.1f s in-job")
      rs.foreach { r =>
        println(f"[prof]   job ${r.id}%4d ${(r.end - r.start) / 1e3}%7.2fs " +
          f"tasks=${r.tasks.get}%4d taskTime=${r.taskTimeMs.get / 1e3}%8.2fs " +
          f"sRead=${r.shuffleRead.get / 1e6}%8.1fMB sWrite=${r.shuffleWrite.get / 1e6}%8.1fMB " +
          s"${r.desc.take(110)}")
      }
      streaming.Changelog.resetSession(spark)
    }
    spark.stop()
  }
}
