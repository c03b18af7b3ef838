package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.{Changelog, IncrementalQ3}

/** Changelog-throughput benchmark at the reference's OWN event scale.
  *
  * The baseline (BASELINE.md) is TPC-H SF-1: ~15.3M insert/delete events
  * end-to-end in ~71s ≈ 215K events/s (source-throttled). The fixtures top
  * out at sf0.1, so this harness key-shifts `scale` copies of the sf0.1
  * tables into an SF-1-sized corpus (6M lineitem / 1.5M orders / 150K
  * customer at `scale`=10), generates the full two-phase changelog
  * (~15.3M events), folds it through the incremental Q3 pipeline, and
  * reports events/second over the fold.
  *
  * {{{ SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.StreamBench 10 8" }}}
  */
object StreamBench {

  private def scaled(df: DataFrame, keyCols: Seq[String], copies: Int): DataFrame = {
    val off = 1000000000L
    (0 until copies).map { i =>
      keyCols.foldLeft(df)((d, k) => d.withColumn(k, col(k) + i * off))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(10)
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // decoupled knob: thread count vs shuffle width (the sweep couples
    // them; SPARK_GRAFT_SHUFFLE isolates which one a regression tracks)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Large-scale runs fold with the bucketed-table state spill ON (the
    // bounded-memory story — IncrementalQ3's spill note): every compaction
    // MERGEs the z-set states to disk, so the heap envelope is deltas-
    // sized, not state-sized. The default is SCALE-AWARE — measured on
    // this harness, the crossover is between SF-1 (scale 10: in-memory
    // 51 s vs spilled 65 s — the table writes cost more than the modest
    // state saves) and SF-10 (scale 100: spilled 339 s under a 32 g cap
    // vs 413 s in-memory at 64 g) — so spill turns on above scale 10.
    // Override either way: `-Dgraft.ivm.spill.dir=off` or an explicit dir.
    val spillDefault = System.getProperty("java.io.tmpdir") +
      s"/graft_ivm_spill_${spark.sparkContext.applicationId}"
    if (sys.props.get("graft.ivm.spill.dir").isEmpty && scale > 10)
      sys.props("graft.ivm.spill.dir") = spillDefault
    System.err.println(s"[streambench] state spill: ${sys.props.getOrElse("graft.ivm.spill.dir", "off (in-memory fold)")}")

    val li = scaled(Tables.table(spark, sfDir, "lineitem"), Seq("l_orderkey"), scale)
    val or = scaled(Tables.table(spark, sfDir, "orders"),
      Seq("o_orderkey", "o_custkey"), scale)
    val cu = scaled(Tables.table(spark, sfDir, "customer"), Seq("c_custkey"), scale)

    val events = Changelog.generateFrom(li, or, cu).localCheckpoint()
    val nEvents = events.count()
    System.err.println(s"[streambench] $nEvents events generated (scale=$scale)")

    val t0 = System.nanoTime()
    val fin = IncrementalQ3.runBatches(spark, events, k)
    val top = IncrementalQ3.topN(fin).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    require(top.isEmpty, "full cycle must converge to an empty aggregate")
    val spill = sys.props.get("graft.ivm.spill.dir").filterNot(_ == "off")
    println(f"""{"metric":"stream_events_per_sec","value":${nEvents / sec}%.0f,"unit":"events/sec","events":$nEvents,"seconds":$sec%.1f,"batches":$k,"scale":$scale,"spill":${spill.nonEmpty},"max_heap_mb":${Runtime.getRuntime.maxMemory / (1 << 20)}}""")
    spill.foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    spark.stop()
  }
}
