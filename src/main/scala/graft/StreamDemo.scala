package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{Changelog, JsonPushSink, StreamingQ3}

/** End-to-end continuous-query demo — the engine's equivalent of the
  * reference's `TPCHQuery3_StreamProcessor` main (changelog source →
  * incremental Q3 → live top-20 on console + WebSocket/HTTP push):
  *
  * {{{
  *   sbt "runMain graft.StreamDemo /root/testdata/sf0.001 8080"
  *   # ws://localhost:8080        — the reference's own dashboard
  *   #                             (simple_index.html) connects unmodified
  *   curl localhost:8081/top      # latest JSON snapshot
  *   curl -N localhost:8081/watch # SSE stream
  * }}}
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // WebSocket gets the named port (the reference serves WS on 8080,
    // StreamProcessor.java:586); HTTP/SSE sits next to it
    val wsPort = args.drop(1).headOption.map(_.toInt).getOrElse(8080)
    val port = args.drop(2).headOption.map(_.toInt).getOrElse(wsPort + 1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Stable per-fixture working dir: killing the demo mid-stream and
    // rerunning it auto-resumes from the per-batch snapshot instead of
    // replaying into an empty aggregate (StreamingQ3 recovery contract).
    import java.nio.file.{Files, Paths}
    val base = Paths.get(sys.props("java.io.tmpdir"),
      "graft-demo-" + Integer.toHexString(dir.hashCode))
    val changelogDir = base.resolve("changelog").toString
    if (!Files.exists(Paths.get(changelogDir))) {
      Changelog.write(Changelog.generate(spark, dir), changelogDir, nFiles = 8)
      println(s"[demo] changelog staged under $base")
    } else println(s"[demo] resuming from $base")

    val sink = new JsonPushSink(port, wsPort)
    println(s"[demo] serving ws://127.0.0.1:${sink.boundWsPort} and " +
      s"http://127.0.0.1:${sink.boundPort}/top + /watch")
    val query = StreamingQ3.start(spark, changelogDir,
      trigger = Trigger.ProcessingTime("2 seconds"),
      checkpointDir = Some(base.resolve("ckpt").toString),
      snapshotDir = Some(base.resolve("snap").toString),
      onEmit = (rows, id) => {
        StreamingQ3.consoleSink(rows, id)
        sink.push(rows)
      })
    sys.addShutdownHook { sink.stop() }
    query.awaitTermination()
  }
}
