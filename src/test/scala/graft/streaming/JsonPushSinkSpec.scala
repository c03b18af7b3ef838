package graft.streaming

import java.net.{HttpURLConnection, URI}
import scala.io.Source

import graft.SparkSpec
import graft.operators.Relational

/** The push sink serves the reference's JSON message contract over HTTP. */
class JsonPushSinkSpec extends SparkSpec {

  private def get(url: String): String = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(5000)
    try Source.fromInputStream(conn.getInputStream).mkString
    finally conn.disconnect()
  }

  test("push sink serves the latest top-20 as reference-shaped JSON") {
    val sink = new JsonPushSink()
    try {
      assert(get(s"http://127.0.0.1:${sink.boundPort}/top")
        == """{"timestamp":0,"data":[]}""")
      val rows = Relational.q3Batch(spark, sfDir)
        .selectExpr("l_orderkey", "to_date(o_orderdate) AS o_orderdate",
          "o_orderpriority", "revenue").collect()
      sink.push(rows, timestampMs = 777L)
      val body = get(s"http://127.0.0.1:${sink.boundPort}/top")
      assert(body.startsWith("""{"timestamp":777,"data":[{"rank":1,"""))
      assert(body.contains(""""orderkey":""") && body.contains(""""shippriority":"""))
      // well-formed JSON with exactly the emitted number of entries
      assert(body.split("\\{\"rank\":").length - 1 == rows.length)
      // built-in dashboard: served at /, wired to THIS sink's WS port,
      // and rendering both message types of the contract
      val html = get(s"http://127.0.0.1:${sink.boundPort}/")
      assert(html.contains(s":${sink.boundWsPort}'") && html.contains("/watch"))
      assert(html.contains("threads") && html.contains("rank"))
    } finally sink.stop()
  }

  test("RFC 6455 WebSocket transport broadcasts the same contract") {
    import java.net.http.{HttpClient, WebSocket}
    import java.util.concurrent.{CompletionStage, LinkedBlockingQueue, TimeUnit}

    val sink = new JsonPushSink()
    try {
      val msgs = new LinkedBlockingQueue[String]()
      val listener = new WebSocket.Listener {
        private val buf = new StringBuilder
        override def onText(ws: WebSocket, data: CharSequence,
                            last: Boolean): CompletionStage[_] = {
          buf.append(data)
          if (last) { msgs.add(buf.toString); buf.clear() }
          ws.request(1)
          null
        }
      }
      // the JDK's own client performs the strict §4.2.2 handshake — a
      // wrong Sec-WebSocket-Accept or malformed frame fails loudly here
      val ws = HttpClient.newHttpClient().newWebSocketBuilder()
        .buildAsync(java.net.URI.create(s"ws://127.0.0.1:${sink.boundWsPort}/"),
          listener)
        .get(5, TimeUnit.SECONDS)
      // connect replays the latest snapshot (short frame, 7-bit length)
      assert(msgs.poll(5, TimeUnit.SECONDS) == """{"timestamp":0,"data":[]}""")
      val rows = Relational.q3Batch(spark, sfDir)
        .selectExpr("l_orderkey", "to_date(o_orderdate) AS o_orderdate",
          "o_orderpriority", "revenue").collect()
      sink.push(rows, timestampMs = 888L) // top-20 payload >125B: 16-bit length
      val got = msgs.poll(5, TimeUnit.SECONDS)
      assert(got != null && got.startsWith("""{"timestamp":888,"data":[{"rank":1,"""))
      assert(got.split("\\{\"rank\":").length - 1 == rows.length)
      // thread-monitor broadcast: same channel, dashboard's expected shape
      // (simple_index.html:1086 branches on data.type === 'threads')
      spark.range(100).count() // ensure executor worker threads exist
      sink.pushThreads()
      val threads = msgs.poll(5, TimeUnit.SECONDS)
      assert(threads != null && threads.startsWith("""{"type":"threads","timestamp":""""))
      assert(threads.contains(""""name":"Executor task launch worker"""))
      assert(threads.contains(""""type":"important""""))
      assert(threads.contains(""""state":""") && threads.contains(""""cpuTime":"""))
      // clean close handshake: server must echo the close frame
      ws.sendClose(WebSocket.NORMAL_CLOSURE, "done").get(5, TimeUnit.SECONDS)
    } finally sink.stop()
  }
}
