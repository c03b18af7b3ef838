package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicReference

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.Row

/** Live results push sink — the Spark stand-in for the reference's
  * hand-rolled NIO WebSocket server (TPCHQuery3_StreamProcessor.java:
  * 584–974: RFC 6455 handshake, frame encoding, broadcast loop, all
  * bespoke). Transport is presentation, not query semantics (SURVEY §2.2);
  * three transports share one message contract:
  *
  *  - `GET /top`   → latest top-N message, the reference's exact JSON
  *    contract `{"timestamp":…,"data":[{"rank","orderkey","revenue",
  *    "orderdate","shippriority"}]}` (StreamProcessor.java:1037–1052);
  *  - `GET /watch` → server-sent-events stream of the same messages (the
  *    push channel a dashboard subscribes to);
  *  - `ws://…:wsPort` → RFC 6455 WebSocket broadcast of the same messages
  *    (handshake per StreamProcessor.java:663–691, text frames per
  *    :954–973), so the reference's own dashboard — which opens
  *    `new WebSocket('ws://localhost:8080')`, simple_index.html:1068 —
  *    connects unmodified when `wsPort = 8080`.
  *
  * Wire into the query as `onEmit = sink.onEmit` on [[StreamingQ3.start]].
  */
final class JsonPushSink(port: Int = 0, wsPort: Int = 0) {

  private val latest = new AtomicReference[String]("""{"timestamp":0,"data":[]}""")
  private val listeners =
    java.util.concurrent.ConcurrentHashMap.newKeySet[HttpExchange]()

  // SSE fan-out runs on its own daemon thread: a subscriber that stops
  // reading (full TCP send buffer, no RST) blocks its write() forever, and
  // that must never stall the streaming query's foreachBatch thread.
  // Declared before `server` so it exists by the time a handler can run.
  private val pusher = java.util.concurrent.Executors.newSingleThreadExecutor(
    (r: Runnable) => { val t = new Thread(r, "graft-sse-push"); t.setDaemon(true); t })

  private val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    // minimal built-in live view (the reference ships a 1,249-line
    // Chart.js/D3 dashboard, simple_index.html — presentation-layer; this
    // hand-written page renders the same two message types as a plain
    // table + thread grid over the same WebSocket, falling back to SSE)
    s.createContext("/", (ex: HttpExchange) => {
      // "/" is the JDK server's catch-all context: answer only the root
      // path itself and 404 the rest, or every typo'd endpoint would get
      // a 200 with an HTML body
      if (ex.getRequestURI.getPath != "/") {
        ex.sendResponseHeaders(404, -1)
        ex.close()
      } else {
        val body = JsonPushSink.dashboardHtml(boundWsPort)
          .getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", "text/html; charset=utf-8")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      }
    })
    s.createContext("/top", (ex: HttpExchange) => {
      val body = latest.get().getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    s.createContext("/watch", (ex: HttpExchange) => {
      ex.getResponseHeaders.add("Content-Type", "text/event-stream")
      ex.sendResponseHeaders(200, 0)
      // register BEFORE the initial snapshot: a push landing in between
      // would otherwise miss this subscriber, leaving it permanently stale
      // if that push was the stream's last. The snapshot itself is written
      // on the pusher thread so all writes to one exchange are serialized
      // (a concurrent push() could otherwise interleave bytes mid-write).
      listeners.add(ex)
      pusher.submit(new Runnable {
        override def run(): Unit =
          try { ex.getResponseBody.write(sse(latest.get())); ex.getResponseBody.flush() }
          catch { case _: java.io.IOException => listeners.remove(ex); ex.close() }
      })
    })
    s.start()
    s
  }

  private def sse(msg: String): Array[Byte] =
    s"data: $msg\n\n".getBytes(StandardCharsets.UTF_8)

  // ------------------------- WebSocket transport ----------------------
  // Blocking-IO per connection (one daemon reader thread each) is the
  // right size here: subscriber counts are dashboard-scale, not C10K —
  // the reference's NIO selector loop (StreamProcessor.java:596–650)
  // solves a problem this sink does not have. ALL writes to a socket go
  // through the single-threaded `pusher`, so handshake snapshot,
  // broadcasts, pongs, and close echoes never interleave mid-frame.

  private val wsClients =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.net.Socket]()

  private val wsServer = {
    val s = new java.net.ServerSocket()
    s.bind(new InetSocketAddress("127.0.0.1", wsPort))
    s
  }

  private def daemon(name: String)(body: => Unit): Unit = {
    val t = new Thread(() => body, name); t.setDaemon(true); t.start()
  }

  daemon("graft-ws-accept") {
    try while (true) {
      val sock = wsServer.accept()
      daemon(s"graft-ws-${sock.getPort}")(serveWs(sock))
    } catch { case _: java.io.IOException => () } // server closed
  }

  /** RFC 6455 text frame, server→client (unmasked): FIN|0x1 opcode, then
    * 7/16/64-bit length (StreamProcessor.java:954–973 is the same layout).
    */
  private def wsFrame(payload: Array[Byte], opcode: Int = 0x1): Array[Byte] = {
    val n = payload.length
    val header =
      if (n <= 125) Array((0x80 | opcode).toByte, n.toByte)
      else if (n <= 0xFFFF)
        Array((0x80 | opcode).toByte, 126.toByte, (n >> 8).toByte, n.toByte)
      else Array((0x80 | opcode).toByte, 127.toByte) ++
        (7 to 0 by -1).map(i => (n.toLong >> (8 * i)).toByte)
    header ++ payload
  }

  private def wsWrite(sock: java.net.Socket, bytes: Array[Byte]): Unit =
    pusher.submit(new Runnable {
      override def run(): Unit =
        try { sock.getOutputStream.write(bytes); sock.getOutputStream.flush() }
        catch { case _: java.io.IOException => wsClients.remove(sock); sock.close() }
    })

  /** Handshake (Sec-WebSocket-Accept = base64(sha1(key + magic)), RFC 6455
    * §4.2.2; StreamProcessor.java:663–691), then consume client frames —
    * ping→pong, close→close-echo — until EOF. Broadcast happens in push().
    */
  private def serveWs(sock: java.net.Socket): Unit = try {
    val in = new java.io.BufferedInputStream(sock.getInputStream)
    val req = new java.io.ByteArrayOutputStream()
    var headersDone = false
    while (!headersDone) {
      val b = in.read()
      if (b == -1) { sock.close(); return }
      req.write(b)
      val a = req.toByteArray
      headersDone = a.length >= 4 && a(a.length - 4) == '\r' &&
        a(a.length - 3) == '\n' && a(a.length - 2) == '\r' &&
        a(a.length - 1) == '\n'
    }
    val keyOpt = req.toString(StandardCharsets.UTF_8).split("\r\n")
      .collectFirst { case l if l.toLowerCase.startsWith("sec-websocket-key:") =>
        l.substring(l.indexOf(':') + 1).trim }
    if (keyOpt.isEmpty) { sock.close(); return }
    val key = keyOpt.get
    val accept = java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-1").digest(
        (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11")
          .getBytes(StandardCharsets.UTF_8)))
    sock.getOutputStream.write(
      ("HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
        s"Connection: Upgrade\r\nSec-WebSocket-Accept: $accept\r\n\r\n")
        .getBytes(StandardCharsets.UTF_8))
    sock.getOutputStream.flush()
    // add BEFORE the snapshot send, same no-missed-push order as /watch
    wsClients.add(sock)
    wsWrite(sock, wsFrame(latest.get().getBytes(StandardCharsets.UTF_8)))
    while (true) {
      val b0 = in.read()
      if (b0 == -1) { wsClients.remove(sock); sock.close(); return }
      val b1 = in.read()
      var len = b1 & 0x7F
      if (len == 126) len = (in.read() << 8) | in.read()
      else if (len == 127) { // client frames this size don't happen here,
        len = 0              // but drain the 8-byte length correctly
        for (_ <- 0 until 8) len = (len << 8) | in.read()
      }
      val masked = (b1 & 0x80) != 0
      if (masked) for (_ <- 0 until 4) in.read()
      for (_ <- 0 until len) in.read() // payload (mask key unused: dropped)
      (b0 & 0x0F) match {
        case 0x8 => // close: echo and drop (RFC 6455 §5.5.1)
          wsClients.remove(sock)
          wsWrite(sock, wsFrame(Array.emptyByteArray, opcode = 0x8))
          pusher.submit(new Runnable { override def run(): Unit = sock.close() })
          return
        case 0x9 => wsWrite(sock, wsFrame(Array.emptyByteArray, opcode = 0xA))
        case _   => () // text/binary/pong from client: ignored
      }
    }
  } catch { case _: java.io.IOException => wsClients.remove(sock); sock.close() }

  /** The bound port (useful with port=0 for tests). */
  def boundPort: Int = server.getAddress.getPort

  /** The bound WebSocket port (the reference dashboard expects 8080). */
  def boundWsPort: Int = wsServer.getLocalPort

  /** Publish a new top-N snapshot to /top, /watch, and WebSocket clients. */
  def push(rows: Array[Row], timestampMs: Long = System.currentTimeMillis()): Unit = {
    val msg = StreamingQ3.jsonMessage(rows, timestampMs)
    latest.set(msg) // /top serves the latest TOP-N only, as the reference does
    broadcast(msg)
  }

  /** Broadcast the engine-thread monitor message (the reference pairs one
    * with each top-N update, StreamProcessor.java:806–810).
    */
  def pushThreads(): Unit = broadcast(JsonPushSink.threadsMessage())

  private def broadcast(msg: String): Unit = {
    pusher.submit(new Runnable {
      override def run(): Unit = listeners.forEach { ex =>
        try { ex.getResponseBody.write(sse(msg)); ex.getResponseBody.flush() }
        catch { case _: java.io.IOException => listeners.remove(ex); ex.close() }
      }
    })
    val frame = wsFrame(msg.getBytes(StandardCharsets.UTF_8))
    wsClients.forEach(sock => wsWrite(sock, frame))
  }

  /** Adapter for [[StreamingQ3.start]]'s onEmit. */
  def onEmit: (Array[Row], Long) => Unit = (rows, _) => { push(rows); pushThreads() }

  def stop(): Unit = {
    listeners.forEach(ex => try ex.close() catch { case _: Throwable => })
    server.stop(0)
    try wsServer.close() catch { case _: Throwable => }
    wsClients.forEach(s => try s.close() catch { case _: Throwable => })
  }
}

object JsonPushSink {

  /** The reference's thread-monitor message
    * (StreamProcessor.java:813–869): `{"type":"threads","timestamp":"…",
    * "data":[{id,name,state,priority,cpuTime,type}]}`, rendered by the
    * dashboard's thread grid (simple_index.html:1086, 1180–1210). The
    * reference enumerates its Flink operator threads; the local-mode Spark
    * analogue is the executor task-launch workers plus the streaming
    * micro-batch machinery (on a real cluster this panel would read
    * `SparkStatusTracker` instead — executors are processes, not threads).
    */
  /** Built-in live view: top-20 table + engine-thread grid, consuming the
    * exact message contract (`{timestamp,data:[…]}` and
    * `{type:"threads",…}`). WebSocket first, SSE `/watch` fallback.
    */
  def dashboardHtml(wsPort: Int): String =
    s"""<!doctype html><html><head><meta charset="utf-8"><title>graft live top-20</title>
      |<style>
      | body{font-family:monospace;margin:2em;background:#111;color:#ddd}
      | table{border-collapse:collapse;margin-top:1em}
      | td,th{border:1px solid #444;padding:2px 10px;text-align:right}
      | th{background:#222} td:first-child,th:first-child{text-align:center}
      | #threads span{display:inline-block;margin:2px;padding:2px 6px;border:1px solid #333}
      | .important{color:#7c7} .state{color:#888}
      |</style></head><body>
      |<h3>graft - live TPC-H Q3 top-20 <small id="ts"></small></h3>
      |<table id="top"><thead><tr><th>rank</th><th>orderkey</th><th>revenue</th>
      |<th>orderdate</th><th>shippriority</th></tr></thead><tbody></tbody></table>
      |<h4>engine threads</h4><div id="threads"></div>
      |<script>
      |function render(m){
      | if(m.type==='threads'){
      |  document.getElementById('threads').innerHTML=m.data.map(function(t){
      |   return '<span class="'+t.type+'">'+t.name+' <span class="state">'+t.state+
      |          ' cpu '+t.cpuTime+'ms</span></span>';}).join('');
      |  return;}
      | document.getElementById('ts').textContent=new Date(m.timestamp).toISOString();
      | document.querySelector('#top tbody').innerHTML=m.data.map(function(r){
      |  return '<tr><td>'+r.rank+'</td><td>'+r.orderkey+'</td><td>'+r.revenue.toFixed(2)+
      |         '</td><td>'+r.orderdate+'</td><td>'+r.shippriority+'</td></tr>';}).join('');
      |}
      |function sse(){var es=new EventSource('/watch');
      | es.onmessage=function(e){render(JSON.parse(e.data));};}
      |try{var ws=new WebSocket('ws://'+location.hostname+':$wsPort');
      | ws.onmessage=function(e){render(JSON.parse(e.data));};
      | ws.onerror=sse;}catch(e){sse();}
      |</script></body></html>""".stripMargin

  def threadsMessage(now: java.util.Date = new java.util.Date()): String = {
    val bean = java.lang.management.ManagementFactory.getThreadMXBean
    var g = Thread.currentThread().getThreadGroup
    while (g.getParent != null) g = g.getParent
    val arr = new Array[Thread](g.activeCount() + 50)
    val n = g.enumerate(arr, true)
    val engine = arr.take(n).filter(_ != null).filter { t =>
      val nm = t.getName
      nm.contains("Executor task launch worker") ||
        nm.contains("stream execution thread") || nm.startsWith("graft-") ||
        nm.contains("shuffle-") || nm == "main"
    }
    val data = engine.sortBy(_.getId).map { t =>
      val cpuMs =
        try if (bean.isThreadCpuTimeSupported) bean.getThreadCpuTime(t.getId) / 1000000
        else 0L
        catch { case _: Throwable => 0L }
      val kind =
        if (t.getName.contains("Executor task launch worker") ||
          t.getName.contains("stream execution thread")) "important"
        else "normal"
      s"""{"id":${t.getId},"name":"${t.getName.replace("\"", "\\\"")}",""" +
        s""""state":"${t.getState}","priority":${t.getPriority},""" +
        s""""cpuTime":$cpuMs,"type":"$kind"}"""
    }.mkString(",")
    s"""{"type":"threads","timestamp":"$now","data":[$data]}"""
  }
}
