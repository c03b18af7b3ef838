package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicReference

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.Row

/** Live results push sink — the Spark stand-in for the reference's
  * hand-rolled NIO WebSocket server (TPCHQuery3_StreamProcessor.java:
  * 584–974: RFC 6455 handshake, frame encoding, broadcast loop, all
  * bespoke). Transport is presentation, not query semantics (SURVEY §2.2),
  * so this engine keeps it to ~60 lines of JDK `HttpServer`:
  *
  *  - `GET /top`   → latest top-N message, the reference's exact JSON
  *    contract `{"timestamp":…,"data":[{"rank","orderkey","revenue",
  *    "orderdate","shippriority"}]}` (StreamProcessor.java:1037–1052);
  *  - `GET /watch` → server-sent-events stream of the same messages (the
  *    push channel a dashboard subscribes to).
  *
  * Wire into the query as `onEmit = sink.onEmit` on [[StreamingQ3.start]].
  */
final class JsonPushSink(port: Int = 0) {

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

  /** The bound port (useful with port=0 for tests). */
  def boundPort: Int = server.getAddress.getPort

  /** Publish a new top-N snapshot to /top and all /watch subscribers. */
  def push(rows: Array[Row], timestampMs: Long = System.currentTimeMillis()): Unit = {
    val msg = StreamingQ3.jsonMessage(rows, timestampMs)
    latest.set(msg)
    pusher.submit(new Runnable {
      override def run(): Unit = listeners.forEach { ex =>
        try { ex.getResponseBody.write(sse(msg)); ex.getResponseBody.flush() }
        catch { case _: java.io.IOException => listeners.remove(ex); ex.close() }
      }
    })
  }

  /** Adapter for [[StreamingQ3.start]]'s onEmit. */
  def onEmit: (Array[Row], Long) => Unit = (rows, _) => push(rows)

  def stop(): Unit = {
    listeners.forEach(ex => try ex.close() catch { case _: Throwable => })
    server.stop(0)
  }
}
