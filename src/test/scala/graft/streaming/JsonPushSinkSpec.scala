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
    } finally sink.stop()
  }
}
