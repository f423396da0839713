package graft.ops

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

/** A served `/health` endpoint with the reference's contract
  * (reference: mcp_clickhouse/mcp_server.py:74-103): HTTP 200
  * `OK - Connected to Spark <version>` when the engine is enabled and
  * can run a trivial query, HTTP 503 `ERROR - ...` when it is disabled
  * or the probe fails. Plain text either way, like the reference's
  * `PlainTextResponse`.
  *
  * Uses the JDK's built-in HTTP server — no extra dependency — on a
  * single background thread; the probe itself is [[Health.check]].
  */
final class HealthServer private (server: HttpServer) extends AutoCloseable {

  /** Bound port (useful when started on an ephemeral port 0). */
  def port: Int = server.getAddress.getPort

  override def close(): Unit = server.stop(0)
}

object HealthServer {

  def start(spark: SparkSession, config: GraftConfig = GraftConfig()): HealthServer = {
    val server = HttpServer.create(new InetSocketAddress(config.healthPort), 0)
    server.createContext("/health", (exchange: HttpExchange) => {
      val (code, body) =
        if (!config.enabled)
          (503, "ERROR - Engine is disabled (SPARK_GRAFT_ENABLED=false)")
        else {
          val st = Health.check(spark)
          (if (st.ok) 200 else 503, st.message)
        }
      val bytes = body.getBytes(UTF_8)
      exchange.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
      exchange.sendResponseHeaders(code, bytes.length.toLong)
      val os = exchange.getResponseBody
      try os.write(bytes)
      finally os.close()
    })
    server.setExecutor(null) // serve on the dispatcher thread; probe is cheap
    server.start()
    new HealthServer(server)
  }
}
