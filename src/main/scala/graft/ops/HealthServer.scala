package graft.ops

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

/** The served surface of the engine, with the reference's contracts:
  *
  *  - `/health` (reference: mcp_clickhouse/mcp_server.py:74-103) —
  *    HTTP 200 `OK - Connected to Spark <version>` when the engine is
  *    enabled and can run a trivial query, 503 `ERROR - ...` otherwise;
  *    plain text like the reference's `PlainTextResponse`.
  *  - `/query` (the `run_select_query` tool, mcp_server.py:421-459) —
  *    when started with a [[graft.sql.QueryExecutor]]: the SQL comes
  *    from the POST body (or `?q=` on GET), runs through the read-only
  *    guard / timeout / row cap, and returns the reference's
  *    `{columns, rows}` JSON on 200 or `{"status": "error",
  *    "message": ...}` on 400 — guard violations and analysis errors
  *    are responses, never crashes.
  *
  * Uses the JDK's built-in HTTP server — no extra dependency. Query
  * concurrency is bounded by the executor's own pool, not the HTTP
  * layer.
  */
final class HealthServer private (server: HttpServer) extends AutoCloseable {

  /** Bound port (useful when started on an ephemeral port 0). */
  def port: Int = server.getAddress.getPort

  override def close(): Unit = server.stop(0)
}

object HealthServer {

  def start(
      spark: SparkSession,
      config: GraftConfig = GraftConfig(),
      executor: Option[graft.sql.QueryExecutor] = None): HealthServer = {
    val server = HttpServer.create(new InetSocketAddress(config.healthPort), 0)

    def respond(exchange: HttpExchange, code: Int, body: String, json: Boolean): Unit = {
      val bytes = body.getBytes(UTF_8)
      exchange.getResponseHeaders.set("Content-Type",
        if (json) "application/json; charset=utf-8" else "text/plain; charset=utf-8")
      exchange.sendResponseHeaders(code, bytes.length.toLong)
      val os = exchange.getResponseBody
      try os.write(bytes)
      finally os.close()
    }

    server.createContext("/health", (exchange: HttpExchange) => {
      val (code, body) =
        if (!config.enabled)
          (503, "ERROR - Engine is disabled (SPARK_GRAFT_ENABLED=false)")
        else {
          val st = Health.check(spark)
          (if (st.ok) 200 else 503, st.message)
        }
      respond(exchange, code, body, json = false)
    })

    executor.foreach { exec =>
      server.createContext("/query", (exchange: HttpExchange) => {
        val sql =
          if (exchange.getRequestMethod == "POST")
            new String(exchange.getRequestBody.readAllBytes(), UTF_8)
          else // GET ?q=<urlencoded sql>
            Option(exchange.getRequestURI.getRawQuery).getOrElse("")
              .split('&').collectFirst {
                case p if p.startsWith("q=") =>
                  java.net.URLDecoder.decode(p.drop(2), UTF_8)
              }.getOrElse("")
        if (sql.trim.isEmpty)
          respond(exchange, 400,
            """{"status": "error", "message": "empty query"}""", json = true)
        else exec.runSafe(sql) match {
          case Right(result) => respond(exchange, 200, result.toJson, json = true)
          case Left(message) =>
            val escaped = message.replace("\\", "\\\\").replace("\"", "\\\"")
              .replace("\n", "\\n")
            respond(exchange, 400,
              s"""{"status": "error", "message": "$escaped"}""", json = true)
        }
      })
    }

    server.setExecutor(null) // dispatcher thread; query pool bounds real work
    server.start()
    new HealthServer(server)
  }
}
