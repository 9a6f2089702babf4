package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession

/** The reference's HTTP observability surface (internal/server/server.go:
  * 34-38): `GET /healthz` → component JSON (health.go:13-29), `GET
  * /metrics` → prometheus text exposition. Runs on the driver (as the
  * reference's server runs in the connector process), JDK http server —
  * no extra dependencies.
  *
  * Panic-recovery middleware parity (middleware.go:10-22): handler
  * exceptions return 500, never kill the server.
  */
final class HttpObservability(
    spark: SparkSession,
    listener: Observability.MetricsListener,
    addr: String = ":0") {

  private val (host, port) = addr.split(":") match {
    case Array("", p) => ("0.0.0.0", p.toInt)
    case Array(h, p) => (h, p.toInt)
    case _ => ("0.0.0.0", 0)
  }
  private val server =
    HttpServer.create(new InetSocketAddress(host, port), 0)

  private def handler(contentType: String)(body: () => String): HttpHandler =
    (exchange: HttpExchange) => {
      val (code, bytes) =
        try (200, body().getBytes(StandardCharsets.UTF_8))
        catch { // recoverer middleware: 500, not a crash
          case e: Throwable =>
            (500, s"""{"error":"${e.getClass.getSimpleName}"}"""
              .getBytes(StandardCharsets.UTF_8))
        }
      exchange.getResponseHeaders.add("Content-Type", contentType)
      exchange.sendResponseHeaders(code, bytes.length)
      val os = exchange.getResponseBody
      try os.write(bytes) finally os.close()
    }

  server.createContext("/healthz", handler("application/json") { () =>
    Observability.healthJson(Observability.healthCheck(spark))
  })
  server.createContext("/metrics", handler("text/plain; version=0.0.4") {
    () => listener.renderPrometheus()
  })
  server.setExecutor(null) // single-threaded, like the probe load profile

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = server.stop(0)
}
