package graft.serve

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.time.format.DateTimeFormatter

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.model.VariableResult
import graft.serve.RequestValidation.EnvironmentalRequest

/** Thin HTTP route over [[Service]] — closes the §3.1 serving lifecycle
  * end-to-end (reference: `serving-go/internal/api/handler.go:26-84`,
  * `response.go:15-42`):
  *
  *   - `GET /health` → 204
  *   - `GET /v1/environmental?lat=&lon=&timestamp=&variables=` →
  *     400 invalid request / 404 any-variable-missing / 504 budget expired /
  *     500 other / 200 with the reference's snake_case JSON shape.
  *
  * Built on the JDK's `com.sun.net.httpserver` (no added dependencies); the
  * JSON response is assembled with explicit escaping — the payload is a
  * handful of scalar fields, not a document.
  */
final class HttpFront(service: Service, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/health", (x: HttpExchange) => handleHealth(x))
  server.createContext("/v1/environmental", (x: HttpExchange) => handleEnvironmental(x))
  // a pool, NOT the dispatch thread — and query concurrency bounded BELOW
  // the pool size by a semaphore, so even with every query slot busy there
  // is always a free thread for /health (liveness probes must never queue
  // behind Spark work); saturated query slots answer 503 immediately
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
  private val queryPermits = new java.util.concurrent.Semaphore(4)
  server.setExecutor(pool)

  /** Starts the server; returns the bound port (useful with port=0). */
  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = { server.stop(0); pool.shutdown() }

  private def handleHealth(x: HttpExchange): Unit =
    try {
      if (x.getRequestMethod != "GET") respond(x, 405, error("method not allowed"))
      else { x.sendResponseHeaders(204, -1); x.close() }
    } catch {
      // close the exchange on any failure, but let VM-fatal errors
      // (OOM, internal error) keep propagating past the handler
      case t: Throwable =>
        x.close()
        if (!scala.util.control.NonFatal(t)) throw t
    }

  private def handleEnvironmental(x: HttpExchange): Unit =
    try {
      if (x.getRequestMethod != "GET") { respond(x, 405, error("method not allowed")); return }
      if (!queryPermits.tryAcquire()) { respond(x, 503, error("server busy")); return }
      try handleEnvironmentalInner(x) finally queryPermits.release()
    } catch {
      // single catch-all for the whole request; best-effort 500 — if the
      // failure WAS the response write (client gone mid-body), a second
      // respond would itself throw, so just close
      case t: Throwable =>
        try respond(x, 500, error("internal server error"))
        catch { case scala.util.control.NonFatal(_) => x.close() }
        if (!scala.util.control.NonFatal(t)) throw t
    }

  private def handleEnvironmentalInner(x: HttpExchange): Unit = {
    // malformed percent-encoding is a CLIENT error (400), not a 500
    val q =
      try queryParams(x)
      catch {
        case _: IllegalArgumentException =>
          respond(x, 400, error("malformed query string")); return
      }
    RequestValidation.parse(
      q.getOrElse("lat", ""), q.getOrElse("lon", ""),
      q.getOrElse("timestamp", ""), q.getOrElse("variables", "")) match {
      case Left(msg) => respond(x, 400, error(msg))
      case Right(req) =>
        service.getVariables(req) match {
          case Right(results)                    => respond(x, 200, body(req, results))
          case Left(e: ServeError.Missing)       => respond(x, 404, error(e.message))
          case Left(e: ServeError.Timeout)       => respond(x, 504, error("query timed out"))
          case Left(e: ServeError.Failure)       => respond(x, 500, error("internal server error"))
        }
    }
  }

  private def queryParams(x: HttpExchange): Map[String, String] =
    Option(x.getRequestURI.getRawQuery).getOrElse("").split("&").toSeq
      .filter(_.nonEmpty).flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(decode(k) -> decode(v))
          case Array(k)    => Some(decode(k) -> "")
          case _           => None
        }
      }.toMap

  private def decode(s: String): String =
    java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)

  // ── JSON assembly (reference shape: response.go:15-42) ────────────────────

  private def esc(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '"'           => b.append("\\\"")
      case '\\'          => b.append("\\\\")
      case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
      case c             => b.append(c)
    }
    b.toString
  }

  private def jstr(s: String): String = "\"" + esc(s) + "\""

  private val rfc3339 = DateTimeFormatter.ISO_INSTANT

  private def jts(t: java.sql.Timestamp): String = jstr(rfc3339.format(t.toInstant))

  private def error(msg: String): String = s"""{"error":${jstr(msg)}}"""

  /** JSON number: bare NaN/Infinity are invalid JSON (every parser rejects
    * the whole 200 payload), so non-finite values serialize as null —
    * missing data stays representable without breaking the envelope.
    */
  private def jnum(v: Double): String =
    if (java.lang.Double.isFinite(v)) v.toString else "null"

  /** Float overload: widening to Double would change the decimal rendering
    * (13.4f prints 13.399999618530273 as a Double).
    */
  private def jnum(v: Float): String =
    if (java.lang.Float.isFinite(v)) v.toString else "null"

  private def body(req: EnvironmentalRequest, results: Seq[VariableResult]): String = {
    val vars = results.map { r =>
      val lineage = r.lineage match {
        case Some(l) =>
          s""","lineage":{"source":${jstr(l.source)},"dataset":${jstr(l.dataset)},"raw_file_id":${jstr(l.rawFileId)}}"""
        case None => ""
      }
      s"""{"name":${jstr(r.name)},"value":${jnum(r.value)},"unit":${jstr(r.unit)},""" +
        s""""ref_timestamp":${jts(r.refTimestamp)},"actual_lat":${jnum(r.actualLat)},""" +
        s""""actual_lon":${jnum(r.actualLon)}$lineage}"""
    }.mkString("[", ",", "]")
    s"""{"lat":${jnum(req.lat)},"lon":${jnum(req.lon)},""" +
      s""""requested_timestamp":${jstr(rfc3339.format(req.timestamp))},"variables":$vars}"""
  }

  private def respond(x: HttpExchange, status: Int, json: String): Unit = {
    val bytes = json.getBytes(StandardCharsets.UTF_8)
    x.getResponseHeaders.set("Content-Type", "application/json")
    x.sendResponseHeaders(status, bytes.length)
    val os = x.getResponseBody
    try os.write(bytes) finally os.close()
    x.close()
  }
}
