package graft.sources

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.time.Duration

import graft.sources.Fetchers.{ForecastRequest, Transport}

/** S4/S5 — real HTTP transports for the forecast fetchers (reference:
  * `pipeline-python/src/pipeline_python/ingestion/cds_client.py:33-79`,
  * `ecmwf_client.py:25-52`).
  *
  * Driver-side clients (never executed on executors), built on the JDK's
  * `java.net.http.HttpClient` — no extra dependency. Two protocols:
  *
  *  - CDS/ADS (async): POST the request JSON → job is `queued`/`running` →
  *    poll the status URL until `completed` (or `failed`) → GET the result
  *    `location` → atomic move into `request.target`. Mirrors the
  *    reference's submit/poll/download loop.
  *  - ECMWF Open Data (sync): single GET with the request's params as the
  *    query string → body streamed to `request.target`.
  *
  * The tiny JSON field extraction is deliberate: the status documents are
  * flat `{"state": "...", "location": "..."}` shapes, and pulling one
  * string field does not warrant a JSON dependency (none is available
  * offline). HttpFetchSpec drives both transports against an in-process
  * `com.sun.net.httpserver` fixture speaking the same protocol.
  */
object HttpTransport {

  final case class Config(
      baseUrl: String,
      apiKey: Option[String] = None,
      pollInterval: Duration = Duration.ofSeconds(1),
      deadline: Duration = Duration.ofMinutes(10),
      requestTimeout: Duration = Duration.ofSeconds(30))

  private def client(): HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  /** Extract a flat string field from a JSON document. Supports exactly the
    * `"field": "value"` shape of the status documents (escapes in values are
    * not interpreted — states and URLs never contain them).
    */
  private[graft] def jsonField(doc: String, field: String): Option[String] = {
    val m = java.util.regex.Pattern
      .compile("\"" + java.util.regex.Pattern.quote(field) + "\"\\s*:\\s*\"([^\"]*)\"")
      .matcher(doc)
    if (m.find()) Some(m.group(1)) else None
  }

  /** Render the request's `params` map as a JSON object (string values and
    * string arrays — the CDS request body shape).
    */
  private[graft] def paramsJson(params: Map[String, Seq[String]]): String =
    params.toSeq.sortBy(_._1).map { case (k, vs) =>
      val arr = vs.map(v => "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      "\"" + k + "\":" + (if (vs.lengthCompare(1) == 0) arr.head
                          else arr.mkString("[", ",", "]"))
    }.mkString("{", ",", "}")

  private[graft] def queryString(params: Map[String, Seq[String]]): String =
    params.toSeq.sortBy(_._1).flatMap { case (k, vs) =>
      vs.map(v => URLEncoder.encode(k, "UTF-8") + "=" + URLEncoder.encode(v, "UTF-8"))
    }.mkString("&")

  private def authHeaders(c: Config): Seq[String] =
    c.apiKey.toSeq.flatMap(k => Seq("Authorization", s"Bearer $k"))

  private def withHeaders(b: HttpRequest.Builder, c: Config): HttpRequest.Builder = {
    val hs = authHeaders(c)
    if (hs.isEmpty) b else b.headers(hs: _*)
  }

  /** Resolve a location against the base URL by PATH CONCATENATION (not
    * `URI.resolve`, which drops the base's path for leading-slash
    * locations — a base of `…/api` plus `/resources/x` must hit
    * `…/api/resources/x`, not the server root). Absolute URLs returned by
    * the server pass through untouched.
    */
  private[graft] def resolve(c: Config, location: String): URI = {
    val base = c.baseUrl.stripSuffix("/")
    if (location.matches("^[a-zA-Z][a-zA-Z0-9+.-]*://.*")) URI.create(location)
    else if (location.startsWith("//")) // protocol-relative: keep base scheme
      URI.create(URI.create(base).getScheme + ":" + location)
    else if (location.startsWith("/")) URI.create(base + location)
    else URI.create(base + "/" + location)
  }

  private def download(c: Config, http: HttpClient, from: URI, target: String): Unit = {
    val tmp = Paths.get(target + ".part")
    Files.createDirectories(tmp.toAbsolutePath.getParent)
    val rsp = http.send(
      withHeaders(HttpRequest.newBuilder(from), c).timeout(c.requestTimeout).GET().build(),
      // TRUNCATE_EXISTING: a stale longer .part from a crashed previous
      // attempt must not leave its tail bytes under a shorter re-download
      HttpResponse.BodyHandlers.ofFile(tmp,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING))
    if (rsp.statusCode() != 200) {
      Files.deleteIfExists(tmp)
      throw new java.io.IOException(s"download $from failed: HTTP ${rsp.statusCode()}")
    }
    // atomic move: a half-written target is never observable (T5 discipline)
    Files.move(tmp, Paths.get(target), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** CDS/ADS async transport: submit → poll → download. `submitPath` is the
    * dataset resource path (e.g. `/resources/cams-europe-air-quality-forecasts`).
    */
  def cdsTransport(c: Config, submitPath: String,
      sleep: Duration => Unit = d => Thread.sleep(d.toMillis)): Transport = {
    req: ForecastRequest =>
      val http = client()
      val submit = http.send(
        withHeaders(HttpRequest.newBuilder(resolve(c, submitPath)), c)
          .timeout(c.requestTimeout)
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(paramsJson(req.params),
            StandardCharsets.UTF_8))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      if (submit.statusCode() / 100 != 2)
        throw new java.io.IOException(
          s"submit failed: HTTP ${submit.statusCode()}: ${submit.body().take(200)}")
      val statusUrl = jsonField(submit.body(), "location").getOrElse(
        throw new java.io.IOException(s"submit response has no location: ${submit.body().take(200)}"))

      val deadlineNanos = System.nanoTime() + c.deadline.toNanos
      var state = jsonField(submit.body(), "state").getOrElse("queued")
      var location: Option[String] = None
      while (location.isEmpty) {
        state match {
          case "completed" =>
            // status doc carries the download location once completed
            val status = http.send(
              withHeaders(HttpRequest.newBuilder(resolve(c, statusUrl)), c)
                .timeout(c.requestTimeout).GET().build(),
              HttpResponse.BodyHandlers.ofString())
            location = Some(jsonField(status.body(), "location").getOrElse(
              throw new java.io.IOException(s"completed without location: ${status.body().take(200)}")))
          case "failed" =>
            throw new java.io.IOException(s"remote job failed: $statusUrl")
          case _ => // queued | running
            if (System.nanoTime() > deadlineNanos)
              throw new java.io.IOException(
                s"poll deadline (${c.deadline.toSeconds}s) exceeded in state '$state'")
            sleep(c.pollInterval)
            val status = http.send(
              withHeaders(HttpRequest.newBuilder(resolve(c, statusUrl)), c)
                .timeout(c.requestTimeout).GET().build(),
              HttpResponse.BodyHandlers.ofString())
            if (status.statusCode() != 200)
              throw new java.io.IOException(s"status poll failed: HTTP ${status.statusCode()}")
            state = jsonField(status.body(), "state").getOrElse("queued")
            if (state == "completed")
              location = jsonField(status.body(), "location")
        }
      }
      download(c, http, resolve(c, location.get), req.target)
  }

  /** ECMWF Open Data direct transport: one GET, params as the query string. */
  def ecmwfTransport(c: Config, dataPath: String): Transport = {
    req: ForecastRequest =>
      val uri = resolve(c, dataPath + "?" + queryString(req.params))
      download(c, client(), uri, req.target)
  }
}
