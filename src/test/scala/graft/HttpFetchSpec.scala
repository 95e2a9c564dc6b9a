package graft

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.time.Duration
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Fetchers, HttpTransport}

/** S4/S5 transport against an in-process HTTP fixture speaking the CDS
  * async protocol (submit → queued → running → completed → download) and
  * the ECMWF direct-download protocol. Mirrors the reference's client flow
  * (`ingestion/cds_client.py:33-79`, `ecmwf_client.py:25-52`) without
  * egress.
  */
class HttpFetchSpec extends AnyFunSuite {

  private def respond(x: HttpExchange, status: Int, body: Array[Byte]): Unit = {
    x.sendResponseHeaders(status, body.length)
    val os: OutputStream = x.getResponseBody
    os.write(body); os.close()
  }
  private def respond(x: HttpExchange, status: Int, body: String): Unit =
    respond(x, status, body.getBytes(StandardCharsets.UTF_8))

  private def withServer(f: (HttpServer, String, Path) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val dir = Files.createTempDirectory("graft-fetch")
    try {
      server.start()
      f(server, s"http://127.0.0.1:${server.getAddress.getPort}", dir)
    } finally {
      server.stop(0)
      dir.toFile.listFiles().foreach(_.delete())
      Files.deleteIfExists(dir)
    }
  }

  private val grib = "GRIB-synthetic-payload".getBytes(StandardCharsets.UTF_8)

  test("CDS transport: submit, poll through queued/running, then download") {
    withServer { (server, base, dir) =>
      val polls = new AtomicInteger(0)
      @volatile var submittedBody = ""
      server.createContext("/resources/cams", (x: HttpExchange) => {
        submittedBody = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        respond(x, 202, """{"state":"queued","location":"/status/r1"}""")
      })
      server.createContext("/status/r1", (x: HttpExchange) => {
        polls.incrementAndGet() match {
          case 1 => respond(x, 200, """{"state":"running"}""")
          case _ => respond(x, 200, """{"state":"completed","location":"/download/r1"}""")
        }
      })
      server.createContext("/download/r1", (x: HttpExchange) => respond(x, 200, grib))

      val target = dir.resolve("cams.grib").toString
      val req = Fetchers.CdsClient.buildRequest(
        java.sql.Date.valueOf("2024-06-01"), Seq("pm2p5", "pm10"), target, 48)
      val cfg = HttpTransport.Config(base, apiKey = Some("k3y"),
        pollInterval = Duration.ofMillis(1))
      val out = Fetchers.retrieveForecast(req,
        HttpTransport.cdsTransport(cfg, "/resources/cams"))

      assert(out === target)
      assert(Files.readAllBytes(Path.of(target)).toSeq === grib.toSeq)
      assert(polls.get() >= 2, "must poll through running to completed")
      assert(submittedBody.contains("\"particulate_matter_2.5um\""))
      assert(submittedBody.contains("\"leadtime_hour\":[\"0\","))
      assert(!Files.exists(Path.of(target + ".part")), "no staging residue")
    }
  }

  test("CDS transport: failed job raises with no target file") {
    withServer { (server, base, dir) =>
      server.createContext("/resources/cams", (x: HttpExchange) =>
        respond(x, 202, """{"state":"queued","location":"/status/r9"}"""))
      server.createContext("/status/r9", (x: HttpExchange) =>
        respond(x, 200, """{"state":"failed"}"""))
      val target = dir.resolve("cams.grib").toString
      val req = Fetchers.CdsClient.buildRequest(
        java.sql.Date.valueOf("2024-06-01"), Seq("pm2p5"), target, 24)
      val cfg = HttpTransport.Config(base, pollInterval = Duration.ofMillis(1))
      val e = intercept[java.io.IOException] {
        Fetchers.retrieveForecast(req, HttpTransport.cdsTransport(cfg, "/resources/cams"))
      }
      assert(e.getMessage.contains("failed"))
      assert(!Files.exists(Path.of(target)))
    }
  }

  test("CDS transport: poll deadline exceeded raises") {
    withServer { (server, base, dir) =>
      server.createContext("/resources/cams", (x: HttpExchange) =>
        respond(x, 202, """{"state":"queued","location":"/status/r2"}"""))
      server.createContext("/status/r2", (x: HttpExchange) =>
        respond(x, 200, """{"state":"queued"}"""))
      val req = Fetchers.CdsClient.buildRequest(
        java.sql.Date.valueOf("2024-06-01"), Seq("pm10"), dir.resolve("x.grib").toString, 12)
      val cfg = HttpTransport.Config(base,
        pollInterval = Duration.ofMillis(1), deadline = Duration.ofMillis(30))
      val e = intercept[java.io.IOException] {
        Fetchers.retrieveForecast(req, HttpTransport.cdsTransport(cfg, "/resources/cams"))
      }
      assert(e.getMessage.contains("deadline"))
    }
  }

  test("ECMWF transport: single GET carries the request params, atomic write") {
    withServer { (server, base, dir) =>
      @volatile var query = ""
      server.createContext("/data", (x: HttpExchange) => {
        query = x.getRequestURI.getRawQuery
        respond(x, 200, grib)
      })
      val target = dir.resolve("ecmwf.grib2").toString
      val req = Fetchers.EcmwfClient.buildRequest(
        java.sql.Date.valueOf("2024-06-01"), target, 12)
      Fetchers.retrieveForecast(req,
        HttpTransport.ecmwfTransport(HttpTransport.Config(base), "/data"))
      assert(Files.readAllBytes(Path.of(target)).toSeq === grib.toSeq)
      assert(query.contains("param=2t") && query.contains("param=2d"))
      assert(query.contains("step=0") && query.contains("step=12"))
      assert(!query.contains("step=15"), "steps beyond the horizon excluded")
      assert(query.contains("date=2024-06-01") && query.contains("type=fc"))
    }
  }

  test("ECMWF transport: non-200 raises and leaves no partial file") {
    withServer { (server, base, dir) =>
      server.createContext("/data", (x: HttpExchange) => respond(x, 503, "nope"))
      val target = dir.resolve("ecmwf.grib2").toString
      val req = Fetchers.EcmwfClient.buildRequest(
        java.sql.Date.valueOf("2024-06-01"), target, 12)
      intercept[java.io.IOException] {
        Fetchers.retrieveForecast(req,
          HttpTransport.ecmwfTransport(HttpTransport.Config(base), "/data"))
      }
      assert(!Files.exists(Path.of(target)) && !Files.exists(Path.of(target + ".part")))
    }
  }

  test("resolve keeps the base path for leading-slash locations") {
    val c = HttpTransport.Config("https://host.example/api")
    assert(HttpTransport.resolve(c, "/resources/x").toString ===
      "https://host.example/api/resources/x")
    assert(HttpTransport.resolve(c, "status/r1").toString ===
      "https://host.example/api/status/r1")
    assert(HttpTransport.resolve(c, "https://other.example/abs").toString ===
      "https://other.example/abs")
  }

  test("a stale longer .part from a crashed run never leaks tail bytes") {
    withServer { (server, base, dir) =>
      server.createContext("/data", (x: HttpExchange) => respond(x, 200, grib))
      val target = dir.resolve("stale.grib2").toString
      // simulate a crashed earlier attempt that left a LONGER partial file
      Files.write(Path.of(target + ".part"),
        Array.fill[Byte](grib.length * 3)('Z'.toByte))
      val req = Fetchers.EcmwfClient.buildRequest(
        java.sql.Date.valueOf("2024-06-01"), target, 12)
      Fetchers.retrieveForecast(req,
        HttpTransport.ecmwfTransport(HttpTransport.Config(base), "/data"))
      assert(Files.readAllBytes(Path.of(target)).toSeq === grib.toSeq,
        "stale bytes must be truncated away")
    }
  }

  test("JSON helpers: field extraction, params body, query string") {
    import HttpTransport.{jsonField, paramsJson, queryString}
    assert(jsonField("""{"state":"queued","location":"/s/1"}""", "state") === Some("queued"))
    assert(jsonField("""{"state":"queued"}""", "location") === None)
    val body = paramsJson(Map("b" -> Seq("x", "y"), "a" -> Seq("1")))
    assert(body === """{"a":"1","b":["x","y"]}""")
    assert(queryString(Map("q" -> Seq("a b"), "p" -> Seq("1"))) === "p=1&q=a+b")
  }
}
