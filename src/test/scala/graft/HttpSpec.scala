package graft

import java.net.{HttpURLConnection, URI}
import java.sql.Timestamp
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.serve.{HttpFront, Service}

/** HTTP serving lifecycle end-to-end — mirrors the reference's
  * `serving-go/internal/api/handler_integration_test.go:52-266` status and
  * shape cases (200 single/multi variable + lineage, 400 invalid request,
  * 404 any-variable-missing, health 204) against a live local server.
  */
class HttpSpec extends SparkSpec {
  import spark.implicits._

  private val t12 = Timestamp.valueOf("2026-01-01 12:00:00")

  private def grid = Seq(
    ("pm2p5", t12, 52.5f, 13.4f, 12.5, "µg/m³", "cat-p"),
    ("temperature", t12, 52.5f, 13.4f, 21.5, "°C", "cat-t")
  ).toDF("variable", "timestamp", "lat", "lon", "value", "unit", "catalogId")

  private def withServer[T](f: Int => T): T = {
    val curated = Seq(("cat-p", "raw-1"), ("cat-t", "raw-2")).toDF("id", "rawFileId")
    val rawFiles = Seq(
      ("raw-1", "ads", "cams-europe-air-quality-forecast"),
      ("raw-2", "ecmwf", "ifs-weather-forecast")).toDF("id", "source", "dataset")
    val front = new HttpFront(new Service(grid, curated, rawFiles))
    val port = front.start()
    try f(port) finally front.stop()
  }

  private def get(port: Int, pathAndQuery: String): (Int, String) = {
    val conn = URI.create(s"http://127.0.0.1:$port$pathAndQuery").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    val status = conn.getResponseCode
    val is = if (status >= 400) conn.getErrorStream else conn.getInputStream
    val body = if (is == null) "" else {
      try new String(is.readAllBytes(), StandardCharsets.UTF_8) finally is.close()
    }
    (status, body)
  }

  test("GET /health → 204, empty body") {
    withServer { port =>
      val (status, body) = get(port, "/health")
      assert(status === 204 && body === "")
    }
  }

  test("200 single variable: value, unit, actual coords, ref ts, lineage") {
    withServer { port =>
      val (status, body) = get(port,
        "/v1/environmental?lat=52.5&lon=13.4&timestamp=2026-01-01T12:30:00Z&variables=pm2p5")
      assert(status === 200, body)
      assert(body.contains(""""name":"pm2p5""""))
      assert(body.contains(""""value":12.5"""))
      assert(body.contains(""""unit":"µg/m³""""))
      assert(body.contains(""""actual_lat":52.5"""))
      assert(body.contains(""""actual_lon":13.4"""))
      assert(body.contains(""""ref_timestamp":"2026-01-01T12:00:00Z""""))
      assert(body.contains(""""requested_timestamp":"2026-01-01T12:30:00Z""""))
      assert(body.contains(
        """"lineage":{"source":"ads","dataset":"cams-europe-air-quality-forecast","raw_file_id":"raw-1"}"""))
    }
  }

  test("200 multiple variables, request order kept") {
    withServer { port =>
      val (status, body) = get(port,
        "/v1/environmental?lat=52.5&lon=13.4&timestamp=2026-01-01T12:30:00Z&variables=temperature,pm2p5")
      assert(status === 200, body)
      val iTemp = body.indexOf(""""name":"temperature"""")
      val iPm = body.indexOf(""""name":"pm2p5"""")
      assert(iTemp >= 0 && iPm >= 0 && iTemp < iPm, "request order kept")
      assert(body.contains(""""source":"ecmwf""""))
    }
  }

  test("400 on each invalid field; error body is JSON") {
    withServer { port =>
      val cases = Seq(
        "/v1/environmental?lat=91&lon=0&timestamp=2026-01-01T12:00:00Z&variables=t",
        "/v1/environmental?lat=0&lon=-181&timestamp=2026-01-01T12:00:00Z&variables=t",
        "/v1/environmental?lat=0&lon=0&timestamp=not-a-time&variables=t",
        "/v1/environmental?lat=0&lon=0&timestamp=2026-01-01T12:00:00Z&variables=",
        "/v1/environmental?lat=0&lon=0&timestamp=2026-01-01T12:00:00Z&variables=a,,b",
        "/v1/environmental") // all params absent
      cases.foreach { url =>
        val (status, body) = get(port, url)
        assert(status === 400, s"$url → $status $body")
        assert(body.startsWith("""{"error":"""), body)
      }
    }
  }

  test("404 when ANY requested variable has no data — no partial response") {
    withServer { port =>
      val (status, body) = get(port,
        "/v1/environmental?lat=52.5&lon=13.4&timestamp=2026-01-01T12:30:00Z&variables=pm2p5,no2")
      assert(status === 404, body)
      assert(body === """{"error":"no data for: no2"}""")
    }
  }

  test("405 on non-GET") {
    withServer { port =>
      val conn = URI.create(s"http://127.0.0.1:$port/v1/environmental").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.getOutputStream.close()
      assert(conn.getResponseCode === 405)
    }
  }
}
