package graft.sources

import java.sql.Date

/** S4/S5 — forecast fetchers (SURVEY.md §2.1; reference:
  * `pipeline-python/src/pipeline_python/ingestion/cds_client.py:33-79`,
  * `ecmwf_client.py:25-52`).
  *
  * These are driver-side clients, not Spark operators. The request-building
  * logic (variable name mapping, leadtime step generation, horizon
  * validation) is pure and fully tested offline; the transport is a
  * pluggable function. [[HttpTransport]] provides the real HTTP
  * implementations (CDS submit/poll/download, ECMWF direct GET), tested
  * against an in-process server fixture (HttpFetchSpec) — no egress needed.
  */
object Fetchers {

  final case class ForecastRequest(params: Map[String, Seq[String]], target: String)

  /** Copernicus ADS client shape: submit→poll→download, hourly leadtimes,
    * `model=ensemble`, `time=00:00`, GRIB format. Horizon must be in (0, 48]
    * (reference validation, `cds_client.py:55-62`).
    */
  object CdsClient {
    /** Engine variable names → ADS API names (CAMS European air-quality
      * forecast dataset).
      */
    val VariableApiNames: Map[String, String] = Map(
      "pm2p5" -> "particulate_matter_2.5um",
      "pm10" -> "particulate_matter_10um")

    val MaxHorizonHours = 48

    def buildRequest(date: Date, variables: Seq[String], target: String,
        maxLeadtimeHours: Int): ForecastRequest = {
      require(maxLeadtimeHours > 0 && maxLeadtimeHours <= MaxHorizonHours,
        s"leadtime horizon must be in (0, $MaxHorizonHours]: $maxLeadtimeHours")
      val unknown = variables.filterNot(VariableApiNames.contains)
      require(unknown.isEmpty, s"unknown variables: ${unknown.mkString(",")}")
      ForecastRequest(Map(
        "variable" -> variables.map(VariableApiNames),
        "date" -> Seq(s"$date/$date"),
        "model" -> Seq("ensemble"),
        "time" -> Seq("00:00"),
        "format" -> Seq("grib"),
        "leadtime_hour" -> (0 to maxLeadtimeHours).map(_.toString)
      ), target)
    }
  }

  /** ECMWF Open Data client shape: direct download (no auth/polling),
    * 3-hourly steps 0–48 filtered to the horizon, `type=fc`, `stream=oper`,
    * `levtype=sfc`, `time=0` (reference: `ecmwf_client.py:8,25-52`).
    */
  object EcmwfClient {
    val VariableParams: Map[String, String] = Map(
      "temperature" -> "2t",
      "dewpoint" -> "2d")

    val StepHours = 3
    val MaxHorizonHours = 48

    def buildRequest(date: Date, target: String, maxLeadtimeHours: Int,
        variables: Seq[String] = Seq("temperature", "dewpoint")): ForecastRequest = {
      require(maxLeadtimeHours > 0 && maxLeadtimeHours <= MaxHorizonHours,
        s"leadtime horizon must be in (0, $MaxHorizonHours]: $maxLeadtimeHours")
      // validate + map through the params table (the CdsClient discipline)
      // instead of hardcoding — an unknown variable fails loudly here, not
      // as a silent 404 from the remote service
      val unknown = variables.filterNot(VariableParams.contains)
      require(unknown.isEmpty, s"unknown ECMWF variables: ${unknown.mkString(",")}")
      val steps = (0 to MaxHorizonHours by StepHours).filter(_ <= maxLeadtimeHours)
      ForecastRequest(Map(
        "param" -> variables.map(VariableParams),
        "date" -> Seq(date.toString),
        "type" -> Seq("fc"),
        "stream" -> Seq("oper"),
        "levtype" -> Seq("sfc"),
        "time" -> Seq("0"),
        "step" -> steps.map(_.toString)
      ), target)
    }
  }

  /** Transport abstraction: given a built request, produce the file at
    * `request.target`. Production wires an HTTP client; offline tests wire a
    * stub.
    */
  type Transport = ForecastRequest => Unit

  def retrieveForecast(request: ForecastRequest, transport: Transport): String = {
    transport(request)
    request.target
  }
}
