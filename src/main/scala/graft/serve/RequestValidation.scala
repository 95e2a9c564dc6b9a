package graft.serve

import java.time.Instant
import java.time.format.DateTimeParseException

/** F4/C9 — serving-request parsing and validation (reference:
  * `serving-go/internal/api/request.go:18-91`): lat ∈ [−90, 90],
  * lon ∈ [−180, 180], RFC3339 timestamp, non-empty trimmed CSV variable
  * list with no empty entries. Pure Scala — this sits in front of the query
  * layer, not inside a plan.
  */
object RequestValidation {

  final case class EnvironmentalRequest(
      lat: Float, lon: Float, timestamp: Instant, variables: Seq[String])

  def parse(latS: String, lonS: String, tsS: String,
      variablesCsv: String): Either[String, EnvironmentalRequest] =
    for {
      lat <- parseFloat("lat", latS)
      _ <- cond(lat >= -90f && lat <= 90f, s"lat out of range [-90,90]: $lat")
      lon <- parseFloat("lon", lonS)
      _ <- cond(lon >= -180f && lon <= 180f, s"lon out of range [-180,180]: $lon")
      ts <- parseRfc3339(tsS)
      vars <- parseVariables(variablesCsv)
    } yield EnvironmentalRequest(lat, lon, ts, vars)

  private def parseFloat(name: String, s: String): Either[String, Float] =
    try Right(s.trim.toFloat)
    catch { case _: NumberFormatException => Left(s"invalid $name: '$s'") }

  private def parseRfc3339(s: String): Either[String, Instant] =
    try Right(Instant.parse(s.trim))
    catch { case _: DateTimeParseException => Left(s"invalid RFC3339 timestamp: '$s'") }

  /** CSV split + trim; empty list or any empty entry rejected
    * (`request.go:78-91`).
    */
  private def parseVariables(csv: String): Either[String, Seq[String]] = {
    if (csv.trim.isEmpty) Left("variables must be non-empty")
    else {
      val parts = csv.split(",", -1).map(_.trim).toSeq
      if (parts.exists(_.isEmpty)) Left(s"empty variable in list: '$csv'")
      else Right(parts)
    }
  }

  private def cond(ok: Boolean, err: => String): Either[String, Unit] =
    if (ok) Right(()) else Left(err)
}
