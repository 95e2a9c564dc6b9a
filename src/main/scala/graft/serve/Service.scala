package graft.serve

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.{Lineage, VariableResult}
import graft.serve.RequestValidation.EnvironmentalRequest

/** The serving domain service (SURVEY.md §3.1 — reference:
  * `serving-go/internal/domain/environmental.go:41-97`).
  *
  * The reference fans out one goroutine per variable and fails the whole
  * request if ANY variable is missing (no partial responses,
  * `serving-go/README.md:59`). Here the fan-out collapses into ONE
  * set-oriented plan — all variables answered by a single
  * [[PointQuery.getSamples]] + broadcast lineage join — and the
  * fail-if-any-missing check happens on the ≤ |variables| collected rows.
  */
final class Service(finalView: DataFrame, curated: DataFrame, rawFiles: DataFrame) {

  def getVariables(req: EnvironmentalRequest): Either[String, Seq[VariableResult]] = {
    val spark = finalView.sparkSession
    import spark.implicits._
    val probes = req.variables
      .map(v => (v, v, Timestamp.from(req.timestamp), req.lat.toDouble, req.lon.toDouble))
      .toDF("probeId", "variable", "ts", "lat", "lon")
    val answered = PointQuery.withLineage(
      PointQuery.getSamples(finalView, probes),
      curated.select(col("id"), col("rawFileId")),
      rawFiles.select(col("id"), col("source"), col("dataset")))
      .collect()
      .map { r =>
        // the curated store is Float32, but tolerate double-typed frames
        def f(c: String): Float = r.getAs[Number](c).floatValue()
        r.getAs[String]("variable") -> VariableResult(
          name = r.getAs[String]("variable"),
          value = f("value"),
          unit = r.getAs[String]("unit"),
          refTimestamp = r.getAs[Timestamp]("refTimestamp"),
          actualLat = f("actualLat"),
          actualLon = f("actualLon"),
          catalogId = r.getAs[String]("catalogId"),
          lineage = Option(r.getAs[String]("source")).map(src =>
            Lineage(src, r.getAs[String]("dataset"), r.getAs[String]("rawFileId"))))
      }.toMap
    val missing = req.variables.filterNot(answered.contains)
    if (missing.nonEmpty) Left(s"no data for: ${missing.mkString(", ")}")
    else Right(req.variables.map(answered))
  }
}
