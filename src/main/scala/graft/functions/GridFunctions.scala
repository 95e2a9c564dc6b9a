package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level scalar operators of the engine (SURVEY.md §2.3, §2.7).
  *
  * All of these are pure `Column` expressions — they stay inside whole-stage
  * codegen and push down to the scan where applicable. No UDFs.
  */
object GridFunctions {
  import graft.model.Constants._

  /** F1 — Europe bounding-box clip
    * (reference: `pipeline-python/src/pipeline_python/defs/assets.py:36-70`).
    * In the row-relational model the reference's 2-D reshape disappears;
    * the clip is a plain pushable predicate.
    */
  def europeClip(lat: Column, lon: Column): Column =
    lat.between(EuropeLatMin, EuropeLatMax) && lon.between(EuropeLonMin, EuropeLonMax)

  def clipToEurope(df: DataFrame, latCol: String = "lat", lonCol: String = "lon"): DataFrame =
    df.filter(europeClip(col(latCol), col(lonCol)))

  /** Grid-regularity check — the set-oriented analog of the reference's 2-D
    * shape re-inference (`assets.py:56-70`): a slice is a regular grid iff
    * distinct(round(lat,6)) * distinct(round(lon,6)) == count(*).
    * Use inside an agg: `agg(gridIsRegular)`.
    */
  def gridIsRegular: Column =
    (countDistinct(round(col("lat"), 6)) * countDistinct(round(col("lon"), 6)) === count(lit(1)))
      .as("is_regular")

  /** C1 — kg m⁻³ → µg/m³ for particulate matter
    * (reference: `defs/assets.py:209-211`). Returns (value, unit) rewritten.
    */
  def kgM3ToUgM3(value: Column, unit: Column): (Column, Column) = (
    when(unit === "kg m-3", value * lit(1e9)).otherwise(value),
    when(unit === "kg m-3", lit("µg/m³")).otherwise(unit)
  )

  /** C2 — Kelvin → Celsius (reference: `defs/assets.py:385-386`). */
  def kelvinToCelsius(k: Column): Column = k - lit(273.15)

  /** C3 — Magnus relative humidity from T and Td in °C
    * (reference: `defs/assets.py:387-388`). Oracle points: T=20, Td=15 → ≈73%;
    * T == Td → 100% (`tests/unit/test_transform_assets.py:352-380`).
    * Pure column arithmetic — numpy-vectorized in the reference for the same
    * reason this is codegen-friendly here.
    */
  def magnusHumidity(tCelsius: Column, tdCelsius: Column): Column = {
    def gamma(x: Column): Column = exp(lit(17.625) * x / (lit(243.04) + x))
    lit(100.0) * gamma(tdCelsius) / gamma(tCelsius)
  }

  /** C4 — squared Euclidean distance ranking key
    * (reference: `serving-go/internal/grid/finder.go:42`; Euclidean over
    * great-circle is a deliberate reference choice, `docs/layer-3-serving.md:98`).
    */
  def sqDist(lat: Column, lon: Column, probeLat: Column, probeLon: Column): Column =
    (lat - probeLat) * (lat - probeLat) + (lon - probeLon) * (lon - probeLon)

  /** Granularity snap — floor a timestamp to a source's step (CAMS hourly,
    * ECMWF 3-hourly; `Constants.*GranularitySec`). The as-of snap (A2) makes
    * this implicit at query time — this explicit form is for partition/step
    * bookkeeping (e.g. validating that a decoded message's valid-time sits
    * on the source's grid).
    */
  def snapToGranularity(ts: Column, granularitySec: Long): Column =
    timestamp_seconds(floor(unix_timestamp(ts) / granularitySec) * granularitySec)

  /** C7 — raw-object key construction
    * (reference: `defs/assets.py:119,277`; `docs/layer-1-ingestion.md:58-66`).
    */
  def s3Key(source: Column, dataset: Column, date: Column, runId: Column): Column =
    concat_ws("/", source, dataset, date_format(date, "yyyy-MM-dd"),
      concat(runId, lit(".grib")))
}
