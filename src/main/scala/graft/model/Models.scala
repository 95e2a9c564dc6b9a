package graft.model

import java.sql.{Date, Timestamp}

/** Core data model (SURVEY.md §1.1).
  *
  * The central table is the curated grid store: one row per
  * `(variable, timestamp, lat, lon)` measurement, with keep-latest-by-`insertedAt`
  * dedup semantics (reference: `pipeline-python/migrations/clickhouse/init.sql:14-25`,
  * ReplacingMergeTree(inserted_at)). Catalog tables mirror
  * `migrations/postgres/init.sql:4-27`.
  */
final case class GridRow(
    variable: String,       // pm2p5 | pm10 | temperature | dewpoint | humidity
    timestamp: Timestamp,   // second precision — truncate at the store boundary
    lat: Float,
    lon: Float,
    value: Float,
    unit: String,           // "µg/m³" | "°C" | "%" — UTF-8, non-ASCII
    catalogId: String,      // UUIDv7, one per (variable, timestamp) grid slice
    insertedAt: Timestamp   // millisecond precision dedup version column
)

/** Raw-object catalog row (reference: `migrations/postgres/init.sql:4-11`);
  * insert-if-absent semantics (ON CONFLICT DO NOTHING).
  */
final case class RawFile(
    id: String,       // UUIDv7 run id
    source: String,   // "ads" | "ecmwf"
    dataset: String,
    date: Date,
    s3Key: String,    // "{source}/{dataset}/{yyyy-MM-dd}/{runId}.grib"
    createdAt: Timestamp
)

/** Curated-data catalog row (reference: `migrations/postgres/init.sql:17-24`);
  * upsert semantics (ON CONFLICT DO UPDATE) keyed by id = grid catalogId.
  */
final case class CuratedData(
    id: String,        // == GridRow.catalogId
    rawFileId: String, // FK → RawFile.id
    variable: String,
    unit: String,
    timestamp: Timestamp,
    createdAt: Timestamp
)

/** Point-query result (reference: `serving-go/internal/domain/grid.go:13-20`). */
final case class GridSample(
    value: Float,
    unit: String,
    lat: Float,
    lon: Float,
    timestamp: Timestamp,
    catalogId: String
)

/** Lineage resolved from a catalogId (reference: `serving-go/internal/domain/lineage.go:10-14`). */
final case class Lineage(source: String, dataset: String, rawFileId: String)

/** Per-variable answer of the serving API
  * (reference: `serving-go/internal/domain/environmental.go:21-30`).
  */
final case class VariableResult(
    name: String,
    value: Float,
    unit: String,
    refTimestamp: Timestamp,
    actualLat: Float,
    actualLon: Float,
    catalogId: String,
    lineage: Option[Lineage]
)

/** Domain constants lifted from the reference. */
object Constants {
  /** Europe bounding box (reference: `pipeline-python/src/pipeline_python/defs/assets.py:32-33`). */
  val EuropeLatMin = 30.0f
  val EuropeLatMax = 72.0f
  val EuropeLonMin = -25.0f
  val EuropeLonMax = 45.0f

  /** CAMS constituent-code map (reference: `grib2/adapters/cams_adapter.py:9-12`). */
  val CamsVariables: Map[Int, String] = Map(40008 -> "pm10", 40009 -> "pm2p5")

  /** ECMWF shortName map (reference: `grib2/adapters/ecmwf_adapter.py:10-13`). */
  val EcmwfVariables: Map[String, String] = Map("2t" -> "temperature", "2d" -> "dewpoint")

  /** Per-source time granularity in seconds
    * (reference: `docs/layer-2-transformation.md:184-194`): CAMS hourly, ECMWF 3-hourly.
    */
  val CamsGranularitySec  = 3600L
  val EcmwfGranularitySec = 3 * 3600L
}
