package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed synthetic meshgrid generator — the engine's stand-in for a
  * decoded GRIB field (FIXTURES.md; recipe from the reference's own unit
  * tests, `tests/unit/test_transform_assets.py:283-288`:
  * lat 90 → −90 step 0.25 (721), lon −180 → 179.75 step 0.25 (1440),
  * values = lat·100 + lon).
  *
  * Generated with `spark.range` + integer arithmetic, so it scales to any
  * grid without driver materialization and is exactly reproducible in a SQL
  * oracle (DuckDB `range()`): coordinates are derived as exact multiples of
  * 0.25 from integer indices — no float accumulation.
  */
object SyntheticGrid {

  /** Global 0.25° grid for `nTimestamps` forecast steps starting at `t0`,
    * `stepSeconds` apart, one row per (timestamp, lat, lon).
    */
  def ecmwfGlobal(
      spark: SparkSession,
      nTimestamps: Int,
      t0: String = "2026-01-01 00:00:00",
      stepSeconds: Long = 3 * 3600L
  ): DataFrame = {
    val nLat = 721L
    val nLon = 1440L
    val cells = nLat * nLon
    spark.range(0, nTimestamps * cells, 1, 64)
      .select(
        (col("id") / cells).cast("long").as("ti"),
        ((col("id") % cells) / nLon).cast("long").as("li"),
        (col("id") % nLon).as("gi"))
      .select(
        timestamp_seconds(unix_timestamp(lit(t0)) + col("ti") * stepSeconds).as("timestamp"),
        (lit(90.0) - col("li") * 0.25).as("lat"),
        (lit(-180.0) + col("gi") * 0.25).as("lon"))
      .withColumn("value", col("lat") * 100.0 + col("lon"))
  }

  /** CAMS-shaped Europe grid (FIXTURES.md §1): 420×700 at 0.1°, lats
    * 30.05–71.95, lons −24.95–44.95, `nTimestamps` hourly steps, variables
    * pm2p5/pm10 in kg m⁻³ (values (lat·100+lon)·1e-9 so the ×1e9 conversion
    * lands back on exact lat·100+lon).
    */
  def camsKgM3Pair(
      spark: SparkSession,
      nTimestamps: Int,
      t0: String = "2026-01-01 00:00:00"
  ): DataFrame = {
    val nLat = 420L
    val nLon = 700L
    val cells = nLat * nLon
    spark.range(0, nTimestamps * cells, 1, 64)
      .select(
        (col("id") / cells).cast("long").as("ti"),
        ((col("id") % cells) / nLon).cast("long").as("li"),
        (col("id") % nLon).as("gi"))
      .select(
        timestamp_seconds(unix_timestamp(lit(t0)) + col("ti") * 3600L).as("timestamp"),
        (lit(30.05) + col("li") * 0.1).as("lat"),
        (lit(-24.95) + col("gi") * 0.1).as("lon"))
      .select(
        col("timestamp"), col("lat"), col("lon"),
        explode(map(
          lit("pm2p5"), (col("lat") * 100.0 + col("lon")) * 1e-9,
          lit("pm10"), (col("lat") * 100.0 + col("lon")) * 2e-9)).as(Seq("variable", "value")))
      .withColumn("unit", lit("kg m-3"))
  }

  /** The same grid expressed as Kelvin temperature + dewpoint long-form
    * messages — input shape for the ECMWF transform. Values are a linear
    * function of coordinates (multiply-add only → bit-reproducible in any
    * IEEE-754 engine, unlike libm sin/cos):
    * T(K) = 288.15 + lat·0.05 + lon·0.01, Td = T − (2 + (lat+90)/36).
    */
  def ecmwfKelvinPair(
      spark: SparkSession,
      nTimestamps: Int,
      t0: String = "2026-01-01 00:00:00"
  ): DataFrame = {
    ecmwfGlobal(spark, nTimestamps, t0)
      .withColumn("t_k", lit(288.15) + col("lat") * 0.05 + col("lon") * 0.01)
      .withColumn("td_k", col("t_k") - (lit(2.0) + (col("lat") + 90.0) / 36.0))
      .select(
        col("timestamp"), col("lat"), col("lon"),
        explode(map(
          lit("temperature"), col("t_k"),
          lit("dewpoint"), col("td_k"))).as(Seq("variable", "value")))
      .withColumn("unit", lit("K"))
  }
}
