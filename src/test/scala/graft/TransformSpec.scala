package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.GridFunctions
import graft.sources.{Grib, SyntheticGrid, SyntheticMessage}
import graft.transform.Transforms

/** Operator-level transform specs, anchored on the reference's own oracle
  * values (`tests/unit/test_transform_assets.py`, FIXTURES.md).
  */
class TransformSpec extends SparkSpec {
  import spark.implicits._

  test("C3: Magnus oracle — T=20, Td=15 → ≈73%; T==Td → 100%") {
    val df = Seq((20.0, 15.0), (20.0, 20.0), (0.0, 0.0)).toDF("t", "td")
      .select(GridFunctions.magnusHumidity(col("t"), col("td")).as("rh"))
    val rh = df.collect().map(_.getDouble(0))
    assert(math.abs(rh(0) - 73.0) < 0.5, s"expected ~73, got ${rh(0)}")
    assert(math.abs(rh(1) - 100.0) < 1e-9)
    assert(math.abs(rh(2) - 100.0) < 1e-9)
  }

  test("F1: Europe clip keeps the reference's golden 169×281 = 47,489 points") {
    val grid = SyntheticGrid.ecmwfGlobal(spark, 1)
    val clipped = GridFunctions.clipToEurope(grid)
    assert(clipped.count() === 47489L)
    val reg = clipped.agg(GridFunctions.gridIsRegular).collect()(0).getBoolean(0)
    assert(reg, "clipped grid should be a regular lattice")
  }

  test("C1: CAMS kg m-3 → µg/m³ conversion rewrites value ×1e9 and unit") {
    val ts = Timestamp.valueOf("2026-01-01 00:00:00")
    val decoded = Seq(
      ("pm2p5", "kg m-3", ts, 30.0f, -10.0f, 1.5e-8),
      ("pm10", "µg/m³", ts, 30.0f, -10.0f, 12.0)
    ).toDF("variable", "unit", "timestamp", "lat", "lon", "value")
    val out = Transforms.cams(decoded, ts)
    val byVar = out.collect().map(r => r.getAs[String]("variable") ->
      (r.getAs[Double]("value"), r.getAs[String]("unit"))).toMap
    assert(math.abs(byVar("pm2p5")._1 - 15.0) < 1e-9)
    assert(byVar("pm2p5")._2 === "µg/m³")
    assert(byVar("pm10")._1 === 12.0) // already converted — untouched
  }

  test("ECMWF transform: golden count 2 ts × 3 vars × 47,489 = 284,934 rows; RH in [0,105]") {
    val decoded = SyntheticGrid.ecmwfKelvinPair(spark, 2)
    val out = Transforms.ecmwf(decoded, Timestamp.valueOf("2026-01-02 00:00:00")).cache()
    assert(out.count() === 284934L)
    val perVar = out.groupBy("variable").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perVar === Map("temperature" -> 94978L, "dewpoint" -> 94978L, "humidity" -> 94978L))
    val rh = out.filter($"variable" === "humidity")
      .agg(min("value"), max("value")).collect()(0)
    assert(rh.getDouble(0) >= 0.0 && rh.getDouble(1) <= 105.0)
    // one catalog id per (variable, timestamp) slice — 6 total
    assert(out.select("catalogId").distinct().count() === 6L)
    out.unpersist()
  }

  test("F5: completeness guard drops timestamps missing one variable") {
    val ts1 = Timestamp.valueOf("2026-01-01 00:00:00")
    val ts2 = Timestamp.valueOf("2026-01-01 03:00:00")
    val decoded = Seq(
      ("temperature", "K", ts1, 50.0, 10.0, 290.0),
      ("dewpoint", "K", ts1, 50.0, 10.0, 285.0),
      ("temperature", "K", ts2, 50.0, 10.0, 291.0) // dewpoint missing
    ).toDF("variable", "unit", "timestamp", "lat", "lon", "value")
    val out = Transforms.ecmwf(decoded, ts1)
    assert(out.filter($"timestamp" === ts2).count() === 0L)
    assert(out.filter($"timestamp" === ts1).count() === 3L)
  }

  test("granularity snap floors to the source step") {
    import graft.model.Constants
    val df = Seq(
      Timestamp.valueOf("2026-01-01 14:37:21"),
      Timestamp.valueOf("2026-01-01 14:00:00")).toDF("ts")
    val out = df.select(
      GridFunctions.snapToGranularity(col("ts"), Constants.CamsGranularitySec).as("h"),
      GridFunctions.snapToGranularity(col("ts"), Constants.EcmwfGranularitySec).as("h3"))
      .collect()
    assert(out(0).getTimestamp(0) === Timestamp.valueOf("2026-01-01 14:00:00"))
    assert(out(0).getTimestamp(1) === Timestamp.valueOf("2026-01-01 12:00:00"))
    assert(out(1).getTimestamp(0) === Timestamp.valueOf("2026-01-01 14:00:00"))
  }

  test("S1/S2: GRIB explode normalizes longitudes to [-180,180)") {
    val ts = Timestamp.valueOf("2026-01-01 00:00:00")
    val msg = SyntheticMessage("pm10", "kg m-3", ts,
      values = Array(1.0, 2.0, 3.0),
      lats = Array(40.0, 40.0, 40.0),
      lons = Array(335.05, 350.0, 20.0)) // 0..360 convention input
    val df = Grib.toDataFrame(spark, Seq(msg))
    val lons = df.select("lon").collect().map(_.getFloat(0)).sorted
    assert(math.abs(lons(0) - -24.95f) < 1e-4)
    assert(lons(1) === -10.0f)
    assert(lons(2) === 20.0f)
  }
}
