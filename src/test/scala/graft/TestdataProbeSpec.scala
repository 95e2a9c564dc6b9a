package graft

import org.apache.spark.sql.types.{LongType, TimestampType}

/** Testdata drift canary (VERDICT r6 #2). The driver regenerates
  * /root/testdata across rounds and has changed column encodings twice
  * (events added in r2, ts precision ns → µs in r6); these tests turn the
  * next drift into one named failure instead of dozens of scattered ones.
  */
class TestdataProbeSpec extends SparkSpec {

  test("probe reads every sf0.001 table and logs schemas") {
    val schemas = Tables.probe(spark, "/root/testdata/sf0.001")
    assert(schemas.map(_._1) == Tables.all)
    schemas.foreach { case (t, s) => info(s"$t: $s") }
  }

  test("events.ts normalizes to TIMESTAMP regardless of physical encoding") {
    val df = Tables(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"events.ts read as ${df.schema("ts").dataType}")
    // and values are actually usable: the sf0.001 events all land in 2024-25
    val yrs = df.selectExpr("min(year(ts))", "max(year(ts))").head()
    assert(yrs.getInt(0) >= 2000 && yrs.getInt(1) <= 2100, yrs.toString)
  }

  test("loader still handles the legacy TIMESTAMP(NANOS)-as-long form") {
    // Synthesize the old shape: a long `ts` column named like the nanos-era
    // read under nanosAsLong=true, written to parquet and re-read via Tables.
    val dir = tempDir("nanos-events")
    spark.range(3).selectExpr(
      "id AS event_id", "(1700000000000000000 + id * 1000000000) AS ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    val first = df.orderBy("event_id").selectExpr("unix_micros(ts)").head().getLong(0)
    assert(first == 1700000000000000L, s"ns→µs floor conversion broke: $first")
  }
}
