package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table access (TESTDATA.md). One parquet file per table.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read as
  * a timestamp; sessions set `spark.sql.legacy.parquet.nanosAsLong=true` and
  * this loader converts ns → µs with integer division (floor — exactly what
  * DuckDB does when it reads the same file as TIMESTAMP, so both engines see
  * identical µs values).
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // runtime-set so even a caller-provided session (e.g. the driver's own,
    // for the entry() smoke) can read the NANOS-precision events table
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
