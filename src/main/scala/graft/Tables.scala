package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table access (TESTDATA.md). One parquet file per table.
  *
  * `events.ts` has changed physical type across driver regenerations —
  * TIMESTAMP(NANOS) in earlier rounds, plain `timestamp[us]` since round 6 —
  * so the loader normalizes by the type Spark actually read rather than
  * assuming a fixed encoding:
  *   - LongType (NANOS file read under `nanosAsLong=true`): ns → µs by
  *     integer division (floor — matching DuckDB's read of the same file)
  *   - TimestampNTZType (`timestamp[us]` without tz): cast to session-local
  *     TIMESTAMP; sessions run UTC so values are identical and downstream
  *     `TIMESTAMP '…'` literals keep resolving
  *   - TimestampType: pass through
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // runtime-set so even a caller-provided session (e.g. the driver's own,
    // for the entry() smoke) can read a NANOS-precision events table
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") {
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // FLOOR division, not `div` (quot, truncates toward zero): a
          // pre-1970 timestamp is negative ns, and -1500 ns is -2 µs under
          // floor (what DuckDB's native read of the same file yields) but
          // -1 µs under div — a silent 1 µs oracle divergence. Integer
          // floor-div, since double arithmetic cannot hold epoch-ns exactly
          df.withColumn("ts", timestamp_micros(
            expr("CASE WHEN ts >= 0 THEN ts div 1000 ELSE (ts - 999) div 1000 END")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df // already TimestampType
      }
    } else df
  }

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Testdata-schema smoke probe. The testdata is an external interface that
    * has changed shape across rounds (events added, then its timestamp
    * precision changed); without this, dtype drift surfaces as dozens of
    * scattered per-query analysis errors instead of one loud diagnostic.
    *
    * Reads every table, forces a row through the parquet reader (so decode
    * errors surface here), verifies the dtypes queries depend on, and
    * returns (table, schema.simpleString) for logging. Throws with a message
    * naming the table + drift on any mismatch.
    */
  def probe(spark: SparkSession, sfDir: String): Seq[(String, String)] =
    all.map { t =>
      val df =
        try {
          val d = apply(spark, sfDir, t)
          d.limit(1).collect()
          d
        } catch {
          case scala.util.control.NonFatal(e) =>
            throw new IllegalStateException(
              s"[testdata-probe] table '$t' failed to read from $sfDir " +
                s"(dtype drift or missing file?): ${e.getMessage}", e)
        }
      if (t == "events") {
        val dt = df.schema("ts").dataType
        require(dt == org.apache.spark.sql.types.TimestampType,
          s"[testdata-probe] events.ts normalized to $dt, expected TIMESTAMP" +
            " — a new physical encoding needs a branch in Tables.apply")
      }
      t -> df.schema.simpleString
    }

  /** The mains' shared probe wrapper: log every table's schema to stderr
    * (stdout is the driver-parsed channel), and on drift print ONE loud
    * diagnostic but CONTINUE — queries untouched by the drift still
    * produce bench/correctness rows. The test suite asserts hard instead
    * (TestdataProbeSpec).
    */
  def probeAndLog(spark: SparkSession, sfDir: String): Unit =
    try probe(spark, sfDir).foreach { case (t, s) =>
      System.err.println(s"[testdata-probe] $t: $s")
    } catch {
      // NonFatal only: an OutOfMemoryError or interrupt during the probe
      // must propagate, not be swallowed into a stderr line with the run
      // continuing in a possibly corrupt state
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[testdata-probe] DRIFT DETECTED — ${e.getMessage}")
    }
}
