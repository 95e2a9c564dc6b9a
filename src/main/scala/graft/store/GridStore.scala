package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The curated grid store: date-partitioned Parquet with
  * ReplacingMergeTree-equivalent semantics (SURVEY.md §7.1 step 2).
  *
  * Layout mirrors the reference's ClickHouse table
  * (`migrations/clickhouse/init.sql:14-25`):
  *   - `PARTITION BY toYYYYMMDD(timestamp)`  → Parquet `partitionBy("date")`,
  *     giving Catalyst partition pruning on date predicates for free;
  *   - `ORDER BY (variable,timestamp,lat,lon)` sparse index →
  *     `sortWithinPartitions` at write time, giving Parquet min/max row-group
  *     skipping on variable/timestamp slices;
  *   - `ReplacingMergeTree(inserted_at)` + `FINAL` → [[Replacing.latest]]
  *     applied by [[finalView]];
  *   - `OPTIMIZE TABLE … FINAL` (K5, `clickhouse_grid_store.py:70-72`) →
  *     [[compact]], which rewrites affected date partitions deduped.
  *
  * Scale posture: appends never read existing data; dedup cost is deferred to
  * reads (pruned to the dates touched) until compaction amortizes it — the
  * same deferred-merge design ClickHouse uses, re-expressed with Spark
  * primitives.
  */
/** @param zorderCellDeg when set, files are sorted by
  *   (variable, timestamp, morton(lat, lon)) at this cell resolution instead
  *   of the reference's (variable, timestamp, lat, lon) — clustering spatial
  *   neighbors into the same row groups so Parquet min/max stats prune NN
  *   probes below the date-slice level. Read semantics are identical.
  */
final class GridStore(spark: SparkSession, val path: String,
    zorderCellDeg: Option[Double] = None) {

  /** Dedup sorting key (reference: `init.sql:25`). */
  val keyCols: Seq[String] = Seq("variable", "timestamp", "lat", "lon")
  val versionCol = "insertedAt"

  private def sortKey: Seq[org.apache.spark.sql.Column] = zorderCellDeg match {
    case Some(cell) =>
      import graft.functions.Spatial
      Seq(col("variable"), col("timestamp"),
        Spatial.morton(
          ((col("lat") + 90.0) / cell).cast("int"),
          ((col("lon") + 180.0) / cell).cast("int")))
    case None =>
      Seq(col("variable"), col("timestamp"), col("lat"), col("lon"))
  }

  private def exists: Boolean =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(path))

  /** K1 — columnar batch append. Normalizes types at the boundary
    * (Float32 values/coords, second-truncated timestamps — SURVEY.md §7.4),
    * derives the `date` partition column, sorts within partitions to emulate
    * the CH primary key, appends. Returns the written row count (A3).
    */
  def append(rows: DataFrame): Long = {
    // Row count observed during the write job itself (no second scan).
    val obs = org.apache.spark.sql.Observation()
    normalize(rows)
      .withColumn("date", to_date(col("timestamp")))
      .repartition(col("date"))
      .sortWithinPartitions(sortKey: _*)
      .observe(obs, count(lit(1)).as("n"))
      .write.mode("append").partitionBy("date").parquet(path)
    obs.get("n").asInstanceOf[Long]
  }

  /** Boundary normalization: CH stores Float32 + DateTime(second) +
    * DateTime64(3); equality semantics downstream depend on this
    * (`finder_integration_test.go:24-25`).
    */
  def normalize(rows: DataFrame): DataFrame =
    rows.select(
      col("variable").cast("string"),
      date_trunc("second", col("timestamp")).as("timestamp"),
      col("lat").cast("float"),
      col("lon").cast("float"),
      col("value").cast("float"),
      col("unit").cast("string"),
      col("catalogId").cast("string"),
      col("insertedAt").cast("timestamp")
    )

  /** Raw read — may contain superseded versions between compactions. */
  def raw(): DataFrame = spark.read.parquet(path)

  /** The FINAL view (A1): keep-latest per sorting key. ALL query paths go
    * through this. Uses the hash-aggregate formulation (map-side partial
    * `max_by`, no sort — see [[Replacing.latestAgg]]).
    */
  def finalView(): DataFrame =
    Replacing.latestAgg(raw(), keyCols, versionCol, tiebreakCols = Seq("catalogId"))

  /** K5 — compaction: rewrite date partitions with dedup materialized
    * (the `OPTIMIZE TABLE grid_data FINAL` analog). With no argument compacts
    * every date. Uses dynamic partition overwrite so untouched dates survive.
    */
  def compact(dates: Seq[java.sql.Date] = Nil): Unit = {
    if (!exists) return
    val base = raw()
    val scoped = if (dates.isEmpty) base else base.filter(col("date").isin(dates: _*))
    // Writing to a staged path means the source files are never overwritten
    // mid-read — no defensive cache/materialize pass needed before the swap.
    val deduped = Replacing
      .latestAgg(scoped, keyCols, versionCol, tiebreakCols = Seq("catalogId"))
      .repartition(col("date"))
      .sortWithinPartitions(sortKey: _*)
    val staged = path + ".compact.tmp"
    deduped.write.mode("overwrite").partitionBy("date").parquet(staged)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (dates.isEmpty) {
      // full rewrite: atomic swap of the whole store (T5 fail-fast atomicity —
      // stage to temp, commit by rename)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      fs.rename(new org.apache.hadoop.fs.Path(staged), new org.apache.hadoop.fs.Path(path))
    } else {
      dates.foreach { d =>
        val part = s"date=$d"
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/$part"), true)
        fs.rename(
          new org.apache.hadoop.fs.Path(s"$staged/$part"),
          new org.apache.hadoop.fs.Path(s"$path/$part"))
      }
      fs.delete(new org.apache.hadoop.fs.Path(staged), true)
    }
  }
}
