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
  def append(rows: DataFrame): Long = append(rows, Nil)

  /** K11 — schema-evolved append: the canonical columns normalize exactly
    * as the plain [[append]]; declared `extras` ride along untouched. This
    * is the `ALTER TABLE … ADD COLUMN` analog for an append-only archive:
    * files written before the column existed simply lack it and read back
    * NULL under a merged schema ([[rawMerged]]) — no history rewrite, which
    * is the only evolution discipline that survives a 100 TB store.
    */
  def append(rows: DataFrame, extras: Seq[String]): Long = {
    // Row count observed during the write job itself (no second scan).
    val obs = org.apache.spark.sql.Observation()
    val withExtras = rows.select(canonicalCols(rows) ++ extras.map(rows(_)): _*)
    withExtras
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
    rows.select(canonicalCols(rows): _*)

  private def canonicalCols(rows: DataFrame): Seq[org.apache.spark.sql.Column] = Seq(
    rows("variable").cast("string").as("variable"),
    date_trunc("second", rows("timestamp")).as("timestamp"),
    rows("lat").cast("float").as("lat"),
    rows("lon").cast("float").as("lon"),
    rows("value").cast("float").as("value"),
    rows("unit").cast("string").as("unit"),
    rows("catalogId").cast("string").as("catalogId"),
    rows("insertedAt").cast("timestamp").as("insertedAt")
  )

  /** Raw read — may contain superseded versions between compactions.
    * Always under schema merge: without it, which footer Spark samples
    * decides whether a K11-evolved column exists, so the SAME store would
    * nondeterministically grow and lose columns between an evolved append
    * and the next compaction. Footer-merging is a per-file metadata read —
    * at archive scale a production deployment records the current schema
    * in the catalog and passes it to the reader instead; the semantics
    * (old files surface NULL) are identical.
    */
  def raw(): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Alias kept for call sites that want the evolution semantics spelled
    * out; [[raw]] itself reads merged (see there for why).
    */
  def rawMerged(): DataFrame = raw()

  /** The FINAL view (A1): keep-latest per sorting key. ALL query paths go
    * through this. Uses the hash-aggregate formulation (map-side partial
    * `max_by`, no sort — see [[Replacing.latestAgg]]).
    */
  def finalView(): DataFrame =
    Replacing.latestAgg(raw(), keyCols, versionCol, tiebreakCols = Seq("catalogId"))

  /** FINAL view bounded to a timestamp window, applied BELOW the dedup
    * aggregate as both a `date` predicate (→ Parquet partition pruning: with
    * years of history a snap query must not list, let alone scan, every date
    * — the reference gets this bound from ClickHouse's primary-key index,
    * `serving-go/internal/grid/finder.go:38-41`) and a `timestamp` predicate
    * (→ row-group skipping inside the surviving dates). Filtering before the
    * dedup is exact: `timestamp` is part of the dedup key, so versions of a
    * key never straddle the window boundary.
    */
  def finalView(lo: java.sql.Timestamp, hi: java.sql.Timestamp): DataFrame = {
    val bounded = raw()
      .filter(col("date").between(to_date(lit(lo)), to_date(lit(hi))) &&
        col("timestamp").between(lit(lo), lit(hi)))
    Replacing.latestAgg(bounded, keyCols, versionCol, tiebreakCols = Seq("catalogId"))
  }

  /** K5 — compaction: rewrite date partitions with dedup materialized
    * (the `OPTIMIZE TABLE grid_data FINAL` analog). With no argument compacts
    * every date. Uses dynamic partition overwrite so untouched dates survive.
    */
  def compact(dates: Seq[java.sql.Date] = Nil): Unit = {
    if (!exists) return
    // mergeSchema: a compaction that read a single file's footer would
    // silently DROP an evolved column (K11) from every rewritten partition —
    // the one operation that rewrites history must see the union schema.
    val base = rawMerged()
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
    // T5 swap discipline: the live data is renamed ASIDE before the staged
    // data is renamed in — at no instant is the only surviving copy in the
    // staging dir (delete-then-rename would strand it there on a crash
    // between the two calls). A crash between the renames leaves the live
    // path briefly absent but two durable copies (.compact.old + staging);
    // recovery = promote either. The aside root lives NEXT TO the store so
    // partition discovery over `path` never sees a non-partition dir.
    import org.apache.hadoop.fs.Path
    // rename returns FALSE (it does not throw) on several filesystems; an
    // unchecked failed rename-aside would leave the live dir in place and
    // the next rename would move the staged dir INSIDE it (Hadoop rename
    // onto an existing directory is move-into) — silent nesting corruption
    def renameOrFail(src: Path, dst: Path): Unit =
      if (!fs.rename(src, dst))
        throw new java.io.IOException(
          s"compact swap aborted: rename $src -> $dst failed; staged data intact at $staged")
    val oldRoot = new Path(path + ".compact.old")
    fs.delete(oldRoot, true) // clear leftovers from any previously-failed swap
    if (dates.isEmpty) {
      renameOrFail(new Path(path), oldRoot)
      renameOrFail(new Path(staged), new Path(path))
    } else {
      fs.mkdirs(oldRoot)
      dates.foreach { d =>
        val part = s"date=$d"
        val live = new Path(s"$path/$part")
        val stagedPart = new Path(s"$staged/$part")
        // a requested date with no rows writes no staged partition — a
        // maintenance call naming an empty/future date must no-op for it,
        // not die mid-loop after earlier dates already swapped
        if (fs.exists(stagedPart)) {
          if (fs.exists(live)) renameOrFail(live, new Path(oldRoot, part))
          renameOrFail(stagedPart, live)
        }
      }
      fs.delete(new Path(staged), true)
    }
    fs.delete(oldRoot, true)
  }

  /** Crash recovery for the [[compact]] swap — the startup step a deployment
    * runs before serving from this store. Each crash window leaves a state
    * this repairs:
    *
    *   1. during the staged write → live intact, dangling `.compact.tmp`:
    *      delete the staging leftovers;
    *   2. between the two renames (whole-store) → live ABSENT, both
    *      `.compact.old` (pre-compaction data) and `.compact.tmp` (compacted
    *      copy, `_SUCCESS`-complete) durable: promote the staged copy —
    *      it is the deduped one; fall back to the aside copy if staging is
    *      incomplete;
    *   3. mid per-date loop → live partition dirs partially swapped: any
    *      date moved aside but never replaced gets its staged partition (or,
    *      failing that, the aside original) back;
    *   4. after the swap, before cleanup → live intact: delete leftovers.
    *
    * Idempotent; a no-op on a healthy store.
    */
  def recover(): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new Path(path)
    val staged = new Path(path + ".compact.tmp")
    val oldRoot = new Path(path + ".compact.old")
    val stagedOk = fs.exists(staged) && fs.exists(new Path(staged, "_SUCCESS"))
    if (!fs.exists(live)) {
      if (stagedOk) { fs.rename(staged, live); () }
      else if (fs.exists(oldRoot)) { fs.rename(oldRoot, live); () }
    } else if (fs.exists(oldRoot)) {
      fs.listStatus(oldRoot).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("date=") && !fs.exists(new Path(live, name))) {
          val stagedPart = new Path(staged, name)
          if (stagedOk && fs.exists(stagedPart)) fs.rename(stagedPart, new Path(live, name))
          else fs.rename(st.getPath, new Path(live, name))
        }
      }
    }
    fs.delete(staged, true)
    fs.delete(oldRoot, true)
    ()
  }
}
