package graft.jobs

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{GridFunctions, UuidV7}
import graft.sources.{Grib, GribReader}
import graft.store.{CatalogStore, GridStore}
import graft.transform.Transforms

/** T1–T5 — the daily-partition batch driver (SURVEY.md §2.8, §7.1 step 6).
  *
  * The reference's Dagster job materializes one date partition per source per
  * day (ingest → transform → optimize, `defs/schedules.py`, `defs/assets.py`);
  * here that is one parameterized batch run. Idempotency is structural, not
  * transactional (T4/T5): the run id is deterministic per (source, dataset,
  * date), so re-runs hit K3's insert-if-absent for `raw_files`, K4's upsert
  * for `curated_data`, and A1's keep-latest dedup for grid rows — "delete the
  * data, re-run the ETL, same results" (`docs/layer-2-transformation.md:307-313`).
  */
final class DailyJob(
    spark: SparkSession,
    grids: GridStore,
    rawFiles: CatalogStore,
    curated: CatalogStore) {

  final case class RunResult(
      runId: String,
      insertedRows: Long,          // A3 row-count accounting
      variablesProcessed: Seq[String], // A4 distinct-set collection
      curatedKeys: Seq[String])

  /** S6 — upstream-metadata scan: the transform stage locates its input by
    * reading the `raw_files` catalog for its (dataset, date) partition and
    * reconstructing the object key; absent → fail (reference:
    * `defs/assets.py:172-191` — the catalog IS our metadata store, no
    * separate event log).
    */
  def locateRawFile(dataset: String, date: Date): String = {
    val hits = rawFiles.read()
      .filter(col("dataset") === dataset && col("date") === date)
      .orderBy(col("createdAt").desc)
      .select("s3Key").limit(1).collect()
    require(hits.nonEmpty, s"no raw file recorded for $dataset @ $date")
    hits(0).getString(0)
  }

  /** One source's daily materialization for `date`. `transform` is one of
    * [[Transforms.cams]] / [[Transforms.ecmwf]]; `reader`+`path` stand in for
    * the object-store GET + GRIB decode (S1–S3).
    */
  def run(source: String, dataset: String, date: Date,
      reader: GribReader, path: String,
      transform: (DataFrame, Timestamp) => DataFrame,
      insertedAt: Timestamp): RunResult = {
    import spark.implicits._

    // ── ingest (S3/K2/K3): record the raw object, idempotently ──
    val runId = UuidV7.deterministic(date.getTime,
      (source + "/" + dataset).hashCode.toLong)
    val raw = Seq((runId, source, dataset, date)).toDF("id", "source", "dataset", "date")
      .withColumn("s3Key", GridFunctions.s3Key(col("source"), col("dataset"),
        col("date"), col("id")))
      .withColumn("createdAt", lit(insertedAt))
    rawFiles.insertIfAbsent(raw)

    // ── transform (S1/S2 → C1..C3 → K1/K4) ──
    val decoded = Grib.toDataFrame(spark, reader.open(path).toSeq)
    // materialize the transform ONCE: four downstream actions (grid append,
    // curated upsert, touched-dates collect, meta collect) would otherwise
    // each re-run the full pivot/join pipeline — ~4x the day's cluster work
    val rows = transform(decoded, insertedAt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = grids.append(rows)
      val curatedRows = Transforms.curatedRecords(rows, runId, insertedAt)
      curated.upsert(curatedRows, "createdAt")

      // ── optimize (K5): compact only the dates this run touched ──
      val touched = rows.select(to_date(col("timestamp")).as("d")).distinct()
        .as[Date].collect().toSeq
      grids.compact(touched)

      val meta = curatedRows.select("id", "variable").collect()
      RunResult(runId, n,
        meta.map(_.getString(1)).distinct.sorted.toSeq,
        meta.map(_.getString(0)).sorted.toSeq)
    } finally { rows.unpersist(); () }
  }
}
