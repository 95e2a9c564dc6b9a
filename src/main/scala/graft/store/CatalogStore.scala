package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog tables with relational upsert semantics on plain Parquet
  * (no Delta in this environment — SURVEY.md §7.3).
  *
  * Two writers mirror the reference's Postgres catalog
  * (`pipeline-python/src/pipeline_python/defs/resources.py:68-123`):
  *   - K3 `insertIfAbsent` — `INSERT … ON CONFLICT (id) DO NOTHING`
  *     (re-runs never duplicate raw_files rows): left-anti-join then append;
  *   - K4 `upsert` — `INSERT … ON CONFLICT (id) DO UPDATE`
  *     (reprocess = latest metadata wins): union + keep-newest + rewrite.
  *
  * Both tables are small dimensions (one row per ingested file / per curated
  * grid slice — thousands, not billions), so full-table rewrite is the right
  * cost model even at 100 TB of grid data; the big table never does this.
  */
final class CatalogStore(spark: SparkSession, val path: String, val keyCol: String) {

  private def fs = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new org.apache.hadoop.fs.Path(path))

  def read(): DataFrame = spark.read.parquet(path)

  /** K3 — idempotent insert: rows whose key already exists are dropped. */
  def insertIfAbsent(rows: DataFrame): Long = {
    val fresh =
      if (!exists) rows
      else rows.join(broadcast(read().select(keyCol)), Seq(keyCol), "left_anti")
    val n = fresh.count()
    if (n > 0) fresh.write.mode("append").parquet(path)
    n
  }

  /** K4 — upsert: incoming rows replace existing rows with the same key.
    * `versionCol` breaks ties deterministically (newest wins).
    */
  def upsert(rows: DataFrame, versionCol: String): Unit = {
    val merged =
      if (!exists) rows
      else {
        val existing = read()
        val incoming = rows.select(existing.columns.map(col): _*)
        Replacing.latest(
          existing.withColumn("__src", lit(0)).unionByName(incoming.withColumn("__src", lit(1))),
          Seq(keyCol), versionCol, tiebreakCols = Seq("__src")
        ).drop("__src")
      }
    // stage-and-swap: the rewrite reads the files it replaces (T5 atomicity)
    val staged = path + ".upsert.tmp"
    merged.coalesce(1).write.mode("overwrite").parquet(staged)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(staged), new org.apache.hadoop.fs.Path(path))
  }
}
