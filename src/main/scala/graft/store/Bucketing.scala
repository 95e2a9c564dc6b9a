package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support — the co-located-join path for repeated big⋈big
  * joins (SURVEY.md §4 / scale posture).
  *
  * Writing both sides bucketed (same key, same bucket count) lets Catalyst
  * plan an equi-join with NO Exchange on either side: each task reads
  * matching bucket files directly. At 100 TB this turns the nightly
  * "re-shuffle everything" join into a narrow scan — the shuffle is paid
  * once at write time and amortized over every subsequent join/aggregation
  * on the bucket key.
  *
  * Uses the session catalog's V1 datasource tables (no Hive needed);
  * `spark.sql.sources.v2.bucketing.enabled` & co. keep this working under
  * AQE.
  */
object Bucketing {

  /** Write `df` as a bucketed, optionally sorted, Parquet table — managed
    * (warehouse dir) by default, external at `path` when given (bucketed
    * reads need the session catalog either way: bucket metadata lives in
    * the catalog, not the parquet footer).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int, sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite, path: Option[String] = None): Unit = {
    val w = df.write.mode(mode).format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    path.fold(sorted)(p => sorted.option("path", p)).saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Register (if absent) a catalog entry over an ALREADY-WRITTEN bucketed
    * layout at `path` — metadata only, no data movement. Bucket metadata
    * lives in the session catalog, not the parquet footers, and the catalog
    * is per-session: a new session reusing a build-once bucketed layout
    * re-registers here instead of re-paying the layout write (Spark
    * recovers each file's bucket id from the `_NNNNN` file-name suffix).
    */
  def ensureExternal(spark: SparkSession, table: String,
      schema: org.apache.spark.sql.types.StructType, bucketCols: Seq[String],
      nBuckets: Int, sortCols: Seq[String], path: String): Unit =
    if (!spark.catalog.tableExists(table)) {
      val sorted =
        if (sortCols.nonEmpty) s"SORTED BY (${sortCols.mkString(", ")}) " else ""
      spark.sql(
        s"""CREATE TABLE $table (${schema.toDDL}) USING parquet
           |CLUSTERED BY (${bucketCols.mkString(", ")}) ${sorted}INTO $nBuckets BUCKETS
           |LOCATION '$path'""".stripMargin)
      ()
    }

  /** Equi-join two same-bucketed catalog tables with NO exchange on either
    * side. The merge hint pins sort-merge regardless of session conf (a
    * broadcast would also skip the shuffle but wouldn't demonstrate — or
    * scale to — two big sides); the bucketed scans already satisfy the
    * join's distribution requirement, so the plan is scan → (sort) →
    * merge-join with zero Exchange nodes — pinned in PlanAuditSpec.
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String, leftKey: String,
      rightTable: String, rightKey: String): DataFrame = {
    // frame-qualified key refs: with bare col() the common case — both
    // sides bucketed on the SAME column name — fails analysis as an
    // ambiguous reference after the join exposes both
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.hint("merge").join(r, l(leftKey) === r(rightKey))
  }
}
