package graft.store

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Relational (JDBC) store backend — the engine's answer to the reference's
  * native external stores: the ClickHouse grid sink's column batch inserts
  * (`pipeline-python/src/pipeline_python/storage/clickhouse_grid_store.py:43-68`)
  * and the Postgres catalog's idempotent / latest-wins writes
  * (`defs/resources.py:47-48` — `ON CONFLICT DO NOTHING` for raw files,
  * `ON CONFLICT DO UPDATE` for curated metadata).
  *
  * Spark-first shape:
  *  - **Appends are executor-parallel**: `df.write.jdbc` opens one
  *    connection per partition and batch-inserts (`batchsize` rows per
  *    round trip) — the 1000-executor posture is "repartition to the
  *    connection budget the target can absorb", not a driver-side loop.
  *  - **Upsert / insert-if-absent run as staging + one set-based MERGE**:
  *    the frame bulk-loads into a staging table (parallel, conflict-free),
  *    then a single `MERGE INTO` statement applies it transactionally —
  *    the same statement Postgres, ClickHouse (via `ALTER ... UPDATE` or
  *    ReplacingMergeTree semantics), and every ANSI target executes
  *    set-based, never row-at-a-time JDBC upserts from the driver.
  *  - **Reads push down**: `spark.read.jdbc` with `predicates` partitions
  *    the scan, and Catalyst pushes filters into the remote `WHERE`
  *    (`PushedFilters` in the scan node — pinned in JdbcStoreSpec).
  *
  * The sandbox has no ClickHouse/Postgres server, so the spec exercises
  * the store against embedded Derby (bundled with Spark); nothing here is
  * Derby-specific beyond the default driver — `Conn(url, driver)` points
  * the same code at any JDBC target.
  */
object JdbcStore {

  /** Connection descriptor. `columnTypes` feeds Spark's
    * `createTableColumnTypes` so string keys become comparable VARCHARs
    * (several dialects map StringType to CLOB/TEXT, which some targets —
    * Derby included — refuse to compare in a MERGE predicate).
    */
  final case class Conn(
      url: String,
      driver: String = "org.apache.derby.jdbc.EmbeddedDriver",
      columnTypes: Option[String] = None)

  private def props(conn: Conn): java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("driver", conn.driver)
    p
  }

  private def withConnection[T](conn: Conn)(f: Connection => T): T = {
    Class.forName(conn.driver)
    val c = DriverManager.getConnection(conn.url)
    try f(c) finally c.close()
  }

  /** Quoted (case-exact) identifier — Spark's JDBC writer creates columns
    * quoted, so every statement here must reference them the same way.
    */
  private def q(ident: String): String = "\"" + ident + "\""

  /** Executor-parallel batch append (the ClickHouse `insert_grid` analog).
    * Creates the table on first write.
    */
  def append(df: DataFrame, conn: Conn, table: String,
      batchSize: Int = 10000): Unit = {
    val w = df.write.mode("append")
      .option("driver", conn.driver)
      .option("batchsize", batchSize)
    conn.columnTypes.fold(w)(t => w.option("createTableColumnTypes", t))
      .jdbc(conn.url, table, new java.util.Properties())
  }

  /** Idempotent insert (the `ON CONFLICT (id) DO NOTHING` analog): rows
    * whose `keys` already exist in `table` are skipped, the rest insert —
    * one set-based MERGE over a bulk-loaded staging table.
    */
  def insertIfAbsent(df: DataFrame, conn: Conn, table: String,
      keys: Seq[String]): Unit =
    merge(df, conn, table, keys, updateOnMatch = false)

  /** Latest-wins upsert (the `ON CONFLICT (id) DO UPDATE` analog): matched
    * rows take the incoming values, unmatched rows insert.
    */
  def upsert(df: DataFrame, conn: Conn, table: String,
      keys: Seq[String]): Unit =
    merge(df, conn, table, keys, updateOnMatch = true)

  /** VERSIONED upsert — the ReplacingMergeTree semantic over JDBC: a
    * matched row updates only when the incoming `versionCol` is strictly
    * newer, so a delayed replay of yesterday's batch can never clobber
    * today's rows (plain [[upsert]] is last-WRITER-wins; this is
    * last-VERSION-wins, which is what makes re-runs and out-of-order
    * backfills safe against a remote store). Same bulk staging + one
    * set-based MERGE; the version predicate rides the MATCHED clause.
    */
  def upsertVersioned(df: DataFrame, conn: Conn, table: String,
      keys: Seq[String], versionCol: String): Unit =
    merge(df, conn, table, keys, updateOnMatch = true,
      matchCondition = Some(s"s.${q(versionCol)} > t.${q(versionCol)}"))

  private def merge(df: DataFrame, conn: Conn, table: String,
      keys: Seq[String], updateOnMatch: Boolean,
      matchCondition: Option[String] = None): Unit = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val cols = df.columns.toSeq
    val nonKeys = cols.filterNot(keys.contains)
    // unique per-merge staging name: a fixed suffix would clobber a real
    // table of that name and race concurrent merges into the same target.
    // The batch stages (and is validated) BEFORE the target is touched, so
    // a rejected batch leaves no side effect on the target — not even the
    // schema-only CREATE of the empty append below
    val stage = table + "_stage_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    append(df, conn, stage)
    val keyList = keys.map(q).mkString(", ")
    val on = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
    val setList = nonKeys.map(k => s"${q(k)} = s.${q(k)}").mkString(", ")
    val insertCols = cols.map(q).mkString(", ")
    val insertVals = cols.map(k => s"s.${q(k)}").mkString(", ")
    val matched =
      if (updateOnMatch && nonKeys.nonEmpty) {
        val cond = matchCondition.fold("")(c => s"AND $c ")
        s"WHEN MATCHED ${cond}THEN UPDATE SET $setList "
      } else ""
    val sql =
      s"MERGE INTO $table t USING $stage s ON $on " + matched +
        s"WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)"
    withConnection(conn) { c =>
      try {
        // One-row-per-key is a PRECONDITION, as it is for the Postgres ON
        // CONFLICT statements this mirrors (Postgres errors with "cannot
        // affect row a second time" on intra-batch duplicates; Derby's
        // MERGE raises a cardinality violation AFTER half-applying) —
        // checked SET-BASED on the staged batch BEFORE the merge runs, so
        // no data row ever reaches the target on violation. Remote GROUP
        // BY on the (batch-sized) staging table instead of a Spark-side
        // distinct aggregate: one fewer full Spark job per merge (the
        // former df.agg re-scanned the whole input frame), and the check
        // runs adjacent to the data it guards.
        val dupStmt = c.createStatement()
        val hasDup =
          try {
            val rs = dupStmt.executeQuery(
              s"SELECT $keyList FROM $stage GROUP BY $keyList " +
                "HAVING COUNT(*) > 1 FETCH FIRST 1 ROWS ONLY")
            try rs.next() finally rs.close()
          } finally dupStmt.close() // an open ResultSet blocks DROP TABLE
        if (hasDup)
          throw new IllegalArgumentException(
            s"requirement failed: merge batch has duplicate key rows on " +
              s"(${keys.mkString(", ")}); pre-aggregate to one row per key " +
              "(e.g. keep-latest) before upserting")
        // batch validated — NOW ensure the target exists with the incoming
        // schema (empty append is a no-op on data but creates the table
        // with the declared column types)
        append(df.limit(0), conn, table)
        c.createStatement().execute(sql)
      } finally c.createStatement().execute(s"DROP TABLE $stage")
    }
  }

  /** Read the table as a DataFrame; filters composed on top push into the
    * remote WHERE clause (JDBC scan `PushedFilters`).
    */
  def read(spark: SparkSession, conn: Conn, table: String): DataFrame =
    spark.read.jdbc(conn.url, table, props(conn))

  /** Partitioned parallel read: one remote query per predicate, so a large
    * table scans with `predicates.length` concurrent connections (the
    * read-side mirror of the parallel append).
    */
  def readPartitioned(spark: SparkSession, conn: Conn, table: String,
      predicates: Seq[String]): DataFrame =
    spark.read.jdbc(conn.url, table, predicates.toArray, props(conn))
}
