package graft

import org.apache.spark.sql.functions._

import graft.store.JdbcStore
import graft.store.JdbcStore.Conn

/** JDBC store against embedded Derby (bundled with Spark): parallel batch
  * append, `ON CONFLICT DO NOTHING`-style insert-if-absent, latest-wins
  * upsert via set-based MERGE, and filter pushdown into the remote scan.
  */
class JdbcStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dbDir =
    java.nio.file.Files.createTempDirectory("jdbc_store").toString
  private def conn(types: String = "") = Conn(
    url = s"jdbc:derby:$dbDir/db;create=true",
    columnTypes = if (types.isEmpty) None else Some(types))

  private val strTypes = "source VARCHAR(64)"

  test("append: executor-parallel batch insert, table auto-created") {
    val df = (1L to 100L).map(i => (i, i * 2.0, s"src${i % 3}"))
      .toDF("id", "value", "source").repartition(4)
    JdbcStore.append(df, conn(strTypes), "grid_rows")
    val back = JdbcStore.read(spark, conn(), "grid_rows")
    assert(back.count() === 100L)
    assert(back.agg(sum("value")).head().getDouble(0) === (1 to 100).map(_ * 2.0).sum)
  }

  test("insertIfAbsent: repeated batches are idempotent (DO NOTHING)") {
    val batch = (1L to 20L).map(i => (i, s"file$i")).toDF("id", "s3_key")
    val c = conn("s3_key VARCHAR(64)")
    JdbcStore.insertIfAbsent(batch, c, "raw_files", Seq("id"))
    JdbcStore.insertIfAbsent(batch, c, "raw_files", Seq("id")) // re-run: no dupes
    val overlap = (11L to 30L).map(i => (i, s"NEW$i")).toDF("id", "s3_key")
    JdbcStore.insertIfAbsent(overlap, c, "raw_files", Seq("id"))
    val back = JdbcStore.read(spark, c, "raw_files").cache()
    assert(back.count() === 30L)
    // existing rows kept their ORIGINAL values (insert-only semantics)
    assert(back.filter(col("id") === 15L).head().getString(1) === "file15")
    assert(back.filter(col("id") === 25L).head().getString(1) === "NEW25")
    back.unpersist()
  }

  test("upsert: matched rows take incoming values (DO UPDATE), unmatched insert") {
    val v1 = (1L to 10L).map(i => (i, "v1", i.toDouble)).toDF("id", "ver", "value")
    val c = conn("ver VARCHAR(8)")
    JdbcStore.upsert(v1, c, "curated", Seq("id"))
    val v2 = (6L to 15L).map(i => (i, "v2", i * 10.0)).toDF("id", "ver", "value")
    JdbcStore.upsert(v2, c, "curated", Seq("id"))
    val back = JdbcStore.read(spark, c, "curated").cache()
    assert(back.count() === 15L)
    assert(back.filter(col("ver") === "v2").count() === 10L) // 6-15 updated/inserted
    assert(back.filter(col("id") === 6L).head().getDouble(2) === 60.0)
    assert(back.filter(col("id") === 3L).head().getDouble(2) === 3.0)
    back.unpersist()
  }

  test("upsertVersioned: a replayed OLD batch never clobbers newer rows") {
    val day2 = (1L to 10L).map(i => (i, 2L, i * 100.0)).toDF("id", "version", "value")
    val c = conn("")
    JdbcStore.upsertVersioned(day2, c, "versioned", Seq("id"), "version")
    // yesterday's batch replays AFTER today's load (the backfill/retry
    // reality) — ReplacingMergeTree semantics: last VERSION wins, not last
    // writer, so ids 1-10 keep day-2 values and only 11-12 insert
    val day1 = (1L to 12L).map(i => (i, 1L, i * 1.0)).toDF("id", "version", "value")
    JdbcStore.upsertVersioned(day1, c, "versioned", Seq("id"), "version")
    val back = JdbcStore.read(spark, c, "versioned").cache()
    assert(back.count() === 12L)
    assert(back.filter(col("id") === 5L).head().getDouble(2) === 500.0,
      "a stale replay must not overwrite the newer version")
    assert(back.filter(col("id") === 5L).head().getLong(1) === 2L)
    assert(back.filter(col("id") === 11L).head().getDouble(2) === 11.0,
      "genuinely new keys from the old batch still insert")
    // a genuinely newer version DOES update
    val day3 = Seq((5L, 3L, 5000.0)).toDF("id", "version", "value")
    JdbcStore.upsertVersioned(day3, c, "versioned", Seq("id"), "version")
    assert(JdbcStore.read(spark, c, "versioned")
      .filter(col("id") === 5L).head().getDouble(2) === 5000.0)
    back.unpersist()
  }

  test("merge rejects intra-batch duplicate keys before touching the target") {
    // mirrors Postgres: ON CONFLICT errors on a batch affecting one row
    // twice — fail fast locally instead of a mid-merge remote error
    val dup = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("id", "v")
    val c = conn("v VARCHAR(8)")
    val e = intercept[IllegalArgumentException] {
      JdbcStore.upsert(dup, c, "dup_target", Seq("id"))
    }
    assert(e.getMessage.contains("duplicate key"))
  }

  test("read pushes filters into the remote scan; partitioned read splits") {
    val df = JdbcStore.read(spark, conn(), "grid_rows").filter(col("value") > 100.0)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("value"),
      s"filter must reach the JDBC scan:\n$scan")
    assert(df.count() === 50L)
    // predicates are remote-side SQL: quote to match Spark's quoted
    // (case-exact) column creation
    val part = JdbcStore.readPartitioned(spark, conn(), "grid_rows",
      Seq("\"id\" <= 50", "\"id\" > 50"))
    assert(part.rdd.getNumPartitions === 2)
    assert(part.count() === 100L)
  }
}
