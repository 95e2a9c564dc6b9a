package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.store.Scd2

/** SCD-2 dimension history semantics (store/Scd2.scala): run collapsing,
  * interval chaining, and the incremental-merge ≡ from-scratch equivalence
  * that k10_scd2_merge pins under the driver's hash gate.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val feed = Seq(
    (1L, "bronze", ts("2026-01-01 00:00:00"), 1L),
    (1L, "bronze", ts("2026-01-02 00:00:00"), 2L), // same status: collapses
    (1L, "silver", ts("2026-01-03 00:00:00"), 3L),
    (1L, "gold", ts("2026-01-05 00:00:00"), 4L),
    (2L, "bronze", ts("2026-01-02 00:00:00"), 5L),
    (2L, "gold", ts("2026-01-04 00:00:00"), 6L)
  ).toDF("user_id", "status", "ts", "event_id")

  test("history collapses runs and chains validity intervals") {
    val h = Scd2.history(feed, "user_id", "status", "ts", Seq("event_id"))
      .orderBy("user_id", "valid_from").collect()
    assert(h.length === 5) // user 1: bronze/silver/gold; user 2: bronze/gold
    val u1 = h.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(1)).toSeq === Seq("bronze", "silver", "gold"))
    // bronze run keeps the FIRST ts and closes at silver's start
    assert(u1(0).getTimestamp(2) === ts("2026-01-01 00:00:00"))
    assert(u1(0).getTimestamp(3) === ts("2026-01-03 00:00:00"))
    assert(!u1(0).getBoolean(4))
    // the open current row has null valid_to
    assert(u1(2).isNullAt(3) && u1(2).getBoolean(4))
  }

  test("merge of a split feed equals history of the full feed") {
    val cut = ts("2026-01-03 12:00:00")
    val dim = Scd2.history(feed.filter($"ts" < cut),
      "user_id", "status", "ts", Seq("event_id"))
    val merged = Scd2.merge(dim, feed.filter($"ts" >= cut),
      "user_id", "status", "ts", Seq("event_id"))
    val full = Scd2.history(feed, "user_id", "status", "ts", Seq("event_id"))
    // exact multiset equality in both directions — union-distinct counting
    // would pass a merge that duplicates one interval and loses another
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty,
      "merge must reproduce the from-scratch history exactly")
  }

  test("merge extends an open run when the batch repeats the current status") {
    val dim = Scd2.history(feed, "user_id", "status", "ts", Seq("event_id"))
    val batch = Seq((1L, "gold", ts("2026-01-08 00:00:00"), 9L))
      .toDF("user_id", "status", "ts", "event_id")
    val merged = Scd2.merge(dim, batch, "user_id", "status", "ts", Seq("event_id"))
    // no new interval: user 1's gold run stays one open row from Jan 5
    val u1 = merged.filter($"user_id" === 1L).orderBy("valid_from").collect()
    assert(u1.length === 3)
    assert(u1(2).getString(1) === "gold")
    assert(u1(2).getTimestamp(2) === ts("2026-01-05 00:00:00"))
    assert(u1(2).isNullAt(3))
  }

  test("merge inserts a brand-new key as its own open run") {
    val dim = Scd2.history(feed, "user_id", "status", "ts", Seq("event_id"))
    val batch = Seq((9L, "bronze", ts("2026-01-10 00:00:00"), 11L))
      .toDF("user_id", "status", "ts", "event_id")
    val merged = Scd2.merge(dim, batch, "user_id", "status", "ts", Seq("event_id"))
    assert(merged.count() === dim.count() + 1)
    val u9 = merged.filter($"user_id" === 9L).collect()
    assert(u9.length === 1 && u9(0).getString(1) === "bronze" && u9(0).isNullAt(3))
  }

  test("merge leaves untouched keys byte-identical and closes changed runs") {
    val dim = Scd2.history(feed, "user_id", "status", "ts", Seq("event_id"))
    val batch = Seq((2L, "platinum", ts("2026-01-09 00:00:00"), 10L))
      .toDF("user_id", "status", "ts", "event_id")
    val merged = Scd2.merge(dim, batch, "user_id", "status", "ts", Seq("event_id"))
    // user 1 untouched
    val u1Before = dim.filter($"user_id" === 1L).orderBy("valid_from").collect()
    val u1After = merged.filter($"user_id" === 1L).orderBy("valid_from").collect()
    assert(u1Before.toSeq === u1After.toSeq)
    // user 2's gold run closed at the platinum start; platinum now current
    val u2 = merged.filter($"user_id" === 2L).orderBy("valid_from").collect()
    assert(u2.length === 3)
    assert(u2(1).getString(1) === "gold")
    assert(u2(1).getTimestamp(3) === ts("2026-01-09 00:00:00"))
    assert(u2(2).getString(1) === "platinum" && u2(2).isNullAt(3))
  }

  test("null attribute values are real runs: change-to-null kept, consecutive nulls collapse") {
    // regression: `prev =!= attr` is three-valued — a change TO null
    // evaluated NULL and dropped the run start (the cleared period was
    // silently attributed to the previous value), while consecutive nulls
    // each opened a spurious run
    val f = Seq(
      (1L, Option("A"), ts("2026-01-01 00:00:00"), 1L),
      (1L, Option.empty[String], ts("2026-01-02 00:00:00"), 2L), // cleared
      (1L, Option.empty[String], ts("2026-01-03 00:00:00"), 3L), // still cleared
      (1L, Option("A"), ts("2026-01-04 00:00:00"), 4L)           // restored
    ).toDF("user_id", "status", "ts", "event_id")
    val h = Scd2.history(f, "user_id", "status", "ts", Seq("event_id"))
      .orderBy("valid_from").collect()
    assert(h.length === 3, s"A / null / A = three runs, got ${h.length}")
    assert(h(0).getString(1) === "A" && h(0).getTimestamp(3) === ts("2026-01-02 00:00:00"))
    assert(h(1).isNullAt(1), "the cleared-to-null period must be its own run")
    assert(h(1).getTimestamp(2) === ts("2026-01-02 00:00:00"))
    assert(h(1).getTimestamp(3) === ts("2026-01-04 00:00:00"))
    assert(h(2).getString(1) === "A" && h(2).isNullAt(3))
  }
}
