package graft

import org.apache.spark.sql.functions._

import graft.store.SnapshotStore

/** Predicate-pushdown scan planning (SnapshotStore.readWhere): one Column
  * predicate drives zone pruning AND bloom probing, the result is exactly
  * read().filter(cond), and every unsupported shape degrades to
  * conservative keeps — never a lost row. The k32 driver query proves the
  * data against DuckDB; these pin the planning census and soundness.
  */
class PushdownSpec extends SparkSpec {
  import spark.implicits._

  // x range-sorted (tight zones), id equal to x (pruning correlates),
  // k strings for bloom probes
  private def rangeStore(name: String): (SnapshotStore, Long) = {
    val st = new SnapshotStore(spark, tempDir(name) + "/snap", "x",
      secondaryStats = Seq("y"), bloomCols = Seq("k"))
    val df = spark.range(0, 10000).select(
      col("id").as("x"), floor(col("id") / 100).as("y"),
      concat(lit("k"), col("id")).as("k"))
    val v = st.commit(df.repartitionByRange(16, col("x")))
    (st, v)
  }

  test("readWhere equals read().filter exactly") {
    val (st, v) = rangeStore("push-eq")
    val cond = (col("x") >= 500 && col("x") < 1500) || col("k") === "k9999"
    val a = st.readWhere(v, cond).orderBy("x").collect()
    val b = st.readAt(v).filter(cond).orderBy("x").collect()
    assert(a.toSeq === b.toSeq)
    assert(a.length === 1001)
  }

  test("range conjuncts prune through zones; AND composes") {
    val (st, v) = rangeStore("push-range")
    val (k1, total) = st.planStatsWhere(v, col("x").between(100, 800))
    assert(k1 < total, s"range must prune ($k1/$total)")
    val (k2, _) = st.planStatsWhere(v,
      col("x").between(100, 800) && col("y") >= 3)
    assert(k2 <= k1, "an AND conjunct can only narrow the plan")
    assert(st.readWhere(v, col("x").between(100, 800) && col("y") >= 3)
      .count() === 501L)
  }

  test("equality probes the bloom layer on a scattered key") {
    val st = new SnapshotStore(spark, tempDir("push-bloom") + "/snap", "x",
      bloomCols = Seq("id"))
    val v = st.commit(spark.range(0, 10000).select(
      (col("id") % 50).cast("double").as("x"), col("id"))
      .repartition(16, col("id")))
    val (kept, total) = st.planStatsWhere(v, col("id") === 4242L)
    assert(kept < total, s"bloom must skip files zones cannot ($kept/$total)")
    assert(st.readWhere(v, col("id") === 4242L).count() === 1L)
    // IN list unions the probes; literal-first equality also plans
    assert(st.readWhere(v, col("id").isin(1L, 2L, 9999L)).count() === 3L)
    assert(st.readWhere(v, lit(7L) === col("id")).count() === 1L)
  }

  test("OR keeps the union of both branches") {
    val (st, v) = rangeStore("push-or")
    val cond = col("x") < 100 || col("x") >= 9900
    val (kept, total) = st.planStatsWhere(v, cond)
    assert(kept < total)
    assert(st.readWhere(v, cond).count() === 200L)
  }

  test("unsupported shapes contribute no pruning but stay correct") {
    val (st, v) = rangeStore("push-unsupported")
    // a function over the column: the planner cannot reason about it
    val (kept, total) = st.planStatsWhere(v, abs(col("x") - 5000) < 10)
    assert(kept === total, "an opaque shape must keep everything")
    assert(st.readWhere(v, abs(col("x") - 5000) < 10).count() === 19L)
    // NOT is conservatively kept even over a plannable child
    val (keptNot, _) = st.planStatsWhere(v, !(col("x") < 100))
    assert(keptNot === total)
    assert(st.readWhere(v, !(col("x") < 100)).count() === 9900L)
  }

  test("probe literals hash under the table's physical type") {
    // an INT column: a probe written as a Scala Long must still hit,
    // because the planner casts through the stored type before hashing
    val st = new SnapshotStore(spark, tempDir("push-int") + "/snap", "x",
      bloomCols = Seq("n"))
    val v = st.commit(spark.range(0, 2000).select(
      (col("id") % 10).cast("double").as("x"), col("id").cast("int").as("n"))
      .repartition(8, col("n")))
    assert(st.readWhere(v, col("n") === 1234).count() === 1L)
    assert(st.readWhere(v, col("n") === 1234L).count() === 1L,
      "a long-typed literal against an int column must not false-negative")
    val (kept, total) = st.planStatsWhere(v, col("n") === 1234)
    assert(kept < total)
  }

  test("a probe literal that cannot cast to the column type keeps, not prunes") {
    // "42.0" cast to BIGINT is null under non-ANSI cast; xxhash64(null)
    // is the seed — a wrong-but-present hash would prune files the
    // coerced predicate actually matches. The planner must DROP the probe
    // (conservative keep) instead.
    val st = new SnapshotStore(spark, tempDir("push-nullcast") + "/snap", "x",
      bloomCols = Seq("id"))
    val v = st.commit(spark.range(0, 2000).select(
      (col("id") % 7).cast("double").as("x"), col("id"))
      .repartition(8, col("id")))
    assert(st.readWhere(v, col("id") === 42.0).count() === 1L,
      "a double literal against a long column must coerce, never lose the row")
    val (kept, total) = st.planStatsWhere(v, col("id") === 42.0)
    assert(kept === total, "an uncastable probe contributes no pruning")
  }

  test("z-ordered store: one predicate prunes on both dimensions at once") {
    val st = new SnapshotStore(spark, tempDir("push-z") + "/snap", "x",
      secondaryStats = Seq("y"))
    val grid = spark.range(0, 10000).select(
      (col("id") % 100).as("x"), floor(col("id") / 100).as("y"))
    st.commit(grid.repartitionByRange(16, col("x")))
    val v = st.clusterZOrder(Seq("x", "y"), targetFiles = 16).get
    val cond = col("x").between(10, 15) && col("y").between(10, 15)
    val (kept, total) = st.planStatsWhere(v, cond)
    assert(kept < total / 2,
      s"a 2-d box on a z-ordered table must prune hard ($kept/$total)")
    assert(st.readWhere(v, cond).count() === 36L)
  }
}
