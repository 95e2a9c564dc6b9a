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
    // NOT over an opaque child still keeps everything
    val (keptNotOpaque, _) = st.planStatsWhere(v, !(abs(col("x")) < 100))
    assert(keptNotOpaque === total)
    assert(st.readWhere(v, !(abs(col("x")) < 100)).count() === 9900L)
  }

  test("NOT pushes through ranges and boolean structure (De Morgan)") {
    val (st, v) = rangeStore("push-not")
    // !(x < 9900) ≡ x >= 9900: must prune like the flipped comparison
    val (kept, total) = st.planStatsWhere(v, !(col("x") < 9900))
    assert(kept < total, s"negated range must prune ($kept/$total)")
    assert(st.readWhere(v, !(col("x") < 9900)).count() === 100L)
    // De Morgan over OR: !(x < 100 || x >= 200) ≡ x >= 100 && x < 200
    val cond = !(col("x") < 100 || col("x") >= 200)
    val (k2, _) = st.planStatsWhere(v, cond)
    assert(k2 < total)
    assert(st.readWhere(v, cond).count() === 100L)
    // !(k != lit) ≡ k = lit: the double negation reaches the bloom layer
    val neq = !(col("k") =!= "k9999")
    assert(st.readWhere(v, neq).count() === 1L)
    // a bare != prunes nothing but stays exact
    assert(st.readWhere(v, col("k") =!= "k9999").count() === 9999L)
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

  test("numeric literals convert soundly: exact ones prune, inexact ones keep") {
    val st = new SnapshotStore(spark, tempDir("push-nullcast") + "/snap", "x",
      bloomCols = Seq("id"))
    val v = st.commit(spark.range(0, 2000).select(
      (col("id") % 7).cast("double").as("x"), col("id"))
      .repartition(8, col("id")))
    // 42.0 is exactly the long 42, and the coerced (double-widened)
    // predicate matches exactly rows id == 42 — the probe hashes the
    // native long and prunes (r15; the r14 try_cast discipline kept)
    assert(st.readWhere(v, col("id") === 42.0).count() === 1L,
      "a double literal against a long column must coerce, never lose the row")
    val (kept, total) = st.planStatsWhere(v, col("id") === 42.0)
    assert(kept < total, s"an exact-valued double probe must prune ($kept/$total)")
    // 42.5 can match no long at all and a >2^53 double maps to MANY longs
    // — neither may produce a wrong-but-present hash; fractional ones may
    // skip everything (sound: no satisfying row exists), oversized ones
    // must conservatively keep
    assert(st.readWhere(v, col("id") === 42.5).count() === 0L)
    val (keptBig, totalBig) = st.planStatsWhere(v, col("id") === 1.0e17)
    assert(keptBig === totalBig,
      "a beyond-2^53 double maps to many longs — no probe, conservative keep")
  }

  test("driver-local probe hashes are bit-identical to xxhash64() per type") {
    import org.apache.spark.sql.types._
    val ts = java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789")
    val dt = java.sql.Date.valueOf("2024-03-01")
    val cases: Seq[(Any, DataType, org.apache.spark.sql.Column)] = Seq(
      (42L, LongType, lit(42L)),
      (-7L, LongType, lit(-7L)),
      (42, IntegerType, lit(42)),
      (7.toShort, ShortType, lit(7.toShort)),
      (3.toByte, ByteType, lit(3.toByte)),
      ("k9999", StringType, lit("k9999")),
      ("", StringType, lit("")),
      ("héllo→", StringType, lit("héllo→")),
      (4.5d, DoubleType, lit(4.5d)),
      (-0.0d, DoubleType, lit(-0.0d)),
      (0.0d, DoubleType, lit(0.0d)),
      (4.5f, FloatType, lit(4.5f)),
      (-0.0f, FloatType, lit(-0.0f)),
      (ts, TimestampType, lit(ts)),
      (dt, DateType, lit(dt)))
    cases.foreach { case (v, t, c) =>
      val expected = spark.range(1).select(xxhash64(c)).head.getLong(0)
      val got = SnapshotStore.probeHash(v, t)
      assert(got === Some(expected), s"probeHash($v, $t)")
    }
    // the sound-conversion refusals: fractional vs integral, numeric vs
    // string (coerces numerically — "042" matches 42 but hashes apart)
    assert(SnapshotStore.probeHash(42.5d, LongType).isEmpty)
    assert(SnapshotStore.probeHash(1.0e17, LongType).isEmpty)
    assert(SnapshotStore.probeHash(42, StringType).isEmpty)
    assert(SnapshotStore.probeHash("42.0", LongType).isEmpty)
    assert(SnapshotStore.probeHash(100000, ShortType).isEmpty)
  }

  test("scan planning runs zero Spark jobs") {
    val (st, v) = rangeStore("push-nojobs")
    st.planStatsWhere(v, col("x").between(0, 10)) // warm footers/sidecars
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val (kept, total) = st.planStatsWhere(v,
        col("x").between(100, 800) && col("k").isin("k150", "k9999"))
      assert(kept < total)
      // listener delivery is async; give the bus a moment to drain
      Thread.sleep(1000)
      assert(jobs.get() === 0,
        "probe hashing must be driver-local — no plan-time Spark job")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("double, timestamp and int-probed-long columns bloom-skip files") {
    import spark.implicits._
    // doubles and timestamps hash-distributed across files: zones keep
    // everything, only the (r15) typed bloom probes can skip
    val st = new SnapshotStore(spark, tempDir("push-dblts") + "/snap", "x",
      bloomCols = Seq("d", "t"))
    val base = spark.range(0, 8000).select(
      (col("id") % 13).cast("double").as("x"),
      (col("id") * 1.5).as("d"),
      timestamp_micros(col("id") * 1000000L + lit(1700000000000000L)).as("t"))
    val v = st.commit(base.repartition(16, col("id")))
    val (kd, total) = st.planStatsWhere(v, col("d") === 4242.0 * 1.5)
    assert(kd < total, s"double bloom probe must skip ($kd/$total)")
    assert(st.readWhere(v, col("d") === 4242.0 * 1.5).count() === 1L)
    val probe = new java.sql.Timestamp((1700000000000000L + 4242L * 1000000L) / 1000L)
    val (kt, _) = st.planStatsWhere(v, col("t") === probe)
    assert(kt < total, s"timestamp bloom probe must skip ($kt/$total)")
    assert(st.readWhere(v, col("t") === probe).count() === 1L)
  }

  test("string column probed with a numeric literal keeps, never skips (r14 advice)") {
    import spark.implicits._
    // rows whose string forms all numerically equal 42: Spark coerces
    // string-vs-numeric comparisons numerically (ANSI: cast the string
    // side), so col === 42 matches every one of them — but their stored
    // hashes are hash("042") etc., so ANY probe hash would bloom-skip
    // satisfying rows. The planner must drop non-string probes against
    // string columns entirely.
    val st = new SnapshotStore(spark, tempDir("push-strnum") + "/snap", "x",
      bloomCols = Seq("s"))
    val df = Seq(("042", 1L), ("0042", 2L), (" 42", 3L), ("42", 4L), ("7", 5L))
      .toDF("s", "x")
    val v = st.commit(df.repartition(4, col("x")))
    val cond = col("s") === 42
    assert(st.readWhere(v, cond).collect().map(_.getLong(1)).sorted
      === st.readAt(v).filter(cond).collect().map(_.getLong(1)).sorted,
      "readWhere must equal read().filter under numeric coercion")
    val (kept, total) = st.planStatsWhere(v, cond)
    assert(kept === total, "a numeric probe against a string column keeps all")
    // a STRING probe still prunes exactly
    val (ks, _) = st.planStatsWhere(v, col("s") === "42")
    assert(ks <= total)
    assert(st.readWhere(v, col("s") === "42").count() === 1L)
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

  // ---- r17: STRING ZONE BOUNDS (the prefix projection) -----------------

  test("strOrd word tuples are byte-lex monotone (the zone soundness property)") {
    val samples = Seq("", "a", "ab", "abcdef", "abcdefg", "abcdeg",
      "doc-000000000001", "doc-000000000002", "doc-999999999999",
      "zzzzzz", "\u03a9\u00fcn\u00efcode", "k9999", "doc-", "DOC-X", "0042", " 42",
      "doc-00000001", "doc-00020000", "doc-00029999", "doc-00030000")
    // monotone under unsigned-byte lexicographic order (Spark's string
    // ordering, and the order its min/max aggregates use)
    def lex(a: String, b: String): Boolean = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length <= y.length
    }
    def tup(s: String): Seq[Double] =
      (0 until SnapshotStore.StrWords).map(w => SnapshotStore.strOrdWord(s, w))
    for (a <- samples; b <- samples if lex(a, b)) {
      assert(SnapshotStore.strOrd(a) <= SnapshotStore.strOrd(b),
        s"word-1 projection order broke for '$a' <= '$b'")
      assert(SnapshotStore.lexLE(tup(a), tup(b)),
        s"tuple projection order broke for '$a' <= '$b'")
    }
    // the tuple DISCRIMINATES ids sharing a long constant prefix — the
    // case a single 48-bit word cannot (everything before byte 6 equal)
    assert(!SnapshotStore.lexLE(tup("doc-000000000002"), tup("doc-000000000001")))
    assert(SnapshotStore.strOrd("doc-000000000001") ===
      SnapshotStore.strOrd("doc-000000000002")) // word 1 alone cannot
  }

  // doc-id table: 4 batches × 8 files, ids zero-padded so byte-lex order
  // matches numeric order — the realistic clustered-crawl layout
  private def docStore(name: String): (SnapshotStore, Long) = {
    val st = new SnapshotStore(spark, tempDir(name) + "/snap", "x",
      secondaryStats = Seq("doc"), bloomCols = Seq("doc"))
    val df = spark.range(0, 40000).select(col("id").as("x"),
      concat(lit("doc-"), lpad(col("id").cast("string"), 8, "0")).as("doc"))
    (0 until 4).foreach { b =>
      st.commit(df.filter(col("x") >= b * 10000L && col("x") < (b + 1) * 10000L)
        .repartitionByRange(8, col("x")))
    }
    (st, st.latestVersion.get)
  }

  test("wide string IN: clustered keys prune through projected zones") {
    val (st, v) = docStore("push-widestr")
    // 10,001 keys (> InProbeCap) all from batch 2's id range
    val keys: Seq[Any] = (20000 until 30001).map(i => f"doc-$i%08d")
    val cond = col("doc").isin(keys: _*)
    val (kept, total) = st.planStatsWhere(v, cond)
    assert(total === 32)
    assert(kept <= 10,
      s"clustered wide string IN must prune to ~one batch ($kept/$total)")
    assert(st.readWhere(v, cond).count() === 10001L)
    assert(st.readWhere(v, cond).count() ===
      st.readAt(v).filter(cond).count())
  }

  test("wide string IN under NOT: no pruning, exact result") {
    val (st, v) = docStore("push-widestr-not")
    val keys: Seq[Any] = (20000 until 30001).map(i => f"doc-$i%08d")
    val cond = !col("doc").isin(keys: _*)
    val (kept, total) = st.planStatsWhere(v, cond)
    assert(kept === total,
      "a negated wide IN is not a required conjunct — must keep all")
    assert(st.readWhere(v, cond).count() === 40000L - 10001L)
  }

  test("wide string IN: string range predicates prune the same zones") {
    val (st, v) = docStore("push-strrange")
    // an ordinary string range on the projected column zones-prunes too
    val cond = col("doc") >= "doc-00020000" && col("doc") < "doc-00030000"
    val (kept, total) = st.planStatsWhere(v, cond)
    assert(kept <= 10, s"string range must zone-prune ($kept/$total)")
    assert(st.readWhere(v, cond).count() === 10000L)
    assert(st.readWhere(v, cond).count() ===
      st.readAt(v).filter(cond).count())
  }

  test("cross-typed literal against a string-projected column keeps all") {
    val (st, v) = docStore("push-strcross")
    // numeric literal on the projected column: its SQL semantics go
    // through implicit casts the projection knows nothing about — the
    // planner must refuse (plan only; executing would ANSI-fail the cast)
    val (kept, total) = st.planStatsWhere(v, col("doc") > 5)
    assert(kept === total)
  }

  test("string zones survive a metadata-only delete (marker carry)") {
    val (st, v) = docStore("push-strcarry")
    // keyed MoR delete: metadata-only commit, no staged batch, strStats
    // must carry from the previous manifest
    val v2 = st.deleteWhere(col("doc") === "doc-00020007", 1.0).get
    assert(v2 === v + 1)
    val keys: Seq[Any] = (20000 until 30001).map(i => f"doc-$i%08d")
    val (kept, total) = st.planStatsWhere(v2, col("doc").isin(keys: _*))
    assert(kept <= 10,
      s"marker must survive the metadata-only commit ($kept/$total)")
    assert(st.readWhere(v2, col("doc").isin(keys: _*)).count() === 10000L)
  }
}
