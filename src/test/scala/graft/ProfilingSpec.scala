package graft

import org.apache.spark.sql.functions._

import graft.functions.Profiling

/** Column profiling and portable cardinality estimation. */
class ProfilingSpec extends SparkSpec {

  test("profile: nulls, distincts, and min/max per column") {
    val df = spark.range(0, 100).select(
      col("id"),
      when(col("id") % 10 === 0, lit(null)).otherwise(col("id") % 7).as("m"))
    val rows = Profiling.profile(df, Seq("id", "m")).orderBy("column").collect()
    val id = rows(0)
    assert(id.getString(0) === "id" && id.getLong(1) === 100L &&
      id.getLong(2) === 0L && id.getLong(3) === 100L)
    val m = rows(1)
    assert(m.getLong(2) === 10L, "10 nulls expected")
    assert(m.getLong(3) === 7L, "7 distinct non-null values")
  }

  test("entropy: constant column scores 0, uniform column scores 1 normalized") {
    val df = spark.range(0, 64).select(
      lit("same").as("const_col"),
      (col("id") % 8).as("uniform_col"),
      when(col("id") < 57, lit("dom")).otherwise(lit("rare")).as("skew_col"))
    val rows = Profiling.entropy(df, Seq("const_col", "uniform_col", "skew_col"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(rows("const_col") === ((1L, 0.0, 0.0)))
    // 8 equally likely values: H = ln 8, normalized exactly 1
    assert(rows("uniform_col")._1 === 8L)
    assert(math.abs(rows("uniform_col")._3 - 1.0) < 1e-6)
    // heavy skew: normalized entropy well below uniform
    assert(rows("skew_col")._3 < 0.5)
  }

  test("cardinality: linear-counting estimate brackets the exact count") {
    val df = spark.range(0, 10000).select((col("id") % 100).as("v"))
    val r = Profiling.cardinality(df, Seq("v"), m = 1024).collect()(0)
    assert(r.getLong(1) === 10000L)
    val exact = r.getLong(2)
    val buckets = r.getLong(3)
    val est = r.getDouble(4)
    assert(exact === 100L)
    // with 100 values in 1024 buckets, collisions are rare: occupied ≤ exact
    // and the estimator corrects occupancy back up to ~exact
    assert(buckets <= exact)
    assert(math.abs(est - exact) / exact < 0.15,
      s"estimate $est too far from exact $exact")
  }

  test("cardinality: high-cardinality column stays within estimator error") {
    val df = spark.range(0, 2000).toDF("v") // 2000 distinct > m = 1024 buckets
    val r = Profiling.cardinality(df, Seq("v"), m = 1024).collect()(0)
    val est = r.getDouble(4)
    // linear counting still tracks cardinality past m (until saturation)
    assert(est > 1200 && est < 3200, s"estimate $est implausible for 2000 distinct")
  }

  test("histogramQuantiles: bucket quantiles bracket the exact percentiles") {
    // 1000 uniform values 0..999 per group: p50 bucket (width 10) must be 49
    // or 50, p90 ~ 89/90 — within one bucket of exact
    val df = spark.range(0, 2000).select(
      (col("id") % 2).cast("string").as("g"), (col("id") / 2).as("v"))
    val r = Profiling.histogramQuantiles(df, "g", "v", width = 10.0,
      Seq(("p50", 1, 2), ("p90", 9, 10))).orderBy("g").collect()
    r.foreach { row =>
      assert(row.getLong(1) === 1000L)
      assert(math.abs(row.getLong(2) - 50L) <= 1, s"p50 bucket ${row.getLong(2)}")
      assert(math.abs(row.getLong(3) - 90L) <= 1, s"p90 bucket ${row.getLong(3)}")
    }
  }

  test("histogramQuantiles: a single-value group lands every quantile on it") {
    val df = spark.range(0, 7).select(lit("a").as("g"), lit(42.7).as("v"))
    val r = Profiling.histogramQuantiles(df, "g", "v", width = 1.0,
      Seq(("p50", 1, 2), ("p99", 99, 100))).collect()(0)
    assert(r.getLong(1) === 7L && r.getLong(2) === 42L && r.getLong(3) === 42L)
  }

  test("cardinality: nulls are excluded from the estimate") {
    val df = spark.range(0, 50).select(
      when(col("id") < 10, lit(null)).otherwise(col("id")).as("v"))
    val r = Profiling.cardinality(df, Seq("v"), m = 256).collect()(0)
    assert(r.getLong(1) === 40L, "null rows must not count")
    assert(r.getLong(2) === 40L)
  }

  test("qualityGates: each constraint type computes its metric and verdict") {
    import Profiling._
    // 10 rows: 2 null names, ids unique, 3 codes malformed, values 0..9
    val df = spark.range(0, 10).select(
      col("id"),
      when(col("id") < 2, lit(null)).otherwise(concat(lit("n"), col("id"))).as("name"),
      when(col("id") < 3, lit("XX1")).otherwise(lit("ab")).as("code"),
      col("id").cast("double").as("v"))
    val r = qualityGates(df, Seq(
      MaxNullFrac("name_nulls", "name", 0.25),       // 0.2 <= 0.25 → pass
      MaxNullFrac("name_nulls_strict", "name", 0.1), // 0.2 > 0.1 → fail
      MinMatchFrac("code_iso", "code", "^[a-z][a-z]$", 0.5), // 0.7 → pass
      InRangeFrac("v_small", "v", 0.0, 4.0, 0.9),    // 0.5 → fail
      UniqueKey("id_unique", "id")))                 // pass
      .collect().map(x => x.getString(0) -> (x.getDouble(1), x.getBoolean(2))).toMap
    assert(r("name_nulls") === ((0.2, true)))
    assert(r("name_nulls_strict") === ((0.2, false)))
    assert(r("code_iso") === ((0.7, true)))
    assert(r("v_small") === ((0.5, false)))
    assert(r("id_unique") === ((1.0, true)))
  }

  test("qualityGates runs as ONE aggregate job; orphanCount finds exactly the orphans") {
    import Profiling._
    val df = spark.range(0, 100).select(col("id"), col("id").cast("double").as("v"))
    val gates = qualityGates(df, Seq(
      MaxNullFrac("a", "v", 0.1), InRangeFrac("b", "v", 0, 50, 0.9),
      UniqueKey("c", "id")))
    // all constraint rows project off a single aggregate — the plan has ONE
    // scan-side source relation reused, not one scan per constraint (the
    // union re-references the same aggregated frame)
    assert(gates.collect().length === 3)
    val parent = spark.range(0, 80).toDF("k")
    val child = spark.range(0, 100).toDF("k")
    val o = orphanCount(child, "k", parent, "k", "fk").collect()(0)
    assert(o.getDouble(1) === 20.0 && !o.getBoolean(2))
    val clean = orphanCount(parent, "k", child, "k", "fk2").collect()(0)
    assert(clean.getDouble(1) === 0.0 && clean.getBoolean(2))
  }
}
