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
}
