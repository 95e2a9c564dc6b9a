package graft

import org.apache.spark.sql.functions._

/** Approximate-distinct (HLL++) — the sketch path for cardinality at 100 TB,
  * where exact countDistinct's shuffle is the bottleneck. Pins the accuracy
  * contract so the engine can document when the sketch substitutes for the
  * exact form.
  */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct stays within the configured error bound") {
    val n = 50000L
    val df = spark.range(n).select((col("id") % 20000).as("k"))
    val exact = df.select(countDistinct(col("k"))).collect()(0).getLong(0)
    val approx = df.select(approx_count_distinct(col("k"), rsd = 0.02))
      .collect()(0).getLong(0)
    assert(exact === 20000L)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.05, s"HLL error $err above 5% (approx=$approx exact=$exact)")
  }

  test("approx quantile brackets the exact percentile") {
    val df = spark.range(10000).select(col("id").cast("double").as("v"))
    val Array(q) = df.stat.approxQuantile("v", Array(0.5), 0.01)
    assert(math.abs(q - 4999.5) < 10000 * 0.02, s"median approx $q too far from 4999.5")
  }
}
