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

  test("bloom sketch: zero false negatives, bounded false positives, codegen == scala") {
    import graft.functions.BloomSketch
    val keys = spark.range(0, 5000).toDF("k")
    val words = BloomSketch.build(keys, col("k"), BloomSketch.sizeBits(5000))
    val missed = keys.filter(!BloomSketch.mightContain(col("k"), words, 5)).count()
    assert(missed === 0L, s"bloom dropped $missed inserted keys (false negatives)")
    // disjoint probe space: fp rate must stay near the 10-bits/key design point
    val fp = spark.range(1000000, 1100000).toDF("k")
      .filter(BloomSketch.mightContain(col("k"), words, 5)).count()
    assert(fp < 5000L, s"false-positive rate ${fp / 100000.0} way above design point")
    // the codegen'd probe agrees with the driver-side scala fold
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.LongType
    val viaDf = keys.limit(100).filter(BloomSketch.mightContain(col("k"), words, 5))
      .count()
    val viaScala = (0L until 100L).count(k =>
      BloomSketch.contains(words, 5, XxHash64Function.hash(k, LongType, 42L)))
    assert(viaDf === viaScala.toLong)
  }

  test("bloom-pruned join returns exactly the plain join") {
    import graft.functions.BloomSketch
    val big = spark.range(0, 20000)
      .select(col("id").as("k"), (col("id") * 7 % 100).as("v"))
    val small = spark.range(0, 1000)
      .select((col("id") * 13 % 3000).as("bk")).distinct()
    val plain = big.join(small, col("k") === col("bk"))
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pruned = BloomSketch.prunedJoin(big, "k", small, "bk")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned === plain)
    assert(plain.nonEmpty, "degenerate test: plain join came back empty")
  }
}
