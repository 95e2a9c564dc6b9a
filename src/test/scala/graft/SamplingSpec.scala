package graft

import org.apache.spark.sql.functions._

import graft.functions.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = spark.range(20000).select(col("id"))

  test("hash samples are proportional, stable, and nested") {
    val s10 = Sampling.hashSample(ids.toDF(), "id", 0.10)
    val s01 = Sampling.hashSample(ids.toDF(), "id", 0.01)
    val n10 = s10.count().toDouble
    val n01 = s01.count().toDouble
    assert(math.abs(n10 / 20000 - 0.10) < 0.01, s"10% sample was ${n10 / 20000}")
    assert(math.abs(n01 / 20000 - 0.01) < 0.005, s"1% sample was ${n01 / 20000}")
    // stability: same sample twice
    assert(s10.collect().map(_.getLong(0)).toSet ===
      Sampling.hashSample(ids.toDF(), "id", 0.10).collect().map(_.getLong(0)).toSet)
    // nesting: 1% ⊆ 10%
    val set10 = s10.collect().map(_.getLong(0)).toSet
    assert(s01.collect().map(_.getLong(0)).forall(set10.contains))
  }

  test("sharded export: bounded shard sizes, global order, stable interleave") {
    import graft.functions.Sharding
    val df = spark.range(0, 537).select(col("id").as("doc_id"),
      Sharding.shuffleKey(col("id")).as("k"))
    val out = tempDir("shards")
    val files = Sharding.writeShards(df, out, "k", rowsPerShard = 100)
    assert(files >= 6, s"537 rows at <=100/shard needs >=6 files, got $files")
    val back = spark.read.parquet(out)
    assert(back.count() === 537L)
    // every file respects the bound
    import org.apache.spark.sql.functions.input_file_name
    val perFile = back.groupBy(input_file_name()).count().collect().map(_.getLong(1))
    assert(perFile.forall(_ <= 100L), s"oversized shard: ${perFile.max}")
    // the interleave key is deterministic across runs
    val again = spark.range(0, 537).select(Sharding.shuffleKey(col("id")).as("k"))
      .collect().map(_.getLong(0))
    val first = df.select("k").collect().map(_.getLong(0))
    assert(first.sameElements(again))
  }

  test("token-budget mixing caps the big stratum, keeps the small one whole") {
    val df = spark.range(0, 1000).select(col("id"),
      when(col("id") < 900, "big").otherwise("rare").as("src"),
      lit(10L).as("nt"))
    // big: 9000 tokens → rate 1000/9000 ≈ 0.111; rare: 1000 ≤ budget → rate 1
    val out = Sampling.tokenBudgetSample(df, "id", "src", "nt", budget = 1000L)
    val by = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by("rare") === 100L, s"small stratum must be kept whole, got ${by("rare")}")
    assert(math.abs(by("big") / 900.0 - 0.111) < 0.05,
      s"big stratum rate ${by("big") / 900.0} far from budget/total")
    // determinism: the same call keeps the same rows
    val ids = out.select("id").collect().map(_.getLong(0)).toSet
    val again = Sampling.tokenBudgetSample(df, "id", "src", "nt", budget = 1000L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids === again)
  }

  test("stratified fractions apply per stratum, default drops") {
    val df = spark.range(10000)
      .select(col("id"), (col("id") % 2 === 0).cast("string").as("s"))
    val out = Sampling.stratifiedHashSample(df, "id", "s",
      Map("true" -> 0.5, "false" -> 0.05))
    val byStratum = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byStratum("true") / 5000.0 - 0.5) < 0.05)
    assert(math.abs(byStratum("false") / 5000.0 - 0.05) < 0.02)
    val none = Sampling.stratifiedHashSample(df, "id", "s", Map("true" -> 0.1))
    assert(none.filter(col("s") === "false").count() === 0L, "default 0 drops stratum")
  }

  test("weighted sample: deterministic, k-sized, dominated by heavy weights") {
    val df = spark.range(0, 200).select(col("id"),
      when(col("id") === 7, 1000000L).otherwise(1L).as("w"))
    val out = Sampling.weightedSample(df, "id", "w", k = 10)
    val ids = out.select("id").collect().map(_.getLong(0)).toSet
    assert(ids.size === 10)
    // rank = ln(u)/w with u ∈ [5e-5, 0.99995]: the 10⁶-weight row's rank
    // (≥ −1e-5) beats every weight-1 row (≤ −5e-5) — always selected
    assert(ids.contains(7L), "heavy row must be in the sample")
    val again = Sampling.weightedSample(df, "id", "w", k = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids === again, "weighted sample must be deterministic")
    // uniform weights degrade to plain deterministic sampling of k rows
    val uni = Sampling.weightedSample(
      spark.range(0, 200).select(col("id"), lit(5L).as("w")), "id", "w", k = 15)
    assert(uni.count() === 15L)
    // non-positive weights are excluded, never ranked (a zero weight would
    // null the rank and engines disagree on NULL ordering)
    val zeros = Sampling.weightedSample(
      spark.range(0, 20).select(col("id"),
        when(col("id") < 15, 0L).otherwise(1L).as("w")), "id", "w", k = 10)
    assert(zeros.count() === 5L)
    assert(zeros.collect().forall(_.getLong(1) === 1L))
  }

  test("epoch shuffle: per-epoch permutation, contiguous shard positions, " +
      "epochs independent, deterministic") {
    val docs = spark.range(0, 300).select(col("id").as("doc_id"))
    val out = Sampling.epochShuffle(docs, "doc_id", epochs = 2, nShards = 8)
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getInt(2), r.getInt(3)))
    // each epoch is a full permutation: every key exactly once
    (0 to 1).foreach { e =>
      val keys = rows.filter(_._2 == e).map(_._1)
      assert(keys.length === 300 && keys.toSet.size === 300,
        s"epoch $e must cover every key once")
    }
    // positions are contiguous 1..n within every (epoch, shard)
    rows.groupBy(r => (r._2, r._3)).foreach { case ((e, sh), g) =>
      val pos = g.map(_._4).sorted
      assert(pos.toSeq === (1 to g.length).toSeq,
        s"epoch $e shard $sh positions not contiguous")
    }
    // the two epochs present the data in different orders
    def order(e: Int) = rows.filter(_._2 == e)
      .sortBy(r => (r._3, r._4)).map(_._1).toSeq
    assert(order(0) !== order(1), "epochs must be independent permutations")
    // and the whole assignment is deterministic across invocations
    val again = Sampling.epochShuffle(docs, "doc_id", epochs = 2, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(rows.sortBy(identity).toSeq === again.sortBy(identity).toSeq)
  }
}
