package graft

import org.apache.spark.sql.functions._

import graft.functions.Salting

/** Salting must change the distribution, never the answer. */
class SaltingSpec extends SparkSpec {
  import spark.implicits._

  // 1 hot key (90% of rows) + 100 cold keys
  private def skewed = {
    val hot = (1 to 9000).map(i => ("hot", i.toDouble))
    val cold = (1 to 1000).map(i => (s"k${i % 100}", i.toDouble))
    (hot ++ cold).toDF("k", "v").withColumn("rid", monotonically_increasing_id())
  }

  test("salted aggregation equals direct groupBy") {
    val df = skewed.cache()
    val direct = df.groupBy("k")
      .agg(count("v").as("count_v"), sum("v").as("sum_v"),
        min("v").as("min_v"), max("v").as("max_v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = Salting.saltedAgg(df, Seq("k"), saltSource = Seq("rid"),
      buckets = 8,
      aggs = Map("v" -> "sum"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, s) => assert(math.abs(s - direct(k)._2) < 1e-6) }
    df.unpersist()
  }

  test("salted join equals plain join, spreads the hot key") {
    val fact = skewed
    val dim = (Seq("hot") ++ (0 until 100).map(i => s"k$i"))
      .map(k => (k, s"meta-$k")).toDF("k", "meta")
    val plain = fact.join(dim, Seq("k")).agg(count(lit(1)), sum("v")).collect()(0)
    val salted = Salting.saltedJoin(fact, dim, "k", buckets = 8,
      factSaltSource = Seq("rid")).agg(count(lit(1)), sum("v")).collect()(0)
    assert(salted.getLong(0) === plain.getLong(0))
    assert(math.abs(salted.getDouble(1) - plain.getDouble(1)) < 1e-6)
    // the hot key's fact rows actually receive multiple distinct salts
    val spread = fact.filter($"k" === "hot")
      .select(Salting.salt(8, col("rid")).as("s"))
      .distinct().count()
    assert(spread > 4, s"hot key spread over only $spread salt buckets")
  }
}
