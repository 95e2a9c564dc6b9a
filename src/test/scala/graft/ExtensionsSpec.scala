package graft

import org.apache.spark.sql.functions._

/** Native expressions exposed as SQL functions via GraftExtensions. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot and graft_simhash are SQL-callable after registration") {
    GraftExtensions.register(spark)
    Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val dot = spark.sql("SELECT graft_dot(a, b) AS d FROM vecs").collect()(0).getDouble(0)
    assert(dot === 32.0)

    Seq((1L, 100L), (1L, 200L), (1L, 300L)).toDF("id", "h")
      .createOrReplaceTempView("hashes")
    val sql = spark.sql("SELECT id, graft_simhash(h) AS s FROM hashes GROUP BY id")
      .collect()(0).getLong(1)
    val api = Seq((1L, 100L), (1L, 200L), (1L, 300L)).toDF("id", "h")
      .groupBy("id").agg(graft.functions.SimhashAgg.simhash(col("h")).as("s"))
      .collect()(0).getLong(1)
    assert(sql === api)
  }

  test("graft_bloom_contains_bytes probes a sketch table from SQL") {
    GraftExtensions.register(spark)
    import graft.functions.BloomSketch
    // one sketch row built by the aggregate, probed per-row from SQL
    Seq(1L, 2L, 3L).toDF("k")
      .select(BloomSketch.bloomAgg(xxhash64(col("k")), 1024, 5).as("bf"))
      .createOrReplaceTempView("sketch")
    Seq(1L, 2L, 3L, 999L, 1000L).toDF("k").createOrReplaceTempView("probes")
    val hits = spark.sql(
      """SELECT k, graft_bloom_contains_bytes(xxhash64(k), bf, 5) AS hit
        |FROM probes CROSS JOIN sketch""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(hits(1L) && hits(2L) && hits(3L), "no false negatives, ever")
    // 1024 bits for 3 keys: the two absent probes are overwhelmingly misses
    assert(!hits(999L) && !hits(1000L))
  }
}
