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
}
