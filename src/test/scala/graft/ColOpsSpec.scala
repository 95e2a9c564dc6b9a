package graft

import org.apache.spark.sql.functions._

import graft.functions.ColOps

class ColOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bindLet preserves semantics, including null input") {
    val df = Seq(Some("a b c"), None).toDF("s")
    val out = df.select(
      ColOps.bindLet(split(col("s"), " ", -1), ws => size(ws) * 10).as("n"))
      .collect()
    assert(out(0).getInt(0) === 30)
    assert(out(1).isNullAt(0), "null flows through the let binding")
  }

  test("bindLet over an expensive expr equals the inline form") {
    val df = (1 to 100).map(i => s"w$i " * (i % 7 + 1)).toDF("text")
    val inline = df.select(size(array_distinct(split(trim(col("text")), " ", -1))).as("n"))
      .collect().map(_.getInt(0)).toSeq
    val bound = df.select(
      ColOps.bindLet(split(trim(col("text")), " ", -1),
        ws => size(array_distinct(ws))).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(bound === inline)
  }

  test("parallelize raises partition count only when below default parallelism") {
    val one = spark.range(100).coalesce(1).toDF()
    assert(ColOps.parallelize(one).rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    val many = spark.range(100).repartition(32).toDF()
    assert(ColOps.parallelize(many).rdd.getNumPartitions === 32, "no-op when already wide")
  }
}
