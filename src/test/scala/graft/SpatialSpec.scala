package graft

import org.apache.spark.sql.functions._

import graft.functions.Spatial

class SpatialSpec extends SparkSpec {
  import spark.implicits._

  test("haversine oracle: Berlin→Paris ≈ 878 km, zero for same point") {
    val df = Seq(
      (52.52, 13.405, 48.8566, 2.3522),
      (52.52, 13.405, 52.52, 13.405)
    ).toDF("la1", "lo1", "la2", "lo2")
      .select(Spatial.haversineKm(col("la1"), col("lo1"), col("la2"), col("lo2")).as("km"))
    val out = df.collect().map(_.getDouble(0))
    assert(math.abs(out(0) - 878.0) < 5.0, s"Berlin-Paris got ${out(0)}")
    assert(out(1) === 0.0)
  }

  test("spreadBits interleaves correctly against a reference implementation") {
    def ref(x: Int): Long = {
      var r = 0L
      for (i <- 0 until 16) if (((x >> i) & 1) == 1) r |= 1L << (2 * i)
      r
    }
    val xs = Seq(0, 1, 2, 3, 255, 4096, 65535)
    val got = xs.toDF("x").select(Spatial.spreadBits(col("x")).as("s"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === xs.map(ref))
  }

  test("morton sorts spatial neighbors together") {
    // cells on a 4x4 grid: z-order visits (0,0),(1,0),(0,1),(1,1) before (2,*)
    val cells = for (x <- 0 until 4; y <- 0 until 4) yield (x, y)
    val sorted = cells.toDF("x", "y")
      .withColumn("z", Spatial.morton(col("x"), col("y")))
      .orderBy("z").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(sorted.take(4).toSet === Set((0, 0), (1, 0), (0, 1), (1, 1)),
      s"first z-quad wrong: ${sorted.take(4)}")
    val zOf = sorted.zipWithIndex.toMap
    assert(zOf((0, 0)) < zOf((2, 2)), "near-origin cells precede far cells")
  }
}
