package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** Ad-hoc stage profiler for local iteration (not part of the driver
  * contract). `sbt "runMain graft.tools.Profile <sfDir>"`.
  */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables(spark, sfDir, "documents")
    time("docs.count")(docs.count())
    println("[profile] partitions = " + docs.rdd.getNumPartitions)
    val docs32 = docs.repartition(32).cache()
    time("docs32 materialize")(docs32.count())
    time("tokens only")(
      docs32.select(sum(size(Dedup.tokens(col("text"))))).collect())
    val shq = docs32.select(Dedup.shingles(col("text"), 3).as("sh"))
      .select(sum(size(col("sh"))))
    time("shingles run 1")(shq.collect())
    time("shingles run 2")(shq.collect())
    time("shingles run 3 (recreated)")(
      docs32.select(Dedup.shingles(col("text"), 3).as("sh2"))
        .select(sum(size(col("sh2")))).collect())
    time("simhash64 run 1")(
      Dedup.simhash64(docs, "doc_id", "text").count())
    time("simhash64 run 2")(
      Dedup.simhash64(docs, "doc_id", "text").count())
    time("simhash pairs full")(
      Dedup.simhashNearPairs(docs, "doc_id", "text", maxHamming = 6).count())

    val emb = Tables(spark, sfDir, "embeddings")
    time("emb.count")(emb.count())
    import graft.sim.Similarity
    val planes = Similarity.hyperplanes(24, 64)
    val e = graft.functions.ColOps.parallelize(
      emb.select(col("vec_id").as("id"), col("embedding").as("emb")))
    time("ann signatures")(
      e.select(Similarity.lshSignature(col("emb"), planes).as("sig"))
        .agg(sum("sig")).collect())
    time("ann pairs full")(
      Similarity.annPairs(emb, "vec_id", "embedding", 24, 6, 0.4).count())
    time("ann pairs full run 2")(
      Similarity.annPairs(emb, "vec_id", "embedding", 24, 6, 0.4).count())
    val sig = Dedup.minhashSignatures(docs32, "doc_id", "text", 3, 48)
    time("minhash signatures")(sig.count())
    time("full lsh pairs")(
      Dedup.minhashLshPairs(docs32, "doc_id", "text", 3, 12, 4, 0.4).count())
    spark.stop()
  }
}
