package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Steady-state query profiler: runs each named contract query twice and
  * reports cold (plan compile + execute) vs warm time — separating codegen
  * cost from execution cost. Usage:
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.Profile d2_minhash_lsh ..."`
  * (no args = all queries).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // JVM warmup
    graft.Tables(spark, sfDir, "events").count()
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    println(f"${"query"}%-24s ${"cold_s"}%8s ${"warm_s"}%8s")
    names.foreach { n =>
      try {
        val cold = t(SparkEntry.queries(n)(spark, sfDir).count())
        val warm = t(SparkEntry.queries(n)(spark, sfDir).count())
        println(f"$n%-24s $cold%8.2f $warm%8.2f")
      } catch {
        // NonFatal only: an OOM mid-profile must abort, not become a row
        case scala.util.control.NonFatal(e) =>
          println(f"$n%-24s FAILED ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
