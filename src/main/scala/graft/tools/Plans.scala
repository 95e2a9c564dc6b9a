package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Print formatted physical plans for selected contract queries — the
  * plan-quality audit loop (pushdown, broadcast, TakeOrderedAndProject,
  * codegen spans). `sbt "runMain graft.tools.Plans f1_bbox_filter j1_lineage_join"`.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // SPARK_GRAFT_PLANS_EXECUTED=1: run the query and print the FINAL
    // adaptive plan (unwrapped AdaptiveSparkPlanExec) — AQE decisions
    // (stage reuse, coalescing, runtime join switches) are invisible in
    // the pre-execution explain, so before/after plan evidence for those
    // must come from the executed tree.
    val executed = sys.env.get("SPARK_GRAFT_PLANS_EXECUTED").contains("1")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        if (executed) {
          df.collect()
          val fin = df.queryExecution.executedPlan match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              a.executedPlan
            case p => p
          }
          println(fin.toString)
        } else df.explain("formatted")
      }
      catch { case scala.util.control.NonFatal(e) => println(s"  failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
