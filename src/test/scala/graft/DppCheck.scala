import org.apache.spark.sql.SparkSession
object DppCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("v8s_search_amortized")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    plan.linesIterator.filter(l => l.contains("PartitionFilters") || l.contains("dynamicpruning"))
      .foreach(l => println(l.trim.take(300)))
    spark.stop()
  }
}
