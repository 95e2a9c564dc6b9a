package graft.tools
import org.apache.spark.sql.SparkSession
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    // deliberately NO nanosAsLong here — simulates the driver's own session;
    // Tables must make the read work regardless
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[entry-smoke] rows=${rows.length}")
    rows.foreach(r => println(s"[entry-smoke] $r"))
    spark.stop()
  }
}
