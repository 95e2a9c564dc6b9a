package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL corpus ingestion — the de-facto interchange format for training
  * data. Always schema-explicit (inference means a full extra pass over
  * 100 TB and a schema that drifts with the data), and malformed lines are
  * QUARANTINED, not dropped: at corpus scale a silent drop is
  * indistinguishable from data loss, and failing the whole read on one bad
  * line is worse. The quarantine frame carries the raw line for triage.
  */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  /** Read `path` with `schema`; returns `(good, quarantined)`.
    *
    * The one-cache subtlety: Spark refuses queries that select ONLY the
    * internal corrupt-record column from a raw JSON scan, so the split
    * must happen against a materialized frame — the cache below is load-
    * bearing, not an optimization. Callers should `unpersist` the good
    * frame when done.
    */
  def read(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not predefine $CorruptCol")
    val raw = spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .cache()
    val good = raw.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val quarantined = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (good, quarantined)
  }

  /** Write a frame as JSONL shards (one JSON object per line). */
  def write(df: DataFrame, path: String, maxRecordsPerFile: Int = 0): Unit = {
    val w = df.write.mode("overwrite")
    (if (maxRecordsPerFile > 0)
       w.option("maxRecordsPerFile", maxRecordsPerFile.toLong)
     else w).json(path)
  }
}
