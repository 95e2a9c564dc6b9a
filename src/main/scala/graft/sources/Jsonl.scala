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

  /** A JSONL read split into parsed rows and quarantined raw lines. Call
    * [[JsonlData.release]] when done — it unpersists the shared cached
    * scan BOTH frames derive from (unpersisting `good` itself would be a
    * no-op: Spark uncaches by plan identity, and the cache entry belongs
    * to the raw parse, not the filtered views).
    */
  final case class JsonlData(good: DataFrame, quarantined: DataFrame,
      private val raw: DataFrame) {
    def release(): Unit = { raw.unpersist(); () }
  }

  /** Read `path` with `schema`.
    *
    * The one-cache subtlety: Spark refuses queries that select ONLY the
    * internal corrupt-record column from a raw JSON scan, so the split
    * must happen against a materialized frame — the cache below is load-
    * bearing, not an optimization.
    */
  def read(spark: SparkSession, path: String, schema: StructType): JsonlData = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not predefine $CorruptCol")
    val raw = spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .cache()
    JsonlData(
      raw.filter(col(CorruptCol).isNull).drop(CorruptCol),
      raw.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line")),
      raw)
  }

  /** Write a frame as JSONL shards (one JSON object per line). */
  def write(df: DataFrame, path: String, maxRecordsPerFile: Int = 0): Unit = {
    val w = df.write.mode("overwrite")
    (if (maxRecordsPerFile > 0)
       w.option("maxRecordsPerFile", maxRecordsPerFile.toLong)
     else w).json(path)
  }
}
