package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.types.StructType

import graft.sources.Jsonl

/** JSONL ingestion: schema-explicit reads, corrupt-line quarantine (never
  * silent drops), and the JSONL write round-trip.
  */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL("doc_id BIGINT, text STRING, lang STRING")

  test("good lines parse, malformed lines land in quarantine with the raw text") {
    val dir = tempDir("jsonl")
    Files.write(java.nio.file.Path.of(s"$dir/part0.jsonl"),
      Seq(
        """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
        """{"doc_id": 2, "text": "bonjour", "lang": "fr"}""",
        """{"doc_id": 3 "text": "missing comma"}""", // malformed
        """{"doc_id": 4, "text": "ok", "lang": "de"}"""
      ).mkString("\n").getBytes(StandardCharsets.UTF_8))

    val data = Jsonl.read(spark, dir, schema)
    val (good, quarantined) = (data.good, data.quarantined)
    assert(good.count() === 3L)
    assert(good.columns.toSeq === Seq("doc_id", "text", "lang"))
    assert(good.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 4L))
    val bad = quarantined.collect().map(_.getString(0))
    assert(bad.length === 1 && bad(0).contains("missing comma"),
      "the raw malformed line must be preserved for triage")
    data.release() // frees the shared cached scan both frames derive from
  }

  test("JSONL write round-trips through read with the same schema") {
    val dir = tempDir("jsonlrt")
    val df = Seq((10L, "alpha", "en"), (11L, "beta", "de"))
      .toDF("doc_id", "text", "lang")
    Jsonl.write(df, s"$dir/out")
    val rt = Jsonl.read(spark, s"$dir/out", schema)
    val (back, quarantined) = (rt.good, rt.quarantined)
    assert(quarantined.count() === 0L)
    assert(back.orderBy("doc_id").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).toSeq ===
      Seq((10L, "alpha", "en"), (11L, "beta", "de")))
    rt.release()
  }

  test("a schema predefining the corrupt column is rejected") {
    intercept[IllegalArgumentException] {
      Jsonl.read(spark, "/nonexistent",
        StructType.fromDDL("_corrupt_record STRING, x BIGINT"))
    }
  }
}
