package graft

import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish regex") {
    val df = Seq("hello world 42", "a-b c! d").toDF("text")
      .select(TextAnalysis.tokenCount(col("text")).as("n"),
        TextAnalysis.regexTokenCount(col("text")).as("r"))
    val rows = df.collect()
    assert(rows(0).getInt(0) === 3)
    assert(rows(0).getInt(1) === 3)       // hello | world | 42
    assert(rows(1).getInt(0) === 3)       // a-b | c! | d
    assert(rows(1).getInt(1) === 6)       // a - b c ! d
  }

  test("langId picks the marker-dominant language, und when none") {
    val df = Seq(
      "the cat and the dog is here to stay",
      "der hund und die katze ist nicht da",
      "xyzzy plugh 12345"
    ).toDF("text").select(TextAnalysis.langId(col("text")).as("lang"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("en", "de", "und"))
  }

  test("qualityScore rewards long stopword-rich prose over junk") {
    val good = "the quick brown fox jumps over a lazy dog and then runs off to " +
      "the distant hills where a river flows and the grass grows tall of its own."
    val junk = "...,,,...,,,..."
    val df = Seq(good, junk).toDF("text")
      .select(TextAnalysis.qualityScore(col("text")).as("q"))
    val Array(qg, qj) = df.collect().map(_.getDouble(0))
    assert(qg > 0.8, s"good prose scored $qg")
    assert(qj < 0.4, s"junk scored $qj")
  }

  test("rollingFingerprint matches the reference fold, collapses punct variants") {
    def oracle(s: String): Long = {
      val norm = s.replaceAll("[^A-Za-z0-9]+", " ").toLowerCase.trim
      norm.foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
    }
    val texts = Seq("hello world 42", "Hello, WORLD!! 42", "different text")
    val out = texts.toDF("text")
      .select(TextAnalysis.rollingFingerprint(col("text")).as("fp"))
      .collect().map(_.getLong(0))
    assert(out(0) === oracle(texts(0)))
    assert(out(0) === out(1), "normalization collapses case/punct variants")
    assert(out(2) === oracle(texts(2)))
    assert(out(0) !== out(2))
  }
}
