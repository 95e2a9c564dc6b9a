package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.{Pii, TextAnalysis}

/** Scale-behavior probe: run the candidate-generation-bounded operators
  * (LSH dedup, contamination scoring) at ×1/×4/×16 multiples of the sf
  * corpus and report wall time and output size per scale. The property
  * under test is the 100 TB story: candidate generation must stay
  * bucket-bounded, so runtime should grow near-linearly with corpus size
  * (quadratic growth means a bucket cap or blocking key broke).
  *
  * The corpus is multiplied by unioning shifted copies: ids remapped to
  * stay unique, and every TOKEN suffixed with the copy id, so each copy
  * universe has disjoint shingles — the near-dup structure within a copy
  * mirrors the original corpus but no cross-copy pairs exist. A healthy
  * run therefore shows output pairs ≈ ×k and wall time growing near-
  * linearly. Inputs only; results are not correctness-checked here (the
  * oracle gate does that at ×1).
  *
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.Stress"` → one JSON
  * line per (operator, scale).
  */
object Stress {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
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

    val docs0 = graft.Tables(spark, sfDir, "documents")
      .select("doc_id", "text", "lang", "source")

    // id stride from the data, not a constant — a fixed stride collides
    // once the base corpus outgrows it and copies silently merge
    val idStride = docs0.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1L

    def multiplied(k: Int): DataFrame = {
      val copies = spark.range(k.toLong).select(col("id").as("copy"))
      // suffix AFTER applying the dedup normalization (non-alnum runs → one
      // space): suffixing raw space-split words would leave punctuated
      // compounds ("a.b.c") re-splitting into unsuffixed tokens shared
      // across copies, quietly reintroducing the cross-copy candidate work
      // this probe exists to rule out
      val normed = concat_ws(" ",
        transform(Dedup.tokens(col("text")),
          w => concat(w, lit("x"), col("copy"))))
      docs0.crossJoin(copies)
        .select((col("doc_id") + col("copy") * idStride).as("doc_id"),
          when(col("copy") === 0, col("text")).otherwise(normed).as("text"),
          col("lang"), col("source"))
    }

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    // The t11-shaped curation decision: langid + quality + token count
    // joined with 2-gram repetition stats — the composed per-doc filter.
    def curation(docs: DataFrame): DataFrame = {
      val rep = TextAnalysis.repetitionStats(docs, "doc_id", "text", n = 2)
        .select(col("id").as("doc_id"), col("dup_frac"))
      docs.select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
        .join(rep, Seq("doc_id"))
    }

    // JIT/codegen warmup so the x1 measurement isn't charged cold-start
    val w = docs0.limit(100).cache(); w.count()
    Dedup.minhashLshPairsPortable(w, "doc_id", "text",
      shingleN = 3, bands = 12, rowsPerBand = 4, threshold = 0.4).count()
    Dedup.dupSpans(w, "doc_id", "text", window = 16).count()
    Dedup.scrubDupSpans(w, "doc_id", "text", window = 16)
      .select(sum(length(col("scrubbed_text")))).collect()
    TextAnalysis.topNgrams(w, "doc_id", "text", n = 2, k = 20).count()
    curation(w).count()
    w.select(sum(length(Pii.redact(col("text"))))).collect()
    w.unpersist()
    spark.catalog.clearCache()

    Seq(1, 4, 16).foreach { k =>
      val docs = multiplied(k).cache()
      val n = docs.count() // materialize outside the timed region

      val (tLsh, pairsLsh) = time {
        Dedup.minhashLshPairsPortable(docs, "doc_id", "text",
          shingleN = 3, bands = 12, rowsPerBand = 4, threshold = 0.4).count()
      }
      val (tCont, rowsCont) = time {
        Dedup.contaminationRate(docs, "doc_id", "text",
          graft.functions.Sampling.hashSample(docs, "doc_id", 0.05), "text",
          shingleN = 8).count()
      }
      val (tSpan, rowsSpan) = time {
        Dedup.dupSpans(docs, "doc_id", "text", window = 16).count()
      }
      val (tCur, rowsCur) = time { curation(docs).count() }
      // d10 materializes scrubbed text: force every byte with a length sum
      val (tScrub, charsScrub) = time {
        Dedup.scrubDupSpans(docs, "doc_id", "text", window = 16)
          .select(sum(length(col("scrubbed_text"))))
          .collect()(0).getLong(0)
      }
      val (tHh, rowsHh) = time {
        TextAnalysis.topNgrams(docs, "doc_id", "text", n = 2, k = 20).count()
      }
      // count() would prune the redaction projection away — force it
      // through an aggregate over the redacted text's length
      val (tPii, charsPii) = time {
        docs.select(sum(length(Pii.redact(col("text")))))
          .collect()(0).getLong(0)
      }
      val (tTb, rowsTb) = time {
        val withNt = docs.select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("nt"))
        graft.functions.Sampling
          .tokenBudgetSample(withNt, "doc_id", "source", "nt", budget = 800L)
          .count()
      }
      // Locale.ROOT: the f-interpolator would print comma decimals on
      // de/fr JVMs — invalid JSON (same fix as Bench)
      def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", v)
      println(s"""{"op":"d2_lsh","scale":$k,"n_docs":$n,"sec":${num(tLsh)},"out_rows":$pairsLsh}""")
      println(s"""{"op":"d8_contamination","scale":$k,"n_docs":$n,"sec":${num(tCont)},"out_rows":$rowsCont}""")
      println(s"""{"op":"d9_dup_spans","scale":$k,"n_docs":$n,"sec":${num(tSpan)},"out_rows":$rowsSpan}""")
      println(s"""{"op":"t11_curation","scale":$k,"n_docs":$n,"sec":${num(tCur)},"out_rows":$rowsCur}""")
      println(s"""{"op":"d10_span_scrub","scale":$k,"n_docs":$n,"sec":${num(tScrub)},"out_chars":$charsScrub}""")
      println(s"""{"op":"t12_heavyhitters","scale":$k,"n_docs":$n,"sec":${num(tHh)},"out_rows":$rowsHh}""")
      println(s"""{"op":"p3_pii_redact","scale":$k,"n_docs":$n,"sec":${num(tPii)},"out_chars":$charsPii}""")
      println(s"""{"op":"sm3_token_budget","scale":$k,"n_docs":$n,"sec":${num(tTb)},"out_rows":$rowsTb}""")
      docs.unpersist()
      // d9 persists its chunk frame internally; drop it between scales so a
      // later scale can't ride an earlier scale's cache
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
