package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Plan-shape contracts for the scale-sensitive operators: the properties
  * that make them survive a 100 TB corpus are asserted on the physical
  * plan, so a refactor that silently degrades the shape (a broadcast that
  * becomes a shuffle join, a narrow op that grows an Exchange, a per-shard
  * window that collapses to a single partition) fails the build.
  */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 50L)
    .map(i => (i, if (i % 2 == 0) "en" else "de",
      Seq.fill(20)(s"w${i % 11}").mkString(" ")))
    .toDF("doc_id", "lang", "text")

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("d8 contamination: benchmark broadcasts; no corpus-on-corpus join") {
    val p = planOf(Dedup.contaminationRate(docs, "doc_id", "text",
      docs.limit(5), "text", shingleN = 3))
    assert(p.contains("BroadcastHashJoin"), s"benchmark side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus must never shuffle for a join:\n$p")
  }

  test("t7 chunking: executor-local 1->N expansion, zero Exchange") {
    val p = planOf(docs.select(col("doc_id"),
      posexplode(TextAnalysis.chunkWindows(col("text"), 8, 4))))
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
  }

  test("t8 packing: per-shard window, never a single-partition sort") {
    val p = planOf(TextAnalysis.packSequences(docs, "doc_id", "text", "lang", 64))
    assert(p.contains("hashpartitioning"), s"window must partition by shard:\n$p")
    assert(!p.contains("SinglePartition"), s"no global window allowed:\n$p")
  }

  test("d2 portable minhash: signature projection sits below the band Generate") {
    // the CollapseProject guard: the band explode must consume the
    // signature as a bound attribute, not recompute it per band
    val pairs = Dedup.minhashLshPairsPortable(docs, "doc_id", "text",
      shingleN = 3, bands = 4, rowsPerBand = 2, threshold = 0.1)
    val p = pairs.queryExecution.optimizedPlan.toString
    val generateLine = p.linesIterator.find(_.contains("Generate explode")).getOrElse("")
    assert(!generateLine.contains("md5"),
      s"signature hashing leaked into the per-band generator:\n$generateLine")
  }
}
