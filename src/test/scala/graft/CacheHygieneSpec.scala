package graft

/** Persist lifecycle of the query lambdas (VERDICT r9 item: the lambdas are
  * the reference implementations users copy into long-lived sessions, so
  * they must release every intermediate they persist instead of relying on
  * the harness's `clearCache()` between queries — the Graph.triangleStats
  * discipline, packaged as `SparkEntry.sealResult`).
  *
  * Id-diff, not a size compare: the async ContextCleaner may concurrently
  * drop UNRELATED stale entries mid-test.
  */
class CacheHygieneSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Every SparkEntry query that persists (or used to checkpoint) an
    * intermediate frame, plus the fuzzy-topk path that formerly pinned a
    * localCheckpoint per invocation.
    */
  private val persistingQueries = Seq(
    "x2_curation_flagship", "x3_decontamination_flagship",
    "d14_threshold_curve", "d12_minhash_estimate",
    "e18_cooccurrence", "sm8_distribution_match", "v11_nprobe_sweep",
    "t19_fuzzy_topk", "g3_triangles")

  persistingQueries.foreach { name =>
    test(s"$name leaves no cached RDDs behind") {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // drive the full plan like a session user would
      val leaked = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
      assert(leaked.isEmpty, s"$name leaked cached RDDs: $leaked")
    }
  }
}
