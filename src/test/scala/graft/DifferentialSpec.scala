package graft

/** Differential execution: the same contract query must produce identical
  * rows with whole-stage codegen ON and fully-interpreted expression
  * evaluation — the strongest internal check on the custom expressions'
  * doGenCode/eval pairs (ArrayDot, SimhashAgg, MinhashAgg) and on any
  * codegen-path-sensitive built-in composition we rely on.
  */
class DifferentialSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // moderate-cost queries covering the native expressions and custom joins
  private val targets = Seq(
    "v1_cosine_topk",       // ArrayDot in TakeOrderedAndProject
    "v2_knn_join",          // ArrayDot in join + window
    "d3_simhash_pairs",     // SimhashAgg + bit ops
    "d2_minhash_lsh",       // MinhashAgg + LSH pipeline
    "t4_rolling_fingerprint", // native RollingHash codepoint walk
    "v3_ann_pairs",         // portable ANN: plane dots + bucket expansion
    "d8_contamination",     // broadcast semi-join + HOF shingles
    "j5_asof_join",         // union + running last window
    "j9_asof_forward",      // mirrored-sort running last (r5 frame rewrite)
    "e7_session_window",    // session-window semantics
    "d12_minhash_estimate", // native PortableMinhash signatures + zip folds
    "t14_quality_classifier", // portable bucket hash + integer weight agg
    "d13_incremental_dedup", // PortableMinhash over a tagged union + screen joins
    "v10_margin_pairs"      // ArrayDot twice + DECIMAL density folds
  )

  private def runAll(codegen: Boolean): Map[String, Set[Seq[Any]]] = {
    spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
    spark.conf.set("spark.sql.codegen.factoryMode",
      if (codegen) "FALLBACK" else "NO_CODEGEN")
    try targets.map { n =>
      n -> SparkEntry.queries(n)(spark, sfDir).collect().map(_.toSeq).toSet
    }.toMap
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("codegen and interpreted execution agree on every target query") {
    val gen = runAll(codegen = true)
    val interp = runAll(codegen = false)
    targets.foreach { n =>
      assert(gen(n) === interp(n), s"codegen/interpreted divergence in $n")
      assert(gen(n).nonEmpty, s"$n returned no rows at sf0.001")
    }
  }
}
