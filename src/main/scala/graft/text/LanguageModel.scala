package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet-style corpus filter:
  * train a small LM on a trusted reference slice, score every document by
  * its cross-entropy under that model, and gate ingestion on the score
  * (high surprisal ≈ boilerplate, gibberish, or the wrong language).
  * Published pipelines (CCNet, Gopher/MassiveText, RefinedWeb) all carry a
  * step of exactly this shape; the model here is the smallest honest
  * instance — an add-one-smoothed word bigram model — with the same
  * distributed layout a KenLM-sized model would use. Distinct from
  * [[TextAnalysis.lmQuality]] (t9), which scores unsmoothed unigram
  * self-information against the WHOLE corpus's own frequencies: this one
  * holds out a reference slice, smooths, and handles out-of-vocabulary
  * tokens — the shape that generalizes to scoring new crawls against a
  * trusted model.
  *
  * Scale shape: the model is corpus-sublinear (vocabulary + observed
  * bigrams of the REFERENCE slice only) and ships to executors as
  * broadcast joins — the standard "model to the data" LM-scoring layout;
  * the token stream is never collected. Per-document state is bounded: the
  * bigram re-assembly is a lead() window partitioned by document.
  *
  * Determinism for the oracle: the FIT is the non-portable step — the
  * per-bigram surprisal involves a log2 whose last ulp differs between
  * the JVM's StrictMath and DuckDB's libm, and with ~10⁵ scored terms at
  * 4dp at least one term lands on a rounding boundary and flips sides
  * (the r10 hash failure). So, exactly like the KMeans-centroid and
  * media-decode disciplines, the fitted surprisal table is PERSISTED
  * once as a parquet artifact ([[SurprisalArtifact]]) and BOTH the
  * engine and the oracle score by joining that artifact: only string
  * equi-joins and exact-DECIMAL sums remain cross-engine. The xent
  * column is the RAW IEEE quotient of the exact decimal sum by the exact
  * count (never re-rounded: quotients of exact decimals land on rounding
  * ties, the j7 class; the quotient of identical operands is identical
  * in any IEEE-754 engine).
  */
object LanguageModel {

  /** Score every document's word-bigram cross-entropy under an add-one
    * smoothed model trained on the reference slice `idCol % refMod == 0`.
    *
    * Model: p(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V), with V = reference
    * vocabulary size + 1 (one slot for `<unk>`, which every out-of-vocab
    * scoring token maps to). Documents with fewer than two tokens have no
    * bigrams and emit no row.
    *
    * Output per document: `doc_id`, `n_bigrams`, `sum_surprisal`
    * (the exact DECIMAL(20,4) sum of per-bigram −log2 p rounded to 4dp,
    * cast once to DOUBLE for cross-engine portability), `xent`
    * (bits/bigram, raw double).
    */
  def bigramXent(df: DataFrame, idCol: String, textCol: String,
      refMod: Int = 10, artifactPath: Option[String] = None): DataFrame = {
    require(refMod >= 1, s"refMod must be positive: $refMod")
    val model = fit(
      df.filter(pmod(col(idCol).cast("long"), lit(refMod.toLong)) === 0),
      idCol, textCol)
    val art = artifactPath match {
      case Some(p) =>
        // oracle mode: persist the fitted surprisal table and score from
        // the DISK copy — the oracle joins the same files, so the two
        // sides cannot diverge on a single log2 ulp
        saveSurprisal(model, p)
        loadSurprisal(df.sparkSession, p)
      case None => surprisal(model)
    }
    scoreArtifact(df, idCol, textCol, art)
  }

  /** The fitted model: observed bigram counts, left-unigram counts, the
    * vocabulary, and the one-row smoothing denominator V. All four are
    * corpus-sublinear frames that broadcast into scoring joins — the
    * fit/score split is what lets a STREAM score micro-batches against a
    * model trained once on a static reference (st9's shape).
    */
  final case class BigramModel(c12: DataFrame, c1: DataFrame,
      vocab: DataFrame, vRow: DataFrame)

  private def tokenArrays(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val norm = TextAnalysis.normalize(col(textCol))
    df.select(col(idCol).cast("long").as("id"),
        split(norm, " ", -1).as("ws"))
      .filter(size(col("ws")) >= 2 && element_at(col("ws"), 1) =!= "")
  }

  // bigrams: zip the array against itself shifted by one — a narrow map,
  // no shuffle until the count aggregates
  private def bigrams(d: DataFrame): DataFrame = d.select(col("id"),
      explode(arrays_zip(
        slice(col("ws"), lit(1), size(col("ws")) - 1).as("w1"),
        slice(col("ws"), lit(2), size(col("ws")) - 1).as("w2"))).as("bg"))
    .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Train the bigram model on `ref` (every row of it — the caller picks
    * the reference slice).
    */
  def fit(ref: DataFrame, idCol: String, textCol: String): BigramModel = {
    val toks = tokenArrays(ref, idCol, textCol)
    val refBi = bigrams(toks)
    val c12 = refBi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = refBi.groupBy("w1").agg(count(lit(1)).as("c1"))
      .withColumnRenamed("w1", "w1k")
    val vocab = toks.select(explode(col("ws")).as("tok")).distinct()
    // V as a one-row broadcast instead of a driver action: the whole
    // scoring plan stays a single job
    val vRow = vocab.agg((count(lit(1)) + 1L).as("v"))
    BigramModel(c12, c1, vocab, vRow)
  }

  /** The fitted surprisal table — the model REIFIED as data, the form
    * that persists and replays engine-portably:
    *  - `bigram` (w1, w2, s): s = round(−log2((c12+1)/(c1+V)), 4) as
    *    DECIMAL(20,4) for every bigram OBSERVED in the reference;
    *  - `left` (w1, s): the unseen-pair fallback for a w1 the reference
    *    saw as a left unigram — round(−log2(1/(c1+V)), 4);
    *  - `base` (s): the one-row fallback for a never-seen w1 (including
    *    `<unk>` when the reference never produced it) — round(−log2(1/V), 4);
    *  - `vocab` (tok): the reference vocabulary, for the OOV → `<unk>`
    *    mapping on the scoring side.
    * All four are corpus-sublinear; scoring is coalesce(bigram, left,
    * base) over string equi-joins — no float math left to diverge.
    */
  final case class SurprisalArtifact(bigram: DataFrame, left: DataFrame,
      base: DataFrame, vocab: DataFrame)

  /** Fold the counts into the surprisal table (the only place log2 runs —
    * once, at fit time, on whichever engine fits).
    */
  def surprisal(model: BigramModel): SurprisalArtifact = {
    val BigramModel(c12, c1, vocab, vRow) = model
    val bigram = c12
      .join(c1, c12("w1") === c1("w1k"))
      .crossJoin(vRow)
      .select(col("w1"), col("w2"),
        round(-log2((col("c12") + 1L).cast("double") /
          (col("c1") + col("v")).cast("double")), 4)
          .cast("decimal(20,4)").as("s"))
    val left = c1.crossJoin(vRow)
      .select(col("w1k").as("w1"),
        round(-log2(lit(1.0) / (col("c1") + col("v")).cast("double")), 4)
          .cast("decimal(20,4)").as("s"))
    val base = vRow.select(
      round(-log2(lit(1.0) / col("v").cast("double")), 4)
        .cast("decimal(20,4)").as("s"))
    SurprisalArtifact(bigram, left, base, vocab)
  }

  /** Persist the fitted surprisal table (the KMeans-centroid discipline:
    * the fit is the one non-portable step, so its OUTPUT is the shared
    * ground truth both engines join).
    */
  def saveSurprisal(model: BigramModel, path: String): Unit = {
    val art = surprisal(model)
    art.bigram.write.mode("overwrite").parquet(s"$path/bigram")
    art.left.write.mode("overwrite").parquet(s"$path/left")
    art.base.write.mode("overwrite").parquet(s"$path/base")
    art.vocab.write.mode("overwrite").parquet(s"$path/vocab")
  }

  def loadSurprisal(spark: SparkSession, path: String): SurprisalArtifact =
    SurprisalArtifact(
      spark.read.parquet(s"$path/bigram"),
      spark.read.parquet(s"$path/left"),
      spark.read.parquet(s"$path/base"),
      spark.read.parquet(s"$path/vocab"))

  /** Score `df` under a fitted model — see [[bigramXent]] for the output
    * contract. Works on a micro-batch inside foreachBatch exactly as on a
    * static frame. Routes through the surprisal table so the in-memory
    * and persisted-artifact paths are the same code.
    */
  def score(df: DataFrame, idCol: String, textCol: String,
      model: BigramModel): DataFrame =
    scoreArtifact(df, idCol, textCol, surprisal(model))

  /** Score against a (possibly persisted) surprisal table: form bigrams
    * ARRAY-SIDE (the same zip-against-shifted-self the fit uses — no
    * per-document window, no token-stream Exchange+Sort), then resolve
    * each bigram with ONE coalesce over two broadcast equi-join lookups
    * (observed bigram, then left-unigram fallback) and the one-row base
    * fallback. No OOV→`<unk>` mapping runs here — see the invariant note
    * in the body. The sum is exact DECIMAL; xent is the raw quotient.
    */
  def scoreArtifact(df: DataFrame, idCol: String, textCol: String,
      art: SurprisalArtifact): DataFrame = {
    // Bigram formation stays ARRAY-SIDE (the same zip-against-shifted-self
    // the fit uses): the r15-era formulation mapped OOV per TOKEN and then
    // re-formed bigrams with a per-doc lead() window — an Exchange + Sort
    // of the whole exploded token stream on EVERY score (the t21/st9
    // settled cost the r15 verdict flagged).
    //
    // No OOV→`<unk>` mapping joins either (r16): the artifact's bigram
    // and left tables key ONLY on reference-vocabulary words and never
    // contain `<unk>` (the fit sees no OOV by construction), so a raw
    // token joins them with EXACTLY the outcome its mapped form would —
    // in-vocab keys are unchanged by mapping, and an OOV side maps to
    // `<unk>`, which misses both tables just like the raw miss — falling
    // through the same coalesce to the same fallback. Two broadcast
    // joins over the full bigram stream deleted; the vocab table remains
    // part of the persisted artifact (the oracle's replay uses it).
    //
    // LOAD-BEARING INVARIANT (r16 advice): "the fit sees no OOV by
    // construction" holds because TextAnalysis.normalize strips every
    // non-alphanumeric character, so the LITERAL token "<unk>" cannot
    // survive normalization into the fitted vocabulary or the bigram/
    // left key columns — that absence is exactly what makes the raw-vs-
    // mapped join outcomes identical while the DuckDB oracle SQL still
    // performs the mapping. Any future normalization change that lets
    // "<" or ">" through would silently diverge engine vs oracle; the
    // invariant is asserted by LanguageModelSpec ("vocab never contains
    // the unk sentinel"). Revisit this site and the t21/st9 oracle SQL
    // together if normalization ever changes.
    val docBi = bigrams(tokenArrays(df, idCol, textCol))

    docBi
      .join(broadcast(art.bigram.withColumnRenamed("s", "s_bi")),
        Seq("w1", "w2"), "left")
      .join(broadcast(art.left.select(col("w1").as("w1k"), col("s").as("s_left"))),
        col("w1") === col("w1k"), "left")
      .crossJoin(broadcast(art.base.select(col("s").as("s_base"))))
      .select(col("id"),
        coalesce(col("s_bi"), col("s_left"), col("s_base")).as("s"))
      .groupBy(col("id").as("doc_id"))
      // Sum exactly in DECIMAL, then cast ONCE to double. The raw decimal
      // must not leave this operator: Spark's sum(DECIMAL(20,4)) widens to
      // DECIMAL(30,4) while other engines widen differently (DuckDB:
      // DECIMAL(38,4)), so a decimal output column hash-differs cross-engine
      // even when every value is identical. Double is the portable exact
      // representation here (sums ≤ ~10^6 at scale 4 round identically).
      .agg(count(lit(1)).as("n_bigrams"),
        sum("s").cast("double").as("sum_surprisal"))
      .withColumn("xent", col("sum_surprisal") / col("n_bigrams"))
  }
}
