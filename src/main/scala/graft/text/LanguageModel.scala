package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * Determinism for the oracle: each bigram's surprisal is rounded to 4dp
  * (libm log2 may differ in the last ulp across engines; at 4dp the
  * boundary-tie probability is negligible) and summed as an exact
  * DECIMAL — the per-doc totals replay bit-exactly in any engine. The
  * xent column is the RAW IEEE quotient of that exact sum by the exact
  * count (never re-rounded: quotients of exact decimals land on rounding
  * ties, the j7 class).
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
    * (DECIMAL(20,4), exact sum of per-bigram −log2 p rounded to 4dp),
    * `xent` (bits/bigram, raw double).
    */
  def bigramXent(df: DataFrame, idCol: String, textCol: String,
      refMod: Int = 10): DataFrame = {
    require(refMod >= 1, s"refMod must be positive: $refMod")
    val model = fit(
      df.filter(pmod(col(idCol).cast("long"), lit(refMod.toLong)) === 0),
      idCol, textCol)
    score(df, idCol, textCol, model)
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

  /** Score `df` under a fitted model — see [[bigramXent]] for the output
    * contract. Works on a micro-batch inside foreachBatch exactly as on a
    * static frame.
    */
  def score(df: DataFrame, idCol: String, textCol: String,
      model: BigramModel): DataFrame = {
    val BigramModel(c12, c1, vocab, vRow) = model
    // scoring stream: explode with position, map OOV → <unk> against the
    // broadcast vocabulary, re-form bigrams with a per-document lead()
    val mapped = tokenArrays(df, idCol, textCol).select(col("id"),
        posexplode(col("ws")).as(Seq("pos", "tok")))
      .join(broadcast(vocab.withColumn("in_v", lit(1))), Seq("tok"), "left")
      .select(col("id"), col("pos"),
        when(col("in_v").isNull, lit("<unk>")).otherwise(col("tok")).as("w"))
    val byDoc = Window.partitionBy("id").orderBy("pos")
    val docBi = mapped
      .withColumn("w2", lead("w", 1).over(byDoc))
      .filter(col("w2").isNotNull)
      .select(col("id"), col("w").as("w1"), col("w2"))

    docBi
      .join(broadcast(c12), Seq("w1", "w2"), "left")
      .join(broadcast(c1), col("w1") === col("w1k"), "left")
      .crossJoin(broadcast(vRow))
      .select(col("id"),
        round(-log2(
          (coalesce(col("c12"), lit(0L)) + 1L).cast("double") /
            (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")), 4)
          .cast("decimal(20,4)").as("s"))
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum("s").as("sum_surprisal"))
      .withColumn("xent",
        col("sum_surprisal").cast("double") / col("n_bigrams"))
  }
}
