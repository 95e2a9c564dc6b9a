package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization — the third point on the ANN memory/recall curve
  * (raw float < SQ8 < PQ): each dimension is affinely mapped to an 8-bit
  * code with per-dimension `[min, max]` learned from the corpus, so a
  * 64-dim float vector becomes 64 small ints (≈1 byte each after parquet
  * bit-packing — an 8× scan-size cut vs float64 with far less distortion
  * than PQ's codebook quantization). Search is ASYMMETRIC: raw probe
  * against decoded corpus (the standard SQ trick — only the corpus side,
  * the side that is 100 TB, pays quantization error).
  *
  * Everything is deterministic given the persisted params (no training
  * randomness at all — unlike IVF/PQ there is no KMeans), which is what
  * lets the v13 oracle replay encode → decode → cosine → top-k from the
  * params parquet alone and hash-match.
  *
  * Reference anchor: the embedding-dedup/similarity family
  * (`SURVEY.md §2` V-ops); quantized storage is this engine's scale
  * extension, same role as `sim.Pq` (`Pq.scala`) but fit-free.
  */
object Sq {

  /** Per-dimension quantization bounds: one tiny `(j, mn, mx)` row per
    * dimension — THE model artifact. Computed with one posexplode +
    * hash-agg pass (map-side partial min/max, so the shuffle carries at
    * most `dim × partitions` rows regardless of corpus size).
    */
  def fit(corpus: DataFrame, embCol: String): DataFrame =
    corpus
      .select(posexplode(col(embCol).cast("array<double>")).as(Seq("j", "x")))
      .groupBy("j").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))

  def saveParams(params: DataFrame, path: String): Unit =
    params.coalesce(1).write.mode("overwrite").parquet(s"$path/params")

  /** The collected form (dim doubles each — the `Ivf.load` pattern): `mins`
    * and the per-dimension step `(mx-mn)/255`, with a degenerate constant
    * dimension mapping to step 1.0 (every code 0, decode returns `mn`).
    */
  final case class Params(mins: Seq[Double], steps: Seq[Double])

  def loadParams(spark: SparkSession, path: String): Params = {
    val rows = spark.read.parquet(s"$path/params")
      .orderBy("j").select("mn", "mx").collect()
    val mins = rows.map(_.getDouble(0)).toSeq
    val steps = rows.map { r =>
      val (mn, mx) = (r.getDouble(0), r.getDouble(1))
      if (mx == mn) 1.0 else (mx - mn) / 255.0
    }.toSeq
    Params(mins, steps)
  }

  /** Quantize: `code_j = clamp(floor((x_j - mn_j) / step_j + 0.5), 0, 255)`.
    * `floor(v + 0.5)` instead of `round` because its IEEE semantics are
    * identical in every engine (round's half-handling is not); values are
    * non-negative after the clamp so floor == round-half-up.
    */
  def encode(rows: DataFrame, idCol: String, embCol: String, p: Params): DataFrame = {
    val mins = typedlit(p.mins)
    val steps = typedlit(p.steps)
    rows.select(col(idCol).as("id"),
      transform(col(embCol).cast("array<double>"), (x, i) =>
        least(greatest(
          floor((x - element_at(mins, i + 1)) / element_at(steps, i + 1) + lit(0.5d)),
          lit(0L)), lit(255L)).cast("int")).as("code"))
  }

  /** Reconstruct the quantized corpus vector: `mn_j + code_j * step_j`. */
  def decode(codes: DataFrame, embCol: String, p: Params): DataFrame = {
    val mins = typedlit(p.mins)
    val steps = typedlit(p.steps)
    codes.select(col("id"),
      transform(col("code"), (c, i) =>
        element_at(mins, i + 1) + c.cast("double") * element_at(steps, i + 1))
        .as(embCol))
  }

  /** Asymmetric top-k: RAW probes against the DECODED quantized corpus —
    * one scan of the byte codes (the only corpus-sized input), probes
    * broadcast, per-probe window rank. Same output contract as
    * [[Similarity.knnJoin]].
    */
  def search(codes: DataFrame, p: Params, probes: DataFrame, idCol: String,
      embCol: String, k: Int): DataFrame =
    Similarity.knnJoin(probes,
      decode(codes, embCol, p).withColumnRenamed("id", idCol),
      idCol, embCol, k)
}
