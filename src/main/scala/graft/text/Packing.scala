package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chunk step every LLM training pipeline
  * runs between curation and the data loader: documents are laid end-to-end
  * in a deterministic order and the token stream is cut into fixed-length
  * context windows. The output is the doc→chunk placement map: which chunk(s)
  * each document's tokens land in, and how many tokens it contributes to
  * each (a document longer than the context length spans several chunks; a
  * chunk typically holds the tails+heads of several documents).
  *
  * Matches the packing semantics of the standard "concatenate then split
  * every ctxLen tokens" loaders (GPT-style pretraining); the reference
  * pipeline has no packing stage — this is LLM-pipeline surface beyond it.
  * The complementary batch-assembly form — whole documents assigned to
  * token-budget bins, never split — is [[TextAnalysis.packSequences]] (t8);
  * this operator produces the exact token spans a fixed-context loader
  * consumes, including documents straddling chunk boundaries.
  *
  * Scale shape: the global token offset is a prefix sum over the whole
  * corpus. A single `Window.orderBy(id)` computes it but moves EVERY row to
  * one partition — the canonical window scale-killer. Instead the offsets
  * are computed two-level: (1) a within-shard running sum, partitioned by a
  * deterministic shard key (id div shardSize) so each window state is
  * bounded; (2) shard totals — a frame smaller than the corpus by
  * shardSize× — get their own running sum and are broadcast-joined back as
  * per-shard base offsets. Integer arithmetic end-to-end, so the two-level
  * sum is bit-equal to the global one. The shard-totals window is itself
  * single-partition, but over corpus/shardSize rows (sublinear; the same
  * two-level split re-applies if that ever matters).
  */
object Packing {

  /** Lay documents end-to-end in `idCol` order, tokenizing with the corpus
    * convention ([[TextAnalysis.normalize]] then single-space split), and
    * cut the stream into `ctxLen`-token chunks. Returns one row per
    * (chunk, document) with the document's global token span intersected
    * with the chunk:
    *
    *   chunk_id        — zero-based chunk index
    *   doc_id          — the document (cast to long)
    *   tok_begin       — global token offset where this slice starts
    *   n_tok_in_chunk  — tokens this document contributes to this chunk
    *
    * Documents that normalize to nothing occupy zero tokens and emit no
    * rows. `idCol` must be numeric and unique — it is both the layout order
    * and the shard key.
    */
  def packChunks(df: DataFrame, idCol: String, textCol: String,
      ctxLen: Int, shardSize: Int = 4096): DataFrame = {
    require(ctxLen >= 1, s"ctxLen must be positive: $ctxLen")
    require(shardSize >= 1, s"shardSize must be positive: $shardSize")
    val norm = TextAnalysis.normalize(col(textCol))
    // empty normalized text splits to [""] — one bogus token; everything
    // else is clean (normalize collapses separator runs and trims edges)
    val toks = df.select(
        col(idCol).cast("long").as("id"),
        when(norm === "", lit(0L))
          .otherwise(size(split(norm, " ", -1)).cast("long")).as("n_tok"))
      .filter(col("n_tok") > 0)
      // SQL `div` = exact 64-bit integer division (quot == floor here:
      // every operand is non-negative); a double-path floor(a/b) would
      // silently wobble past 2^53 tokens
      .withColumn("shard", expr(s"id div $shardSize"))

    // (1) within-shard running end offset — window state bounded by shard
    val inShard = Window.partitionBy("shard").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = toks.withColumn("local_end", sum("n_tok").over(inShard))

    // (2) shard base offsets: totals (corpus/shardSize rows), running sum
    // EXCLUSIVE of the current shard, broadcast back
    val beforeShard = Window.orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = toks.groupBy("shard").agg(sum("n_tok").as("shard_tok"))
      .withColumn("base", coalesce(sum("shard_tok").over(beforeShard), lit(0L)))
      .select("shard", "base")

    val spans = local.join(broadcast(bases), "shard")
      .withColumn("t_end", col("base") + col("local_end"))
      .withColumn("t_start", col("t_end") - col("n_tok"))
      .withColumn("c0", expr(s"t_start div $ctxLen"))
      .withColumn("c1", expr(s"(t_end - 1) div $ctxLen"))

    spans.select(col("id").as("doc_id"), col("t_start"), col("t_end"),
        explode(sequence(col("c0"), col("c1"))).as("chunk_id"))
      .select(
        col("chunk_id"),
        col("doc_id"),
        greatest(col("t_start"), col("chunk_id") * ctxLen).as("tok_begin"),
        (least(col("t_end"), (col("chunk_id") + 1) * ctxLen) -
          greatest(col("t_start"), col("chunk_id") * ctxLen)).as("n_tok_in_chunk"))
  }

  /** Per-chunk packing statistics over [[packChunks]] output: how full each
    * context window is and how fragmented (docs sharing it, slices carried
    * over from a document that started in an earlier chunk). The last chunk
    * is the only one allowed to be short.
    */
  def chunkStats(placed: DataFrame): DataFrame = {
    // a slice is carried over iff its document already has a slice in an
    // earlier chunk — per-document window, state bounded by the handful of
    // chunks one document can span
    val perDoc = Window.partitionBy("doc_id")
    placed.withColumn("doc_head_chunk", min("chunk_id").over(perDoc))
      .groupBy("chunk_id").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok_in_chunk").as("n_tokens"),
        sum(when(col("chunk_id") > col("doc_head_chunk"), 1L).otherwise(0L))
          .as("n_carry_in"))
  }
}
