package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Vector math uses only built-in higher-order functions (`zip_with` /
  * `aggregate`) — fully codegen'd, no UDFs, and the sequential left-to-right
  * fold makes the arithmetic bit-reproducible across engines (the DuckDB
  * oracle mirrors it with `list_*`).
  *
  * Scale path: brute-force top-k is one scan + TakeOrderedAndProject (fine
  * for one probe over any corpus); the many-probe form broadcasts probes and
  * aggregates map-side; the ANN form buckets by deterministic random-
  * hyperplane signatures so candidate sets stay bounded.
  */
object Similarity {

  /** Dot product of two array columns, computed in double — a native
    * codegen'd Catalyst expression ([[graft.functions.VectorExpressions]]);
    * accumulation order (left-to-right) matches the HOF form
    * `aggregate(zip_with(a,b,_*_), 0d, _+_)` bit-for-bit.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  /** The interpreted higher-order-function formulation — kept as the
    * reference semantics the native expression must match exactly.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k against one probe vector: scan + bounded heap
    * (Catalyst plans orderBy+limit as TakeOrderedAndProject — no full sort,
    * no shuffle of the corpus).
    */
  def topK(corpus: DataFrame, idCol: String, embCol: String,
      probe: Seq[Double], k: Int): DataFrame = {
    val p = typedlit(probe)
    corpus
      .select(col(idCol).as("id"), cosine(col(embCol), p).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** k-NN join: top-k corpus neighbors for every probe row. Probes are
    * broadcast (the small side); ranking is a per-probe window over the
    * joined frame. Suitable when |probes| ≪ |corpus|.
    */
  def knnJoin(probes: DataFrame, corpus: DataFrame, idCol: String, embCol: String,
      k: Int): DataFrame = {
    // Norms are computed once per row on each side; per-pair work is then a
    // single dot product (vs 3 array folds if cosine() ran per pair).
    val p = probes.select(col(idCol).as("probe_id"), col(embCol).as("p_emb"),
      norm(col(embCol)).as("p_nrm"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb"),
      norm(col(embCol)).as("c_nrm"))
    val joined = c.join(broadcast(p), col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        dot(col("c_emb"), col("p_emb")) / (col("c_nrm") * col("p_nrm")))
    val w = Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("neighbor_id"))
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Deterministic Rademacher (±1) hyperplanes: sign of a seeded integer hash
    * of (plane, dim) — reproducible with no RNG state, which keeps plans
    * replayable (and resume-safe) at any scale.
    */
  def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, j) =>
      var h = (p.toLong << 32 | j.toLong) * 0x9e3779b97f4a7c15L
      h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
      if (((h >>> 16) & 1L) == 0L) 1.0 else -1.0
    }

  /** Random-hyperplane LSH signature (one bit per plane, packed to a long). */
  def lshSignature(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (plane, i) =>
      when(dot(emb, typedlit(plane.toSeq)) > 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** ANN near-neighbor pairs: bucket by hyperplane-signature bands, expand
    * size-capped buckets, verify exact cosine ≥ threshold.
    *
    * Buckets carry ids only — candidate pairs are deduped as narrow
    * `(a, b)` longs, then embeddings are joined back for the exact check
    * (hashing/shuffling float arrays through `distinct` is the scale trap).
    * Band-key width (`bandBits`) sets the bucket count per band; size it so
    * corpus/2^bandBits stays well under `maxBucket` at the target scale.
    */
  def annPairs(corpus: DataFrame, idCol: String, embCol: String,
      nPlanes: Int = 24, bandBits: Int = 6, threshold: Double = 0.9,
      maxBucket: Int = 512): DataFrame = {
    val dim = 64 // embeddings table dimension; parameterize when schema varies
    val planes = hyperplanes(nPlanes, dim)
    val nBands = nPlanes / bandBits
    val e = graft.functions.ColOps.parallelize(
      corpus.select(col(idCol).as("id"), col(embCol).as("emb"),
        norm(col(embCol)).as("nrm")))
    val sig = e.select(col("id"), lshSignature(col("emb"), planes).as("sig"))
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("sig"), b * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1)).as("key"))
    }
    val bandRows = sig.select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.key"))
    val buckets = bandRows.groupBy("band", "key")
      .agg(collect_list("id").as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    val pairs = buckets
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(col("ids")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
    pairs
      .join(e.select(col("id").as("a"), col("emb").as("ea"), col("nrm").as("na")), Seq("a"))
      .join(e.select(col("id").as("b"), col("emb").as("eb"), col("nrm").as("nb")), Seq("b"))
      .withColumn("cosine", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), col("cosine"))
  }
}
