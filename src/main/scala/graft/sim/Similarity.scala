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

  /** Dot product of two array columns, computed in double. */
  def dot(a: Column, b: Column): Column =
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
    val p = probes.select(col(idCol).as("probe_id"), col(embCol).as("p_emb"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb"))
    val joined = c.join(broadcast(p), col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("c_emb"), col("p_emb")))
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
    * size-capped buckets, verify exact cosine ≥ threshold. Two narrow
    * shuffles (bucket group + distinct) regardless of corpus size.
    */
  def annPairs(corpus: DataFrame, idCol: String, embCol: String,
      nPlanes: Int = 16, bandBits: Int = 8, threshold: Double = 0.9,
      maxBucket: Int = 128): DataFrame = {
    val dim = 64 // embeddings table dimension; parameterize when schema varies
    val planes = hyperplanes(nPlanes, dim)
    val nBands = nPlanes / bandBits
    val sig = corpus.select(col(idCol).as("id"), col(embCol).as("emb"),
      lshSignature(col(embCol), planes).as("sig"))
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("sig"), b * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1)).as("key"))
    }
    val bandRows = sig.select(col("id"), col("emb"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("emb"), col("bb.band"), col("bb.key"))
    val buckets = bandRows.groupBy("band", "key")
      .agg(collect_list(struct(col("id"), col("emb"))).as("xs"))
      .filter(size(col("xs")).between(2, maxBucket))
    buckets
      .select(explode(col("xs")).as("x"), col("xs"))
      .select(col("x.id").as("a"), col("x.emb").as("ea"), explode(col("xs")).as("y"))
      .filter(col("a") < col("y.id"))
      .select(col("a"), col("y.id").as("b"), col("ea"), col("y.emb").as("eb"))
      .distinct()
      .withColumn("cosine", cosine(col("ea"), col("eb")))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), col("cosine"))
  }
}
