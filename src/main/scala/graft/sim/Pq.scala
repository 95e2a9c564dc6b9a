package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ColOps

/** Product quantization — the memory side of the 100 TB embedding story:
  * a d-dim float vector (d·4 bytes) compresses to `m` small codes (m bytes
  * at k ≤ 256), so a corpus whose raw vectors span terabytes keeps its
  * codes in a fraction of the space, and approximate distances are
  * computed WITHOUT touching the original vectors (ADC — asymmetric
  * distance computation: per probe, an m×k lookup table of sub-distances;
  * per corpus row, m table lookups and adds).
  *
  * Pipeline shape: `fit` is m small in-process Lloyd runs over one bounded
  * collected sample ([[LocalKMeans]] — the loop is over SUBSPACES, never
  * corpus data); `encode` is one narrow map
  * over the corpus (pure Column expressions, codegen'd — no UDF);
  * `search` broadcasts the probe's lookup table as a literal and plans as
  * scan + TakeOrderedAndProject. Compose with [[Ivf]] for IVF-PQ: encode
  * each inverted list and ADC-scan only the probed lists.
  */
object Pq {

  /** `codebooks(j)(c)` is centroid `c` of subspace `j` (length `dsub`). */
  final case class Model(m: Int, dsub: Int, codebooks: Seq[Seq[Seq[Double]]]) {
    require(codebooks.length == m)
    def k: Int = codebooks.head.length
  }

  /** Fit `m` subspace codebooks of `k` centroids each on a bounded sample.
    * `dim` must be divisible by `m`.
    */
  // maxIter 6: same rationale as Ivf.build — subspace codebooks stabilize in
  // a few Lloyd iterations
  def fit(corpus: DataFrame, embCol: String, dim: Int, m: Int = 8,
      k: Int = 16, seed: Long = 42L, maxIter: Int = 6,
      maxFitRows: Int = 100000): Model = {
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    require(k >= 2 && k <= 256, s"k out of [2,256]: $k")
    val dsub = dim / m
    // ONE bounded collect of the train sample (≤ maxFitRows rows), then m
    // in-process Lloyd fits over its subspace slices ([[LocalKMeans]]) —
    // the r11 shape ran the m fits as concurrent Spark jobs and still paid
    // m × maxIter job-scheduling latencies for sub-megabyte per-subspace
    // data; locally each fit is sub-millisecond and exactly reproducible.
    val sample = corpus
      .select(col(embCol).cast("array<double>").as("emb"))
      .limit(maxFitRows)
      .collect().map(_.getSeq[Double](0).toArray)
    val books: Seq[Seq[Seq[Double]]] = (0 until m).map { j =>
      val sub = sample.map(p =>
        java.util.Arrays.copyOfRange(p, j * dsub, (j + 1) * dsub)).toIndexedSeq
      // LocalKMeans always returns exactly k centers (degenerate subspaces
      // yield duplicates — harmless, argmin ties break to the lowest index)
      LocalKMeans.fit(sub, k, seed + j, maxIter).map(_.toSeq)
    }
    Model(m, dsub, books)
  }

  /** Nearest-centroid SCORE for a slice of `emb` against a constant
    * centroid: `−2·x·c + ‖c‖²`. The `‖x‖²` term of the true squared
    * distance is identical across a subspace's k candidates, so dropping
    * it leaves the argmin unchanged and halves the per-candidate work to
    * ONE dot against a literal (codegen'd) plus a precomputed constant.
    */
  private def subScore(emb: Column, j: Int, dsub: Int, cent: Seq[Double]): Column = {
    val x = slice(emb, j * dsub + 1, dsub)
    val cNorm2 = cent.map(v => v * v).sum
    lit(cNorm2) - lit(2.0) * Similarity.dot(x, typedlit(cent))
  }

  /** Encode the corpus: adds `codes` — an array of `m` codes, `codes(j)` =
    * index of the nearest subspace-`j` centroid. Ties break to the lowest
    * index (struct min compares distance first, then index) so encoding is
    * deterministic. Narrow, no shuffle.
    */
  def encode(corpus: DataFrame, idCol: String, embCol: String,
      model: Model, keepCols: Seq[String] = Nil): DataFrame = {
    val emb = col(embCol).cast("array<double>")
    val codeCols = (0 until model.m).map { j =>
      val cands = (0 until model.k).map { c =>
        struct(subScore(emb, j, model.dsub, model.codebooks(j)(c)).as("d"),
          lit(c).as("i"))
      }
      array_min(array(cands: _*)).getField("i")
    }
    ColOps.parallelize(corpus)
      .select(col(idCol).as("id") +: array(codeCols: _*).as("codes") +:
        keepCols.map(col): _*)
  }

  /** ADC top-k: approximate squared distances to `probe` via the probe's
    * m×k lookup table (computed driver-side — it is m·k doubles, broadcast
    * as a literal). Plans as scan + TakeOrderedAndProject; the original
    * vectors are never read.
    */
  def search(encoded: DataFrame, model: Model, probe: Seq[Double],
      topK: Int): DataFrame = {
    require(probe.length == model.m * model.dsub,
      s"probe dim ${probe.length} != ${model.m * model.dsub}")
    val lut: Seq[Seq[Double]] = (0 until model.m).map { j =>
      val p = probe.slice(j * model.dsub, (j + 1) * model.dsub)
      (0 until model.k).map { c =>
        val cent = model.codebooks(j)(c)
        p.zip(cent).map { case (a, b) => (a - b) * (a - b) }.sum
      }
    }
    val lutCol = typedlit(lut)
    val approx = aggregate(
      sequence(lit(0), lit(model.m - 1)),
      lit(0.0),
      (acc, j) => acc +
        element_at(element_at(lutCol, j.cast("int") + 1),
          element_at(col("codes"), j.cast("int") + 1) + 1))
    encoded.withColumn("approx_dist", approx)
      .orderBy(col("approx_dist").asc, col("id").asc)
      .limit(topK)
      .select(col("id"), col("approx_dist"))
  }

  /** Persist the codebooks as a tiny `(j, c, cent)` table — together with
    * [[Ivf.saveCentroids]] this is everything an external engine needs to
    * reproduce IVF-PQ encoding and ADC search exactly.
    */
  def saveCodebooks(model: Model, spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    val rows = for { j <- 0 until model.m; c <- 0 until model.k }
      yield (j, c, model.codebooks(j)(c))
    rows.toDF("j", "c", "cent")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** A persisted IVF-PQ index loaded back from disk: coarse centroids, PQ
    * codebooks, and the encoded codes frame (`listId, id, codes`) read from
    * parquet — search via [[searchEncoded]] never re-fits or re-encodes.
    */
  final case class LoadedIndex(centroids: Seq[Seq[Double]], model: Model,
      codes: DataFrame)

  /** Persist the COMPLETE IVF-PQ index: coarse centroids + PQ codebooks
    * (tiny driver-side tables) and the encoded codes parquet PARTITIONED BY
    * `listId` — at serving scale a search touches `nProbe` directories of
    * m-byte code rows, never a raw vector. Build once, serve many.
    */
  def save(index: Ivf.Index, model: Model, path: String): Unit = {
    val spark = index.lists.sparkSession
    Ivf.saveCentroids(index, path)
    saveCodebooks(model, spark, path)
    // REBALANCE BY listId before the partitioned write: without it every
    // upstream task writes one file into every list directory it touches
    // (32 tasks × 16 lists = ~500 tiny files for a 2k-row corpus — the
    // measured 3.2 s of v8's save was mostly file/committer overhead).
    // Rebalancing co-locates each list into AQE-sized output partitions:
    // a small corpus lands as one file per list, a 100 TB one splits to
    // the advisory byte target — and every later nProbe-pruned search
    // reads bounded footers per list (the d15s/saveIndex discipline).
    encode(index.lists, "id", "emb", model, keepCols = Seq("listId"))
      .hint("rebalance", "listId")
      .write.mode("overwrite").partitionBy("listId").parquet(s"$path/codes")
  }

  /** Incrementally add vectors to a PERSISTED IVF-PQ index — the
    * [[graft.sim.Ivf.append]] analog for the encoded form, and the ingest
    * path that keeps the serving index tracking a growing corpus between
    * (rare, sampled) refits: the delta is assigned against the EXISTING
    * coarse centroids and encoded with the EXISTING codebooks — one narrow
    * codegen'd pass, no KMeans anywhere — then appended to the
    * `listId`-partitioned codes parquet, touching only the partitions the
    * new rows land in. At 100 TB a rebuild re-encodes the corpus; an append
    * writes m bytes per new row. Quantizer/codebook drift is the documented
    * trade, exactly as in every ANN system's add-without-train.
    *
    * Because assignment and encoding are deterministic per row given the
    * persisted artifacts, build(base) + append(delta) is bit-identical to
    * build-encoding base∪delta against the same centroids/codebooks — which
    * is what lets the v12 contract query hash-check this path end-to-end.
    */
  def append(spark: SparkSession, path: String, rows: DataFrame,
      idCol: String, embCol: String): LoadedIndex = {
    val idx = load(spark, path)
    val dim = idx.model.m * idx.model.dsub
    val e = ColOps.parallelize(
      rows.select(col(idCol).as("id"), col(embCol).cast("array<double>").as("emb"),
        Similarity.norm(col(embCol)).as("nrm")))
    // same ingest-boundary guard as Ivf.append: a null or wrong-dimension
    // vector would fold to garbage codes and corrupt the serving parquet
    val bad = e.filter(col("emb").isNull || size(col("emb")) =!= dim ||
      exists(col("emb"), _.isNull)).limit(1).count()
    require(bad == 0,
      s"append rows must match the fitted dim $dim with no null elements; " +
        "found a null or differently-sized embedding")
    encode(Ivf.assign(e, idx.centroids), "id", "emb", idx.model,
      keepCols = Seq("listId"))
      .hint("rebalance", "listId") // one sized file per touched list (save's discipline)
      .write.mode("append").partitionBy("listId").parquet(s"$path/codes")
    load(spark, path)
  }

  /** Load a [[save]]d index. The `Model` is reconstructed from the codebook
    * table (m = distinct j, k = distinct c, dsub = centroid length); codes
    * stay a lazy parquet scan so the broadcast probe-list join can prune to
    * the probed `listId` partitions at run time.
    */
  def load(spark: SparkSession, path: String): LoadedIndex = {
    val cents = spark.read.parquet(s"$path/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1).map(_._2)
    val cbRows = spark.read.parquet(s"$path/codebooks")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    val m = cbRows.map(_._1).max + 1
    val books = (0 until m).map { j =>
      cbRows.filter(_._1 == j).sortBy(_._2).map(_._3).toSeq
    }
    val codes = spark.read.parquet(s"$path/codes")
      .select(col("listId"), col("id"), col("codes"))
    LoadedIndex(cents.toSeq, Model(m, books.head.head.length, books), codes)
  }

  /** IVF-PQ: the composed 100 TB search path — the IVF quantizer restricts
    * each probe to its `nProbe` inverted lists; within them candidates are
    * ranked by PQ ADC distance, so the search never touches a raw corpus
    * vector (codes are `m` bytes/row vs `dim·4`).
    *
    * Set-oriented: each probe's m×k LUT is computed as a Column on the
    * (tiny) probe frame, which then BROADCASTS to the encoded lists — one
    * narrow join on `listId`, a per-row m-lookup fold, and a per-probe
    * top-k window. Every fold is left-to-right over fixed slices, so the
    * whole pipeline is reproducible from the persisted centroids+codebooks.
    */
  def ivfpqSearch(index: Ivf.Index, model: Model, probes: DataFrame,
      idCol: String, embCol: String, nProbe: Int = 4, topK: Int = 10): DataFrame = {
    // Materialize the encoded corpus once and TRUNCATE its lineage: the
    // assign+encode tree carries m×k literal codebooks, and every downstream
    // stage (join, window, sort) would re-run Catalyst analysis/codegen over
    // that mega-tree — on a 2k-row test corpus the optimizer walk costs more
    // than the data. The checkpointed frame is exactly the PQ memory story:
    // (listId, id, codes) at m bytes per row, never the raw vectors. At
    // serving scale you'd persist this with [[save]] and search the LOADED
    // index instead (build once, serve many — [[searchEncoded]] over
    // [[load]]).
    val encoded = encode(index.lists, "id", "emb", model, keepCols = Seq("listId"))
      .localCheckpoint()
    searchEncoded(encoded, index.centroids, model, probes, idCol, embCol, nProbe, topK)
  }

  /** ADC search over an ALREADY-ENCODED corpus — the serve-path core shared
    * by [[ivfpqSearch]] (encode-on-the-fly) and a [[load]]ed persisted
    * index. `encoded` carries `(listId, id, codes)` only; raw vectors are
    * never read.
    */
  def searchEncoded(encoded: DataFrame, centroids: Seq[Seq[Double]],
      model: Model, probes: DataFrame, idCol: String, embCol: String,
      nProbe: Int = 4, topK: Int = 10): DataFrame = {
    val w = Window.partitionBy("probe_id").orderBy(col("approx").asc, col("id").asc)
    adcCandidates(encoded, centroids, model, probes, idCol, embCol, nProbe)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("probe_id"), col("id").as("neighbor_id"),
        round(col("approx"), 6).as("approx_dist"), col("rank"))
  }

  /** The shared ADC candidate stage: probed lists joined to the encoded
    * corpus with the per-probe lookup-table distance — `(probe_id, id,
    * approx)`, no ordering semantics applied yet. [[searchEncoded]] ranks
    * it; [[radiusEncoded]] filters it.
    */
  private def adcCandidates(encoded: DataFrame, centroids: Seq[Seq[Double]],
      model: Model, probes: DataFrame, idCol: String, embCol: String,
      nProbe: Int): DataFrame = {
    val spark = probes.sparkSession
    import spark.implicits._
    val cents = centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("listId", "cent")
    // ONE nested-transform expression over a codebook literal instead of
    // m×k unrolled subtrees: the result (and fold order per (j,c) cell) is
    // identical, but the Catalyst tree is O(1) in m·k — the unrolled form's
    // 128 aggregate(zip_with(slice…)) subtrees made every fresh plan of the
    // serve path pay ~1 s of analysis+codegen, which is exactly the cost the
    // amortized-serve contract (v8s) is supposed to exclude. Probes are a
    // handful of rows, so the interpreted HOF evaluation is noise.
    val cbLit = typedlit(model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val lutCol = transform(sequence(lit(0), lit(model.m - 1)), j =>
      transform(element_at(cbLit, j + 1), cent =>
        aggregate(
          zip_with(slice(col("p_emb"), j * lit(model.dsub) + lit(1), lit(model.dsub)),
            cent, (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, v) => acc + v)))
    val p = probes.select(col(idCol).as("probe_id"),
      col(embCol).cast("array<double>").as("p_emb"))
      .withColumn("lut", lutCol)
    val d2 = aggregate(
      zip_with(col("p_emb"), col("cent"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, v) => acc + v)
    val wl = Window.partitionBy("probe_id").orderBy(col("d2").asc, col("listId").asc)
    val probeLists = p.crossJoin(broadcast(cents))
      .withColumn("d2", d2)
      .withColumn("lr", row_number().over(wl))
      .filter(col("lr") <= nProbe)
      .select(col("probe_id"), col("lut"), col("listId"))
    val approx = aggregate(
      sequence(lit(0), lit(model.m - 1)),
      lit(0.0),
      (acc, j) => acc +
        element_at(element_at(col("lut"), j.cast("int") + 1),
          element_at(col("codes"), j.cast("int") + 1) + 1))
    encoded
      .join(broadcast(probeLists), Seq("listId"))
      .filter(col("id") =!= col("probe_id"))
      .withColumn("approx", approx)
      .select(col("probe_id"), col("id"), col("approx"))
  }

  /** RADIUS form of the ADC serve path — every candidate in the probed
    * lists whose approximate distance clears `maxApproxD2`: no rank window,
    * no per-probe state, a pure filter over the code scan (the
    * [[graft.sim.Ivf.radiusSearch]] shape at PQ memory cost — m bytes per
    * candidate, raw vectors never read). For unit-normalized embeddings the
    * threshold is principled: exact d² = 2·(1 − cos), so a cosine floor τ
    * maps to maxApproxD2 ≈ slack · 2(1 − τ); ADC error means the caller
    * verifies survivors exactly (the v9 rerank recipe) — this stage only
    * bounds how much of the archive the exact pass touches. Approx is
    * 6dp-rounded BEFORE thresholding so a replaying engine lands on the
    * same shortlist.
    */
  def radiusEncoded(encoded: DataFrame, centroids: Seq[Seq[Double]],
      model: Model, probes: DataFrame, idCol: String, embCol: String,
      nProbe: Int, maxApproxD2: Double): DataFrame =
    adcCandidates(encoded, centroids, model, probes, idCol, embCol, nProbe)
      .withColumn("approx_dist", round(col("approx"), 6))
      .filter(col("approx_dist") <= maxApproxD2)
      .select(col("probe_id"), col("id").as("neighbor_id"), col("approx_dist"))

  /** [[radiusEncoded]] over an in-memory index: encode + truncate lineage,
    * then the threshold scan (the [[ivfpqSearch]] composition for the
    * radius form).
    */
  def ivfpqRadius(index: Ivf.Index, model: Model, probes: DataFrame,
      idCol: String, embCol: String, nProbe: Int,
      maxApproxD2: Double): DataFrame = {
    val encoded = encode(index.lists, "id", "emb", model, keepCols = Seq("listId"))
      .localCheckpoint()
    radiusEncoded(encoded, index.centroids, model, probes, idCol, embCol,
      nProbe, maxApproxD2)
  }
}
