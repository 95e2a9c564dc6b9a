package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ColOps

/** IVF-flat approximate nearest-neighbor index: a KMeans coarse quantizer
  * partitions the corpus into inverted lists; a query ranks centroids
  * exactly, scans only the `nProbe` nearest lists, and does exact cosine
  * top-k within the candidates.
  *
  * Scale path: the index build is one (sampled) KMeans fit plus one narrow
  * assignment pass; `lists` can be written out partitioned/bucketed by
  * `listId` so a search shuffles nothing — probes broadcast to the lists they
  * touch. Search cost is corpus/nLists × nProbe per probe instead of the
  * brute-force full scan.
  */
object Ivf {

  /** `centroids(i)` is the center of inverted list `i`; `lists` holds
    * `(listId, id, emb, nrm)` — norms precomputed so the verify stage is one
    * dot product per candidate.
    */
  final case class Index(centroids: Seq[Seq[Double]], lists: DataFrame)

  /** The quantizer is fit DRIVER-LOCALLY on a bounded sample (collect ≤
    * `maxFitRows` rows once, Lloyd in-process — [[LocalKMeans]]; at 100 TB
    * you fit on a sample regardless, and a distributed iterative fit of a
    * ≤51 MB sample is pure scheduling overhead) — only the single-pass
    * assignment runs over the full corpus.
    *
    * Assignment runs through [[assign]] (portable argmin over the fitted
    * centroids) rather than `model.transform`, so given the persisted
    * centroid table any engine reproduces the exact same inverted lists —
    * that is what turns the v5 contract query from rows-only into a full
    * DuckDB hash-match.
    */
  // maxIter 6: a coarse quantizer only partitions the space — past a handful
  // of Lloyd iterations the list assignment barely moves
  def build(corpus: DataFrame, idCol: String, embCol: String,
      nLists: Int = 16, seed: Long = 42L, maxIter: Int = 6,
      maxFitRows: Int = 100000): Index = {
    val e = ColOps.parallelize(
      corpus.select(col(idCol).as("id"), col(embCol).cast("array<double>").as("emb"),
        Similarity.norm(col(embCol)).as("nrm")))
    // ONE bounded collect (≤ maxFitRows rows — the only driver-side data
    // path in the build, and it is the train sample, not the corpus)
    val sample = e.select(col("emb")).limit(maxFitRows)
      .collect().map(_.getSeq[Double](0).toArray).toIndexedSeq
    val centroids: Seq[Seq[Double]] =
      LocalKMeans.fit(sample, nLists, seed, maxIter).map(_.toSeq)
    Index(centroids, assign(e, centroids))
  }

  /** Nearest-centroid assignment as a pure Column argmin: squared L2 to each
    * centroid via a left-to-right `zip_with`/`aggregate` fold (bit-identical
    * to a SQL `list_aggregate(…, 'sum')` over the same doubles), ties to the
    * lowest listId (struct min compares distance first, then index). One
    * narrow codegen'd pass — no shuffle, no model object at scoring time.
    */
  /** One `(d², listId)` struct per centroid for the argmin fold — THE
    * portable distance form every oracle replays (a left-to-right
    * `zip_with`/`aggregate` sum, ties to the lowest listId via struct
    * ordering). [[assign]] and [[inertia]] MUST share this so the fold
    * cannot silently diverge between them.
    */
  private def centroidCands(centroids: Seq[Seq[Double]]): Seq[org.apache.spark.sql.Column] =
    centroids.zipWithIndex.map { case (c, i) =>
      struct(
        aggregate(
          zip_with(col("emb"), typedlit(c), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, v) => acc + v).as("d"),
        lit(i).as("i"))
    }

  def assign(e: DataFrame, centroids: Seq[Seq[Double]]): DataFrame =
    e.withColumn("listId", array_min(array(centroidCands(centroids): _*)).getField("i"))
      .select(col("id"), col("emb"), col("nrm"), col("listId"))

  /** Per-list quantization error of a fitted index — count, Σ min-d²
    * (inertia), and mean — THE refit trigger for an IVF index under
    * [[append]]-style ingest: data drifting away from the fitted centroids
    * shows up as rising inertia long before recall visibly degrades, and
    * the per-list breakdown names the lists that absorbed the drift.
    *
    * Distances re-derive from the centroid table with the same portable
    * argmin fold as [[assign]]; per-row d² is 9dp-rounded and summed in
    * DECIMAL (order-independent), so the whole metric replays in SQL from
    * the persisted centroids. One narrow pass over the lists — no shuffle
    * beyond the 16-row final aggregate.
    */
  def inertia(index: Index): DataFrame =
    index.lists
      .withColumn("best", array_min(array(centroidCands(index.centroids): _*)))
      .select(col("best").getField("i").as("listId"),
        round(col("best").getField("d"), 9).as("d2"))
      .groupBy("listId")
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("d2").cast("decimal(30,9)")).cast("double").as("inertia"))
      .withColumn("mean_d2", round(col("inertia") / col("n_vecs"), 9))
      .orderBy("listId")

  /** Persist the index: inverted lists as parquet partitioned by `listId`
    * (a probe's nProbe lists prune to nProbe directories at scan time),
    * centroids as a tiny parquet alongside. Build once, serve many.
    */
  def save(index: Index, path: String): Unit = {
    // rebalance by listId first — otherwise every upstream task writes a
    // file into every list directory it touches (tasks × lists tiny files;
    // the measured v8 save tax). AQE sizes each list's output: one file
    // per list when small, split to the advisory target at corpus scale.
    index.lists.hint("rebalance", "listId")
      .write.mode("overwrite").partitionBy("listId").parquet(s"$path/lists")
    saveCentroids(index, path)
  }

  /** Persist just the centroid table — the (tiny) artifact an external
    * engine needs to reproduce assignment + search exactly.
    */
  def saveCentroids(index: Index, path: String): Unit = {
    val spark = index.lists.sparkSession
    import spark.implicits._
    index.centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("listId", "cent")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): Index = {
    val cents = spark.read.parquet(s"$path/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1).map(_._2)
    Index(cents.toSeq, spark.read.parquet(s"$path/lists"))
  }

  /** Incrementally add vectors to a PERSISTED index — the serve-side ingest
    * path: new rows are assigned against the EXISTING quantizer (one narrow
    * codegen'd pass, no refit) and appended to the `listId`-partitioned
    * parquet, touching only the partitions the new rows land in. At 100 TB
    * this is how the index tracks a growing corpus between (rare, sampled)
    * quantizer refits — a rebuild rewrites the corpus, an append writes
    * only the delta. Returns the refreshed Index over the same path.
    *
    * Quantizer drift is the operator's documented trade: appended vectors
    * always join their nearest EXISTING list, so recall degrades only if
    * the data distribution moves away from the fitted centroids — the same
    * contract as every IVF serving system's add-without-train.
    */
  def append(spark: org.apache.spark.sql.SparkSession, path: String,
      rows: DataFrame, idCol: String, embCol: String): Index = {
    val idx = load(spark, path)
    val dim = idx.centroids.head.length
    val e = ColOps.parallelize(
      rows.select(col(idCol).as("id"), col(embCol).cast("array<double>").as("emb"),
        Similarity.norm(col(embCol)).as("nrm")))
    // ingest-boundary validation: a wrong-dimension vector would zip_with
    // nulls through the distance fold and argmin to a garbage listId —
    // permanently corrupting the serving parquet. Fail fast instead (one
    // tiny agg over the delta, which is small by definition here).
    // `size(NULL)` is NULL, and a NULL predicate DROPS the row from a
    // filter — a null embedding would sail through a bare size() check, so
    // null rows and null ELEMENTS (which also poison the distance fold)
    // are guarded explicitly.
    val badDim = e.filter(col("emb").isNull || size(col("emb")) =!= dim ||
      exists(col("emb"), _.isNull)).limit(1).count()
    require(badDim == 0,
      s"append rows must match the fitted dim $dim with no null elements; " +
        "found a null or differently-sized embedding")
    assign(e, idx.centroids)
      .hint("rebalance", "listId") // one sized file per touched list (save's discipline)
      .write.mode("append").partitionBy("listId").parquet(s"$path/lists")
    load(spark, path)
  }

  /** Set-oriented search: probes × centroid table (tiny, broadcast) → keep
    * `nProbe` nearest lists per probe → join candidates on `listId` → exact
    * cosine top-k per probe.
    */
  def search(index: Index, probes: DataFrame, idCol: String, embCol: String,
      nProbe: Int = 4, k: Int = 10): DataFrame = {
    val cand = listCandidates(index, probes, idCol, embCol, nProbe)
    val w = Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("id").as("neighbor_id"), col("cosine"), col("rank"))
  }

  /** FILTERED top-k: exact cosine top-k per probe among candidates whose id
    * survives the `allowed` set — metadata-constrained ANN ("nearest
    * neighbors WITH label = X"), the retrieval form curation and RAG-style
    * selection actually issue. The filter applies at the CANDIDATE stage,
    * before the rank window, so the k survivors all satisfy the predicate
    * (post-filtering a plain top-k silently under-returns whenever the
    * unfiltered neighborhood is dominated by excluded ids).
    *
    * `allowed` is a one-column frame of permitted neighbor ids — a
    * metadata dimension's key set, corpus-sublinear, broadcast into the
    * list-pruned join. At archive scale with a FIXED, hot predicate you
    * would instead carry the attribute on the list rows at [[build]] time
    * and let the parquet scan prune on it; the broadcast-dim form here is
    * the general case (any predicate over any metadata table, decided at
    * query time).
    */
  def searchFiltered(index: Index, probes: DataFrame, idCol: String,
      embCol: String, allowed: DataFrame, nProbe: Int = 4,
      k: Int = 10): DataFrame = {
    val keep = allowed.select(col(allowed.columns.head).as("id")).distinct()
    val cand = listCandidates(index, probes, idCol, embCol, nProbe)
      .join(broadcast(keep), Seq("id"))
    val w = Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("id").as("neighbor_id"), col("cosine"), col("rank"))
  }

  /** The shared candidate stage of [[search]] and [[radiusSearch]]: probes
    * ranked against the broadcast centroid table, kept to their `nProbe`
    * nearest lists, joined to the inverted lists with the exact cosine —
    * `(probe_id, id, cosine)` with no ordering semantics applied yet (the
    * [[graft.sim.Pq]] `adcCandidates` factoring).
    */
  private def listCandidates(index: Index, probes: DataFrame, idCol: String,
      embCol: String, nProbe: Int): DataFrame = {
    val spark = probes.sparkSession
    import spark.implicits._
    val cents = index.centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("listId", "cent")
    val p = probes.select(col(idCol).as("probe_id"),
      col(embCol).cast("array<double>").as("p_emb"),
      Similarity.norm(col(embCol)).as("p_nrm"))
    val d2 = aggregate(
      zip_with(col("p_emb"), col("cent"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, v) => acc + v)
    val wl = Window.partitionBy("probe_id").orderBy(col("d2").asc, col("listId").asc)
    val probeLists = p.crossJoin(broadcast(cents))
      .withColumn("d2", d2)
      .withColumn("lr", row_number().over(wl))
      .filter(col("lr") <= nProbe)
      .select(col("probe_id"), col("p_emb"), col("p_nrm"), col("listId"))
    index.lists
      .join(broadcast(probeLists), Seq("listId"))
      .filter(col("id") =!= col("probe_id"))
      .withColumn("cosine", Similarity.cosineFrom(
        Similarity.dot(col("emb"), col("p_emb")), col("nrm"), col("p_nrm")))
      .select(col("probe_id"), col("id"), col("cosine"))
  }

  /** Radius (range) search: EVERY candidate in the probed lists with cosine
    * ≥ `minCosine` — the dedup/contamination form of ANN ("all neighbors
    * this close", not top-k). Same probe plan as [[search]], but the
    * threshold replaces the rank window entirely: no per-probe sort, no
    * state proportional to k — a pure filter over the list-pruned candidate
    * join, which at archive scale is strictly cheaper than top-k and
    * parallelizes perfectly (result size is data-dependent, as a range scan
    * should be). The cosine is rounded to 6dp BEFORE thresholding so an
    * engine replaying the same arithmetic lands on the same verdict set.
    */
  def radiusSearch(index: Index, probes: DataFrame, idCol: String, embCol: String,
      nProbe: Int = 4, minCosine: Double = 0.8): DataFrame =
    listCandidates(index, probes, idCol, embCol, nProbe)
      .withColumn("cosine", round(col("cosine"), 6))
      .filter(col("cosine") >= minCosine)
      .select(col("probe_id"), col("id").as("neighbor_id"), col("cosine"))
}
