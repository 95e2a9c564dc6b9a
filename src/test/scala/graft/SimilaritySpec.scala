package graft

import org.apache.spark.sql.functions._

import graft.sim.{Ivf, Similarity}

/** Similarity search: brute-force top-k, k-NN join, ANN pairs, IVF. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 40 vectors in 4 tight clusters around orthogonal axes (dim 8)
  private def clustered = {
    val rows = for {
      c <- 0 until 4
      i <- 0 until 10
    } yield {
      val base = Array.fill(8)(0.05f * ((c * 10 + i) % 3))
      base(c * 2) = 1.0f
      base(c * 2 + 1) = 0.1f * i
      ((c * 10 + i).toLong, c, base.toSeq)
    }
    rows.toDF("vec_id", "label", "embedding")
  }

  test("V1: topK returns k rows ranked by exact cosine") {
    val df = clustered
    val probe = Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val top = Similarity.topK(df, "vec_id", "embedding", probe, 5).collect()
    assert(top.length === 5)
    val cosines = top.map(_.getAs[Double]("cosine"))
    assert(cosines.sameElements(cosines.sorted.reverse), "descending order")
    // all top-5 are from cluster 0 (ids 0..9)
    assert(top.map(_.getAs[Long]("id")).forall(_ < 10L))
  }

  test("V2: knnJoin gives each probe k neighbors, none itself") {
    val df = clustered
    val out = Similarity.knnJoin(df.filter($"vec_id" < 3), df, "vec_id", "embedding", 3)
      .collect()
    assert(out.length === 9)
    out.foreach(r => assert(r.getAs[Long]("probe_id") != r.getAs[Long]("neighbor_id")))
    val ranks = out.filter(_.getAs[Long]("probe_id") == 0L).map(_.getAs[Int]("rank")).sorted
    assert(ranks.sameElements(Array(1, 2, 3)))
  }

  test("V10: marginMining scores a true near-duplicate above its neighborhood") {
    val df = clustered
    val out = Similarity.marginMining(df.filter($"vec_id" < 3), df,
      "vec_id", "embedding", k = 4).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[Long]("probe_id") != r.getAs[Long]("neighbor_id"))
      // the rank-1 cosine is by definition ≥ the k-NN mean on the probe
      // side, so margin against the two-sided mean stays near/above 1
      assert(r.getAs[Double]("margin") > 0.9,
        s"margin collapsed: ${r.mkString(",")}")
    }
    // margin must exceed raw cosine's rank ordering only via density — both
    // columns are present and rounded
    assert(out.forall(r => !r.isNullAt(r.fieldIndex("margin"))))
  }

  test("V3: annPairs finds within-cluster pairs, never cross-cluster ones") {
    val pairs = Similarity.annPairs(clustered, "vec_id", "embedding",
      nBands = 4, bandBitsOverride = 6, threshold = 0.8, maxBucket = 64)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Double]("cosine")))
    assert(pairs.nonEmpty, "tight clusters must produce candidate pairs")
    pairs.foreach { case (a, b, cos) =>
      assert(a / 10 === b / 10, s"cross-cluster pair ($a,$b) above 0.8 is impossible")
      assert(cos >= 0.8)
    }
  }

  test("V3: band-key width tracks corpus size (constant expected bucket)") {
    assert(Similarity.bandBitsFor(40L, 32) === 4) // floor: ≥16 buckets
    assert(Similarity.bandBitsFor(2000L, 32) === 6)
    assert(Similarity.bandBitsFor(2048000L, 32) === 16)
    assert(Similarity.bandBitsFor(2L * 1000 * 1000 * 1000, 32) === 24) // ceiling
    // doubling n adds one bit → expected bucket size is scale-invariant
    assert(Similarity.bandBitsFor(4000L, 32) === Similarity.bandBitsFor(2000L, 32) + 1)
  }

  test("V3: annPairs derives dim and sizes geometry from the data") {
    // no dim/bandBits passed: dim=8 and bandBits come from the corpus itself
    val pairs = Similarity.annPairs(clustered, "vec_id", "embedding",
      nBands = 4, threshold = 0.8, maxBucket = 64)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) => assert(a / 10 === b / 10) }
  }

  test("V3: portable variant — same cluster discipline, integer band width") {
    val pairs = Similarity.annPairsPortable(clustered, "vec_id", "embedding",
      nBands = 4, threshold = 0.8, maxBucket = 64)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) => assert(a / 10 === b / 10) }
    // integer band width agrees with the float formula away from boundaries
    assert(Similarity.bandBitsPortable(2000L, 32) === 6)
    assert(Similarity.bandBitsPortable(40L, 32) === 4)
    assert(Similarity.bandBitsPortable(2048000L, 32) === 16)
    // exact power-of-two boundary: 2^b buckets exactly fit n/targetBucket
    assert(Similarity.bandBitsPortable(32L * 64, 32) === 6)
    // planes are ±1 only and deterministic
    val p = Similarity.portablePlanes(8, 16)
    assert(p.flatten.forall(v => v == 1.0 || v == -1.0))
    assert(p.map(_.toSeq).toSeq === Similarity.portablePlanes(8, 16).map(_.toSeq).toSeq)
    // empty corpus → empty pair set, not a crash
    assert(Similarity.annPairsPortable(clustered.limit(0), "vec_id", "embedding")
      .count() === 0L)
  }

  test("V5: IVF with nProbe == nLists is exact (matches brute-force knnJoin)") {
    val df = clustered
    val idx = Ivf.build(df, "vec_id", "embedding", nLists = 4)
    val probes = df.filter($"vec_id".isin(0L, 15L, 27L, 39L))
    val ivf = Ivf.search(idx, probes, "vec_id", "embedding", nProbe = 4, k = 3)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Int]("rank")) ->
        r.getAs[Long]("neighbor_id")).toMap
    val brute = Similarity.knnJoin(probes, df, "vec_id", "embedding", 3)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Int]("rank")) ->
        r.getAs[Long]("neighbor_id")).toMap
    assert(ivf === brute)
  }

  test("V17: filtered search == brute-force over the allowed corpus; " +
      "post-filtering a plain top-k under-returns") {
    val df = clustered
    val idx = Ivf.build(df, "vec_id", "embedding", nLists = 4)
    val probes = df.filter($"vec_id".isin(0L, 15L, 27L, 39L))
    val allowed = df.filter($"vec_id" % 2 === 0).select("vec_id")
    // nProbe == nLists → the filtered search is EXACT over the allowed set
    val filt = Ivf.searchFiltered(idx, probes, "vec_id", "embedding",
      allowed, nProbe = 4, k = 3)
    val got = filt.collect().map(r => (r.getAs[Long]("probe_id"),
      r.getAs[Int]("rank")) -> r.getAs[Long]("neighbor_id")).toMap
    val brute = Similarity.knnJoin(probes, df.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", 3)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Int]("rank")) ->
        r.getAs[Long]("neighbor_id")).toMap
    assert(got === brute)
    // every survivor satisfies the predicate
    assert(got.values.forall(_ % 2 == 0))
    // the naive alternative — filter AFTER a plain top-k — keeps only the
    // even ids that happened to land in the unfiltered top 3: strictly
    // fewer than k whenever odd neighbors crowd the top (under-return)
    val post = Ivf.search(idx, probes, "vec_id", "embedding", nProbe = 4, k = 3)
      .filter($"neighbor_id" % 2 === 0)
    assert(post.count() < got.size,
      "expected the post-filtered plain top-k to under-return")
  }

  test("zero-norm embeddings rank last and never pass a radius threshold") {
    // regression: 0/0 cosine is NaN, which Spark orders ABOVE every double
    // and passes through every >= filter — one all-zero embedding ranked #1
    // for every probe and joined every radius result. cosineFrom pins it
    // to similarity 0.
    val base = clustered.select("vec_id", "embedding")
    val zero = Seq((999L, Seq.fill(8)(0.0f))).toDF("vec_id", "embedding")
    val corpus = base.unionByName(zero)
    val probes = base.filter($"vec_id" === 0L)
    val knn = Similarity.knnJoin(probes, corpus, "vec_id", "embedding", 3)
      .collect()
    assert(!knn.exists(_.getAs[Long]("neighbor_id") == 999L),
      "a zero vector must not enter the top-k")
    assert(knn.forall(r => !r.getAs[Double]("cosine").isNaN))
    val idx = Ivf.build(corpus, "vec_id", "embedding", nLists = 4)
    val rad = Ivf.radiusSearch(idx, probes, "vec_id", "embedding",
      nProbe = 4, minCosine = 0.5).collect()
    assert(!rad.exists(_.getAs[Long]("neighbor_id") == 999L),
      "a zero vector must not pass the radius threshold")
    // and a zero-norm PROBE finds nothing rather than everything
    assert(Similarity.knnJoin(zero, base, "vec_id", "embedding", 3)
      .filter($"cosine" =!= 0.0).count() === 0L)
  }

  test("V15: radius search with nProbe == nLists matches an exact threshold scan") {
    val df = clustered
    val idx = Ivf.build(df, "vec_id", "embedding", nLists = 4)
    val probes = df.filter($"vec_id".isin(0L, 15L, 27L))
    val got = Ivf.radiusSearch(idx, probes, "vec_id", "embedding",
      nProbe = 4, minCosine = 0.5)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    // exact reference: every (probe, other) pair at rounded cosine >= τ
    val exact = Similarity.knnJoin(probes, df, "vec_id", "embedding", df.count().toInt)
      .filter(round($"cosine", 6) >= 0.5)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    assert(got === exact)
    assert(got.nonEmpty, "threshold chosen so the fixture yields pairs")
    // no self-pairs, and every surfaced cosine honors the threshold
    assert(Ivf.radiusSearch(idx, probes, "vec_id", "embedding", 4, 0.5)
      .filter($"probe_id" === $"neighbor_id" || $"cosine" < 0.5).count() === 0L)
  }

  test("V5: saved+loaded IVF index answers identically to the in-memory one") {
    val df = clustered
    val idx = Ivf.build(df, "vec_id", "embedding", nLists = 4)
    val path = tempDir("ivf") + "/index"
    Ivf.save(idx, path)
    val loaded = Ivf.load(spark, path)
    assert(loaded.centroids === idx.centroids)
    val probes = df.filter($"vec_id" === 0L)
    def run(i: Ivf.Index) = Ivf.search(i, probes, "vec_id", "embedding", 2, 3)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id"))).sorted.toSeq
    assert(run(loaded) === run(idx))
  }

  test("V5: append adds vectors to a persisted index without a refit or rebuild") {
    val df = clustered
    val idx = Ivf.build(df, "vec_id", "embedding", nLists = 4)
    val path = tempDir("ivf_append") + "/index"
    Ivf.save(idx, path)
    // new vectors land in cluster 2's axis region, ids disjoint from the corpus
    val delta = (0 until 5).map { i =>
      val base = Array.fill(8)(0.0f)
      base(4) = 1.0f; base(5) = 0.1f * i
      (100L + i, base.toSeq)
    }.toDF("vec_id", "embedding")
    val appended = Ivf.append(spark, path, delta, "vec_id", "embedding")
    // quantizer untouched; lists grew by exactly the delta
    assert(appended.centroids === idx.centroids)
    assert(appended.lists.count() === 45L)
    // appended rows got the same assignment a from-scratch assign would give
    val expected = Ivf.assign(
      delta.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("emb"),
        Similarity.norm(col("embedding")).as("nrm")),
      idx.centroids)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("listId")).toMap
    val actual = appended.lists.filter(col("id") >= 100L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("listId")).toMap
    assert(actual === expected)
    // a search now surfaces the appended neighbors for an in-cluster probe
    val hits = Ivf.search(appended, delta.filter($"vec_id" === 100L),
      "vec_id", "embedding", nProbe = 1, k = 4)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(hits.exists(_ >= 101L), s"appended vectors must be searchable: $hits")
    // ingest-boundary guard: a wrong-dimension vector must fail fast, not
    // argmin through null distances into a garbage list
    val badDim = Seq((200L, Seq.fill(5)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Ivf.append(spark, path, badDim, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("dim"))
  }

  test("V5: IVF with nProbe=1 on tight clusters still finds in-cluster neighbors") {
    val df = clustered
    val idx = Ivf.build(df, "vec_id", "embedding", nLists = 4)
    val out = Ivf.search(idx, df.filter($"vec_id" === 5L), "vec_id", "embedding",
      nProbe = 1, k = 3).collect()
    assert(out.length === 3)
    assert(out.forall(_.getAs[Long]("neighbor_id") < 10L), "neighbors from probe's cluster")
  }

  test("V13: SQ8 codes are in-range and asymmetric search matches exact top-k here") {
    import graft.sim.Sq
    val df = clustered
    val dir = java.nio.file.Files.createTempDirectory("sq_spec").toString
    Sq.saveParams(Sq.fit(df, "embedding"), dir)
    val p = Sq.loadParams(spark, dir)
    assert(p.mins.length === 8 && p.steps.forall(_ > 0.0))
    val codes = Sq.encode(df, "vec_id", "embedding", p)
    val flat = codes.select(explode(col("code"))).as[Int].collect()
    assert(flat.forall(c => c >= 0 && c <= 255), "codes must be 8-bit")
    // extremes of each dimension must quantize to the end codes
    assert(flat.min === 0 && flat.max === 255)
    // decode(encode(x)) is within half a step of x per dimension
    val err = Sq.decode(codes, "demb", p)
      .join(df.select(col("vec_id").as("id"), col("embedding")), "id")
      .select(max(expr(
        "aggregate(zip_with(demb, embedding, (a, b) -> abs(a - CAST(b AS DOUBLE))), 0D, (m, v) -> greatest(m, v))")))
      .as[Double].head()
    assert(err <= p.steps.max / 2 + 1e-12, s"reconstruction error $err exceeds step/2")
    // on well-separated clusters the quantized ranking agrees with exact
    val exact = Similarity.knnJoin(df.filter($"vec_id" === 5), df, "vec_id", "embedding", 5)
      .select("neighbor_id").as[Long].collect().toSet
    val sq = Sq.search(codes, p, df.filter($"vec_id" === 5), "vec_id", "embedding", 5)
      .select("neighbor_id").as[Long].collect().toSet
    assert((exact intersect sq).size >= 4, s"SQ8 top-5 diverged: exact=$exact sq=$sq")
  }

  test("D11: SemDeDup composition — quantizer lists block the cosine dedup") {
    import graft.dedup.Dedup
    val df = clustered
    val idx = Ivf.build(df, "vec_id", "embedding", nLists = 4)
    val pairs = Dedup.embeddingNearDup(
      idx.lists.select(col("listId"), col("id"), col("emb")),
      "id", "emb", "listId", threshold = 0.95)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    assert(pairs.nonEmpty, "tight clusters must yield near-dup pairs")
    // the learned block equals the true cluster here, so no pair crosses one
    assert(pairs.forall { case (a, b) => a / 10 === b / 10 },
      s"cross-cluster pair leaked through the quantizer block: ${pairs.toSeq}")
    // keep-the-min-id verdict drops exactly the b sides
    val dropped = pairs.map(_._2).toSet
    assert(!dropped.exists(pairs.map(_._1).toSet.diff(dropped).contains))
  }

  test("V14: inertia covers every vector and falls as the quantizer gets more lists") {
    val df = clustered
    val coarse = Ivf.inertia(Ivf.build(df, "vec_id", "embedding", nLists = 2))
      .agg(org.apache.spark.sql.functions.sum("n_vecs"),
        org.apache.spark.sql.functions.sum("inertia")).collect()(0)
    val fine = Ivf.inertia(Ivf.build(df, "vec_id", "embedding", nLists = 4))
      .agg(org.apache.spark.sql.functions.sum("n_vecs"),
        org.apache.spark.sql.functions.sum("inertia")).collect()(0)
    assert(coarse.getLong(0) === 40L && fine.getLong(0) === 40L,
      "every vector must be counted exactly once")
    // 4 tight clusters: a 4-list quantizer centers each cluster, a 2-list
    // one must merge clusters — strictly worse total quantization error
    assert(fine.getDouble(1) < coarse.getDouble(1),
      s"inertia must fall with resolution: ${fine.getDouble(1)} vs ${coarse.getDouble(1)}")
  }
}
