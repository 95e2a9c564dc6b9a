package graft

import org.apache.spark.sql.functions._

import graft.sim.{Pq, Similarity}

/** Product quantization: code validity, determinism, compression shape,
  * and ADC recall against exact brute force on separable clusters.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // 4 well-separated clusters of 10 vectors in 16 dims
  private lazy val clustered = {
    val rnd = new scala.util.Random(7)
    (0 until 40).map { i =>
      val c = i / 10
      val base = Array.tabulate(16)(d => if (d % 4 == c) 10.0f else 0.0f)
      (i.toLong, base.map(v => v + rnd.nextFloat() * 0.5f).toSeq)
    }.toDF("vec_id", "embedding")
  }

  private lazy val model = Pq.fit(clustered, "embedding", dim = 16, m = 4, k = 8)

  test("encode: m codes per row, each in [0, k); deterministic") {
    val codes = Pq.encode(clustered, "vec_id", "embedding", model)
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[Int](1)).toMap
    assert(codes.size === 40)
    codes.values.foreach { cs =>
      assert(cs.length === 4)
      assert(cs.forall(c => c >= 0 && c < 8))
    }
    val again = Pq.encode(clustered, "vec_id", "embedding", model)
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[Int](1)).toMap
    assert(codes === again)
    // compression shape: 4 small codes stand in for 16 floats
    assert(model.codebooks.length === 4 && model.codebooks.head.length === 8)
  }

  test("same-cluster vectors share codes more than cross-cluster ones") {
    val codes = Pq.encode(clustered, "vec_id", "embedding", model)
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[Int](1)).toMap
    def overlap(a: Long, b: Long): Int =
      codes(a).zip(codes(b)).count(p => p._1 == p._2)
    val within = (for (a <- 0L to 8L; b <- (a + 1) to 9L) yield overlap(a, b))
    val across = (for (a <- 0L to 9L; b <- 10L to 19L) yield overlap(a, b))
    assert(within.sum.toDouble / within.size > across.sum.toDouble / across.size,
      "PQ codes must reflect cluster structure")
  }

  test("ADC search recalls the exact nearest neighbors on separable data") {
    val encoded = Pq.encode(clustered, "vec_id", "embedding", model).cache()
    val probeRow = clustered.filter($"vec_id" === 5L)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val adc = Pq.search(encoded, model, probeRow, topK = 10)
      .collect().map(_.getAs[Long]("id")).toSet
    // exact brute-force top-10 by squared distance
    val exact = clustered
      .select(col("vec_id"),
        (Similarity.dot(col("embedding").cast("array<double>"), col("embedding").cast("array<double>"))
          - lit(2.0) * Similarity.dot(col("embedding").cast("array<double>"), typedlit(probeRow))).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc).limit(10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = adc.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"ADC recall@10 too low: $recall (adc=$adc exact=$exact)")
    encoded.unpersist()
  }

  test("IVF-PQ composition: coarse lists bound the ADC scan") {
    import graft.sim.Ivf
    val idx = Ivf.build(clustered, "vec_id", "embedding", nLists = 4)
    val codes = Pq.encode(
      idx.lists.select(col("id").as("vec_id"), col("emb").as("embedding")),
      "vec_id", "embedding", model)
    val withLists = idx.lists.select(col("id"), col("listId"))
      .join(codes, Seq("id"))
    val probe = clustered.filter($"vec_id" === 25L)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    // rank centroids exactly (they are tiny and driver-local), probe 2 lists
    val probedLists = idx.centroids.zipWithIndex.map { case (c, i) =>
      (c.zip(probe).map { case (a, b) => (a - b) * (a - b) }.sum, i)
    }.sortBy(_._1).take(2).map(_._2)
    val candidates = withLists.filter(col("listId").isin(probedLists: _*))
    val nCandidates = candidates.count()
    assert(nCandidates < 40, s"probing 2 of 4 lists must bound the scan ($nCandidates)")
    val hits = Pq.search(candidates.select("id", "codes"), model, probe, topK = 5)
      .collect().map(_.getAs[Long]("id"))
    // probe 25 sits in cluster 2 (ids 20-29); its neighbors must dominate
    assert(hits.count(id => id >= 20 && id <= 29) >= 4,
      s"IVF-PQ top-5 should come from the probe's cluster: ${hits.toSeq}")
  }

  test("search never touches the raw vectors (plan reads codes only)") {
    val encoded = Pq.encode(clustered, "vec_id", "embedding", model)
    val plan = Pq.search(encoded, model, Seq.fill(16)(0.0), topK = 5)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("embedding"), s"raw embedding column leaked into ADC:\n$plan")
  }

  test("persisted index: save/load/searchEncoded == from-scratch ivfpqSearch") {
    import graft.sim.Ivf
    val dir = java.nio.file.Files.createTempDirectory("pq_index").toString
    val idx = Ivf.build(clustered, "vec_id", "embedding", nLists = 4)
    val probes = clustered.filter($"vec_id" < 3L)
    val fresh = Pq.ivfpqSearch(idx, model, probes, "vec_id", "embedding",
      nProbe = 2, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    Pq.save(idx, model, dir)
    val loaded = Pq.load(spark, dir)
    // model + centroids survive the roundtrip exactly
    assert(loaded.model === model)
    assert(loaded.centroids === idx.centroids)
    val served = Pq.searchEncoded(loaded.codes, loaded.centroids, loaded.model,
      probes, "vec_id", "embedding", nProbe = 2, topK = 5)
    assert(served.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet === fresh)
    // the serve-path plan reads the codes PARQUET — no KMeans refit, no
    // encode, no raw corpus vector anywhere in it (probe embeddings are the
    // only vectors, and they come from the probe frame)
    assert(loaded.codes.columns.toSeq === Seq("listId", "id", "codes"),
      "loaded codes frame must carry codes only, never raw vectors")
    val scans = served.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.mkString(",")
          case other => other.toString
        }
    }
    assert(scans.exists(_.contains("codes")),
      s"loaded-index search must scan the codes parquet, scans=$scans")
    assert(!scans.exists(_.contains("lists")),
      s"serve path must not read the raw inverted lists, scans=$scans")
  }

  test("append: build(base) + append(delta) == save of the full corpus; no refit") {
    import graft.sim.Ivf
    val base = clustered.filter($"vec_id" < 30)
    val delta = clustered.filter($"vec_id" >= 30)
    val idx = Ivf.build(base, "vec_id", "embedding", nLists = 4)
    val m = Pq.fit(base, "embedding", dim = 16, m = 4, k = 8)

    val dirGrown = java.nio.file.Files.createTempDirectory("pq_grow").toString
    Pq.save(idx, m, dirGrown)
    val grown = Pq.append(spark, dirGrown, delta, "vec_id", "embedding")
    // centroids/codebooks are untouched by the append — add-without-train
    assert(grown.centroids === idx.centroids && grown.model === m)

    // reference: encode base ∪ delta directly against the SAME artifacts
    val full = Pq.encode(
      Ivf.assign(graft.functions.ColOps.parallelize(
        clustered.select($"vec_id".as("id"),
          $"embedding".cast("array<double>").as("emb"),
          Similarity.norm($"embedding").as("nrm"))), idx.centroids),
      "id", "emb", m, keepCols = Seq("listId"))
      .collect().map(r => (r.getAs[Long]("id"), r.getSeq[Int](1), r.getInt(2))).toSet
    val appended = grown.codes
      .collect().map(r => (r.getAs[Long]("id"), r.getSeq[Int](2), r.getInt(0))).toSet
    assert(appended === full,
      "appended index must be code-identical to encoding the full corpus")

    // a wrong-dimension delta row must fail fast, not corrupt the parquet
    val badRow = Seq((99L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Pq.append(spark, dirGrown, badRow, "vec_id", "embedding")
    }
    assert(ex.getMessage.contains("must match the fitted dim"))
  }
}
