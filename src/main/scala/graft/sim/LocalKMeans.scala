package graft.sim

/** Driver-local deterministic Lloyd iterations for quantizer fits.
  *
  * Why local: an IVF/PQ quantizer is always fit on a BOUNDED sample
  * (`maxFitRows`, ≤100k rows × ≤64 dims ≈ 51 MB) — at 100 TB you sample
  * regardless, so a distributed iterative fit buys nothing and costs
  * m × maxIter scheduled Spark jobs of scheduling latency (the measured
  * r11 v8 fit tax: ~2.2 s of ~9 s for 2000 rows). Collect the sample
  * once, run Lloyd in-process, broadcast the centroids through the plan
  * as literals — the FAISS train-on-sample shape. Only the single-pass
  * assignment/encode ever runs over the full corpus.
  *
  * Determinism: seeded sample-without-replacement init, assignment ties
  * to the lowest center index, means accumulated in sample order, empty
  * clusters keep their previous center — byte-stable across runs and
  * JVMs, which is what lets build→save→load→serve demos hash-compare
  * against oracles that replay from the persisted centroid tables.
  */
object LocalKMeans {

  /** Fit exactly `k` centers (duplicates possible on degenerate data —
    * harmless, downstream argmins tie to the lowest index).
    */
  def fit(points: IndexedSeq[Array[Double]], k: Int, seed: Long,
      maxIter: Int): IndexedSeq[IndexedSeq[Double]] = {
    require(points.nonEmpty, "empty quantizer fit sample")
    require(k >= 1, s"k must be positive: $k")
    val dim = points.head.length
    val n = points.length
    val rnd = new scala.util.Random(seed)
    val initIdx = rnd.shuffle(points.indices.toVector).take(k)
    var centers: Array[Array[Double]] = initIdx.map(i => points(i).clone()).toArray
    if (centers.length < k)
      centers = centers ++ Array.fill(k - centers.length)(centers.last.clone())
    val assign = new Array[Int](n)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      var i = 0
      while (i < n) {
        val p = points(i)
        var best = 0
        var bestD = Double.PositiveInfinity
        var c = 0
        while (c < k) {
          val ctr = centers(c)
          var d = 0.0
          var j = 0
          while (j < dim) { val t = p(j) - ctr(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      i = 0
      while (i < n) {
        val s = sums(assign(i))
        val p = points(i)
        var j = 0
        while (j < dim) { s(j) += p(j); j += 1 }
        counts(assign(i)) += 1
        i += 1
      }
      moved = false
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          val nc = new Array[Double](dim)
          var j = 0
          while (j < dim) { nc(j) = sums(c)(j) / counts(c); j += 1 }
          if (!java.util.Arrays.equals(nc, centers(c))) {
            moved = true
            centers(c) = nc
          }
        }
        c += 1
      }
      iter += 1
    }
    centers.map(_.toIndexedSeq).toIndexedSeq
  }
}
