package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over pair sets (the near-dup graphs the dedup
  * family emits). Same scale discipline as [[graft.dedup.Dedup.canonicalize]]:
  * edge and rank frames stay distributed, each iteration is a bounded number
  * of shuffles, and lineage is truncated per round so plans don't grow.
  */
object Graph {

  /** Triangle census of an undirected pair graph given as `(a, b)` edges
    * with `a < b` — edge count, wedge count (open 2-paths, Σ d·(d−1)/2),
    * triangle count, the count of excluded hub nodes, and the global
    * clustering coefficient `3·triangles / wedges`. The standard structure
    * probe for a near-dup graph: a high coefficient means duplication comes
    * in dense clusters (template families), a low one means long chains
    * (drifting revisions) — which changes whether keep-one-per-cluster is
    * safe.
    *
    * Scale: the triangle join is edges⋈edges on a node key then a semi-join
    * back on the closing edge — cost is Σ deg(v)² path rows, the standard
    * distributed triangle enumeration (no per-node adjacency materialized
    * on any single executor). Σ deg² is unbounded under skew: ONE hub node
    * (a boilerplate template with 10⁶ members in a 100× near-dup graph)
    * yields 10¹² path rows. So, same discipline as LSH `maxBucket`: nodes
    * with degree > `maxDegree` are EXCLUDED from the census (all their
    * edges dropped, `n_hubs_excluded` reports how many nodes) — the census
    * is over the degree-bounded subgraph, and path rows are provably
    * ≤ |E'|·maxDegree. A dense cluster a hub anchors is template-family
    * duplication, which the LSH bucket caps upstream already bound —
    * census-ing its quadratic interior adds no curation signal.
    * All counts integer; the one float (the coefficient) derives from two
    * exact integers.
    */
  def triangleStats(pairs: DataFrame, maxDegree: Int = 64): DataFrame = {
    require(maxDegree >= 1, s"maxDegree must be >= 1: $maxDegree")
    val e0 = pairs.select(col("a"), col("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg0 = e0.select(col("a").as("id")).unionAll(e0.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // |hubs| ≤ 2|E|/maxDegree — small for any sane cap, but NOT broadcast-
    // hinted: at 10¹² edges it can still exceed driver memory, and a
    // shuffled anti-join on the node id is safe at every scale (AQE
    // broadcasts it when it is in fact small).
    val hubs = deg0.filter(col("d") > maxDegree).select("id")
    val e = e0
      .join(hubs.withColumnRenamed("id", "a"), Seq("a"), "left_anti")
      .join(hubs.withColumnRenamed("id", "b"), Seq("b"), "left_anti")
      .select("a", "b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // degrees RE-derived on the bounded subgraph, so wedges/triangles/
    // clustering describe one consistent graph
    val deg = e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val paths = e.select(col("a").as("pa"), col("b").as("pb")).as("p")
      .join(e.select(col("a").as("qa"), col("b").as("qb")).as("q"),
        col("pb") === col("qa"))
      .select(col("pa").as("a"), col("qb").as("b"))
    // ONE action for all four scalars (wedges + edges from the degree
    // frame — Σd counts every edge row twice, duplicates included, so
    // Σd div 2 ≡ e.count(); triangles from the closing-edge semi-join;
    // the hub count from the cached full-degree frame): crossing the
    // one-row aggregates collects in a single job, with the persists
    // filling lazily on first traversal — the r9 shape paid full job
    // overhead three times (hub count, edge-cache force, final agg) for
    // the same cache fills. The result is collected eagerly so every
    // persist can be released before returning: a long-lived session
    // running many censuses must leave NOTHING cached behind
    // (localCheckpoint would itself pin the result RDD with no
    // caller-accessible handle).
    val row = deg
      .agg(expr("sum(d * (d - 1) div 2)").as("n_wedges"),
        expr("coalesce(sum(d) div 2, 0)").as("n_edges"))
      .crossJoin(paths.join(e, Seq("a", "b"), "left_semi")
        .agg(count(lit(1)).as("n_triangles")))
      .crossJoin(hubs.agg(count(lit(1)).as("n_hubs")))
      .collect()(0)
    val nWedges: java.lang.Long = // null on an empty graph, like the SQL sum
      if (row.isNullAt(0)) null else java.lang.Long.valueOf(row.getLong(0))
    val nEdges = row.getLong(1)
    val nTris = row.getLong(2)
    val nHubs = row.getLong(3)
    e.unpersist()
    deg0.unpersist()
    e0.unpersist()
    // HALF_UP to 6dp, matching Spark's round() the former plan used
    val clustering: Double =
      if (nWedges != null && nWedges.longValue > 0L)
        BigDecimal(3.0 * nTris / nWedges.doubleValue)
          .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      else 0.0
    val spark = pairs.sparkSession
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(nEdges, nWedges, nTris, nHubs, clustering)),
      StructType(Seq(
        StructField("n_edges", LongType, nullable = false),
        StructField("n_wedges", LongType, nullable = true),
        StructField("n_triangles", LongType, nullable = false),
        StructField("n_hubs_excluded", LongType, nullable = false),
        StructField("clustering", DoubleType, nullable = false))))
  }

  /** PageRank over an UNDIRECTED pair set `(a, b)` — rank flows both ways.
    * A fixed iteration count (not convergence-tested) keeps the result a
    * pure function of the input; cross-engine determinism discipline:
    *   - per-neighbor contributions `r/deg` are summed as exact DECIMALs
    *     (order-independent — double sums change with partial-agg order),
    *   - each iteration's rank is rounded to 9dp, so both engines keep
    *     iterating from the SAME grid point and error cannot compound.
    *
    * `base` is passed explicitly rather than computed as `1 − damping`:
    * `1.0 − 0.85` in IEEE is 0.15000000000000002 while the literal `0.15`
    * parses to a different double — the oracle writes literals, so we take
    * literals.
    *
    * Scale: each iteration = one join edges⋈ranks (shuffle on the node id)
    * + one hash aggregate; state is one row per node. Isolated nodes (none
    * in a pair graph) would need a dangling-mass term — out of scope.
    */
  def pagerank(pairs: DataFrame, iters: Int = 3, damping: Double = 0.85,
      base: Double = 0.15): DataFrame = {
    require(iters >= 1, s"need >= 1 iteration: $iters")
    val edges = pairs.select(col("a").as("x"), col("b").as("y"))
      .unionByName(pairs.select(col("b").as("x"), col("a").as("y")))
      .distinct()
      .localCheckpoint(eager = true) // iterated twice per round — compute the
                                     // (possibly expensive) pair pipeline once
    val deg = edges.groupBy(col("x").as("id")).agg(count(lit(1)).as("deg"))
    var ranks = edges.select(col("x").as("id")).distinct()
      .withColumn("r", lit(1.0))
    (1 to iters).foreach { _ =>
      val contrib = edges
        .join(ranks.withColumnRenamed("id", "y"), Seq("y"))
        .join(deg.withColumnRenamed("id", "y").withColumnRenamed("deg", "ydeg"), Seq("y"))
        .select(col("x").as("id"),
          (col("r") / col("ydeg").cast("double")).cast("decimal(30,12)").as("c"))
      ranks = contrib.groupBy("id")
        .agg(round(lit(base) + lit(damping) * sum(col("c")).cast("double"), 9).as("r"))
        .localCheckpoint(eager = true) // truncate iterative lineage
    }
    ranks
  }
}
