package graft

import org.apache.spark.sql.functions._

import graft.graph.Graph

/** Iterative graph analytics over pair sets. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: hand-computed two iterations on a path graph") {
    // 1 — 2 — 3: deg(1)=deg(3)=1, deg(2)=2, all ranks start at 1.0
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val r = Graph.pagerank(pairs, iters = 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // iter1: r(2) = .15 + .85*(1/1 + 1/1) = 1.85; r(1) = r(3) = .15 + .85*(1/2) = .575
    // iter2: r(1) = r(3) = .15 + .85*(1.85/2) = .93625; r(2) = .15 + .85*(.575*2) = 1.1275
    assert(r(1L) === 0.93625 && r(3L) === 0.93625)
    assert(r(2L) === 1.1275)
  }

  test("triangleStats: hand-counted census on a triangle with a pendant") {
    // triangle 1-2-3 plus pendant edge 3-4: degrees 2,2,3,1 →
    // wedges 1+1+3+0 = 5, one triangle, clustering 3·1/5 = 0.6
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val r = Graph.triangleStats(pairs).collect()(0)
    assert(r.getLong(0) === 4L, "edges")
    assert(r.getLong(1) === 5L, "wedges")
    assert(r.getLong(2) === 1L, "triangles")
    assert(r.getLong(3) === 0L, "no hubs excluded")
    assert(r.getDouble(4) === 0.6, "clustering coefficient")
    // cache hygiene: a census must not leave any NEW persisted frame
    // behind — a long-lived session running many censuses would otherwise
    // accumulate one MEMORY_AND_DISK edge list per call with no handle to
    // release it. Id-diff, not a size compare: the async ContextCleaner
    // may concurrently drop UNRELATED stale entries mid-test.
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
    assert(leaked.isEmpty, s"triangleStats leaked cached RDDs: $leaked")
  }

  test("triangleStats: hub nodes above maxDegree are excluded from the census") {
    // star center 0 → 1..100 (deg 100) plus triangle 1-2-3. With the cap at
    // 64 the center is dropped and the census sees ONLY the triangle:
    // 3 edges, 3 wedges, 1 triangle, clustering 1.0, one hub reported.
    val star = (1L to 100L).map(i => (0L, i))
    val pairs = (star ++ Seq((1L, 2L), (2L, 3L), (1L, 3L))).toDF("a", "b")
    val r = Graph.triangleStats(pairs, maxDegree = 64).collect()(0)
    assert(r.getLong(0) === 3L, "edges after hub exclusion")
    assert(r.getLong(1) === 3L, "wedges on the bounded subgraph")
    assert(r.getLong(2) === 1L, "triangles")
    assert(r.getLong(3) === 1L, "the star center is the one excluded hub")
    assert(r.getDouble(4) === 1.0, "clustering of a bare triangle")
    // and with a cap the star clears, nothing is excluded: star wedges
    // = C(100,2) = 4950 plus the triangle's nodes (1,2,3 now deg 3 → 3 each)
    val r2 = Graph.triangleStats(pairs, maxDegree = 1000).collect()(0)
    assert(r2.getLong(0) === 103L)
    assert(r2.getLong(3) === 0L)
    assert(r2.getLong(1) === 4950L + 9L, "wedges with the hub kept")
  }

  test("pagerank: symmetric components get symmetric ranks; mass stays near n") {
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("a", "b")
    val r = Graph.pagerank(pairs, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.values.toSet.size === 1, s"isolated twin pairs must tie: $r")
    // every node's rank is a fixed point of r = .15 + .85*r on a 1-regular graph
    assert(math.abs(r(1L) - 1.0) < 1e-6)
  }
}
