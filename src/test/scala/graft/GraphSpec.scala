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

  test("pagerank: symmetric components get symmetric ranks; mass stays near n") {
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("a", "b")
    val r = Graph.pagerank(pairs, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.values.toSet.size === 1, s"isolated twin pairs must tie: $r")
    // every node's rank is a fixed point of r = .15 + .85*r on a 1-regular graph
    assert(math.abs(r(1L) - 1.0) < 1e-6)
  }
}
