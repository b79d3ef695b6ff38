package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  test("g2 edge list is k-NN-bounded and triangle supports are consistent") {
    val out = Graph.g2Triangles(spark, sfDir).cache()
    // total support = 3 × triangle count, so it must divide by 3
    val total = out.agg(sum("n_triangles")).collect()(0).getLong(0)
    assert(total % 3 == 0, s"support sum $total not divisible by 3")
    // the sparsification bound: a node's edges ≤ its own top-3 plus
    // one per other node that chose it — degree can exceed 3, but the
    // EDGE COUNT is ≤ 3n by construction; triangles per node are
    // bounded by C(deg,2), loosely checked via the global edge bound
    val suppliers = graft.core.Tables.load(spark, sfDir, "lineitem")
      .select("l_suppkey").distinct().count()
    assert(out.count() <= suppliers)
    out.unpersist()
  }

  test("g3 BFS hops: seeds at 0, bipartite sides alternate, neighbors of seeds at 1") {
    val out = Graph.g3BfsHops(spark, sfDir).cache()
    val seeds = graft.core.Tables.load(spark, sfDir, "customer")
      .filter(col("c_nationkey") === 0).select(col("c_custkey").as("node"))
    // every seed that appears has hops = 0
    assert(out.join(seeds, "node").filter(col("hops") =!= 0).isEmpty)
    // bipartite: odd hops are suppliers (offset ids), even are customers
    val bad = out.filter(
      (col("hops") % 2 === 1 && col("node") < 1000000000L) ||
      (col("hops") % 2 === 0 && col("node") >= 1000000000L))
    assert(bad.isEmpty)
    // frontier expands: distances 0,1,2 all occupied on this data (the
    // tiny-SF graph is so connected nothing is 3 away — every supplier
    // is already at hop 1)
    val dists = out.select("hops").distinct().collect().map(_.getInt(0)).toSet
    assert(Set(0, 1, 2).subsetOf(dists) && dists.subsetOf(Set(0, 1, 2, 3)))
    out.unpersist()
  }
}
