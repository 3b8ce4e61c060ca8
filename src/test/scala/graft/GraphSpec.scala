package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("pagerank: every nation scored, ranks bounded, mass conserved-ish") {
    val rows = Graph.queries("graph_pagerank")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rows.length == 25)
    // floor: a node with zero in-edges holds exactly the teleport mass
    assert(rows.forall(_._3 >= Graph.Scale * 15 / 100))
    // no node can exceed total teleport + all damped mass (25 units)
    assert(rows.forall(_._3 <= 25L * Graph.Scale))
    // total mass never exceeds 25 units (integer div only LOSES mass, and
    // this graph has no dangling redistribution)
    assert(rows.map(_._3).sum <= 25L * Graph.Scale)
    // deterministic across runs (the integer-arithmetic guarantee)
    val again = Graph.queries("graph_pagerank")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rows.sameElements(again))
  }

  test("pagerank: rank concentrates where in-edges do") {
    val rows = Graph.queries("graph_pagerank")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    // in-degree per nation from the same edge derivation
    val indeg = graft.core.Tables.lineitem(spark, sf)
      .join(graft.core.Tables.orders(spark, sf),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .join(graft.core.Tables.customer(spark, sf),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .join(graft.core.Tables.supplier(spark, sf),
        org.apache.spark.sql.functions.col("l_suppkey") ===
          org.apache.spark.sql.functions.col("s_suppkey"))
      .select(org.apache.spark.sql.functions.col("c_nationkey").as("src"),
        org.apache.spark.sql.functions.col("s_nationkey").as("dst"))
      .distinct()
      .groupBy("dst").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    // aggregate correlation, not per-node absolutes: the top-indegree third
    // outranks the bottom third on average
    val sorted = indeg.toSeq.sortBy(-_._2)
    val (hi, lo) = (sorted.take(8).map(_._1), sorted.takeRight(8).map(_._1))
    val hiAvg = hi.map(rows).sum / hi.length
    val loAvg = lo.map(rows).sum / lo.length
    assert(hiAvg >= loAvg, s"hi-indegree avg rank $hiAvg < lo $loAvg")
  }

  test("triangles: triple-credit invariant and determinism") {
    val rows = Graph.queries("graph_triangles")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(rows.length == 25)
    assert(rows.forall(_._2 >= 0L))
    // each triangle is credited to exactly 3 corners
    assert(rows.map(_._2).sum % 3 == 0)
    // the sf0.001 trade graph is dense (250 directed edges over 25 nodes)
    // — triangles must exist
    assert(rows.map(_._2).sum > 0)
  }

  test("plan shape: dims broadcast in the edge derivation; no cartesian") {
    val plan = Graph.queries("graph_pagerank")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "customer/supplier should broadcast")
    assert(!plan.contains("CartesianProduct"))
    val triPlan = Graph.queries("graph_triangles")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!triPlan.contains("CartesianProduct"))
  }
  test("shortest path: source at 0, triangle inequality over edges, -1 beyond horizon") {
    val rows = graft.queries.Graph.queries("graph_shortest_path")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(rows.length == 25)
    val dist = rows.toMap
    assert(dist(graft.queries.Graph.BfsSource) == 0L)
    assert(rows.forall { case (_, h) => h == -1L || (h >= 0 && h <= graft.queries.Graph.BfsHops) })
    // the dense sf0.001 trade graph reaches everything within 3 hops
    assert(rows.count(_._2 >= 1) > 0)
    // relaxation invariant: adjacent reached nodes differ by at most 1 hop
    val edges = graft.core.Tables.lineitem(spark, sf)
      .join(graft.core.Tables.orders(spark, sf),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .join(graft.core.Tables.customer(spark, sf),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .join(graft.core.Tables.supplier(spark, sf),
        org.apache.spark.sql.functions.col("l_suppkey") ===
          org.apache.spark.sql.functions.col("s_suppkey"))
      .select(org.apache.spark.sql.functions.col("c_nationkey").as("src"),
        org.apache.spark.sql.functions.col("s_nationkey").as("dst"))
      .distinct().collect().map(r => (r.getInt(0), r.getInt(1)))
      .filter(e => e._1 != e._2)
    for ((a, b) <- edges; (x, y) = (dist(a), dist(b)))
      if (x >= 0 && y >= 0) assert(math.abs(x - y) <= 1, s"edge ($a,$b): $x vs $y")
  }
}
