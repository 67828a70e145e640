package graft

import graft.graph.{GraphOps, PropertyGraph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val g: PropertyGraph = PropertyGraph.eventChain(spark, sfDir)

  test("event chain: every node has out-degree <= 1") {
    val maxDeg = g.outDegrees.agg(max("out_degree")).head().getLong(0)
    assert(maxDeg == 1L)
  }

  test("expand = one-hop join, expand twice = two-hop") {
    val sources = g.nodes.select(col("id").as("start"), col("id").as("node"))
    val oneHop = GraphOps.expand(sources, g.edges)
    val twoHop = GraphOps.expand(oneHop, g.edges)
    val edgeCount = g.edges.count()
    assert(oneHop.count() == edgeCount)
    assert(twoHop.count() > 0 && twoHop.count() < edgeCount)
  }

  test("varLenExpand hop counts are minimal and bounded") {
    val sources = g.nodesByLabel("signup").select("id")
    val reach = GraphOps.varLenExpand(sources, g.edges, 1, 3)
    val hops = reach.select("hops").distinct().collect().map(_.getInt(0)).toSet
    assert(hops.subsetOf(Set(1, 2, 3)))
    // chains are acyclic: (start,node) unique
    assert(reach.groupBy("start", "node").count()
      .filter(col("count") > 1).isEmpty)
  }

  test("varLenExpand minHops=0 includes the start itself") {
    val sources = g.nodesByLabel("signup").select("id").limit(5)
    val reach = GraphOps.varLenExpand(sources, g.edges, 0, 1)
    assert(reach.filter(col("hops") === 0).count() == 5)
  }

  test("connectedComponents labels by user chain") {
    val cc = GraphOps.connectedComponents(g)
    val nUsers = g.nodes.select("user_id").distinct().count()
    assert(cc.select("component").distinct().count() == nUsers)
  }

  test("pageRank returns one rank per node, all positive") {
    val pr = GraphOps.pageRank(g, 0.15, 5)
    assert(pr.count() == g.nodes.count())
    assert(pr.filter(col("pagerank") <= 0).isEmpty)
  }

  test("pageRankDf (Catalyst power iteration) matches GraphX within 1e-6") {
    // tolerance, not equality of rounded values: the two engines sum
    // contributions in different orders, so a rank within float noise of
    // a x.xxxxxx5 boundary would round differently and flake
    val a = GraphOps.pageRank(g, 0.15, 5)
      .select(col("id"), col("pagerank").as("ra"))
    val b = GraphOps.pageRankDf(g, 0.15, 5)
      .select(col("id"), col("pagerank").as("rb"))
    assert(a.join(b, Seq("id"))
      .filter(abs(col("ra") - col("rb")) > 1e-6).isEmpty,
      "rank divergence beyond 1e-6")
    assert(b.count() == g.nodes.count())
  }
}
