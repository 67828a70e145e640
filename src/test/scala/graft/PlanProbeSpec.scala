package graft

import org.apache.spark.sql.catalyst.expressions.CreateMap
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for ExtractPushdownRule: construct-then-extract
  * chains across join boundaries must dissolve to native columns.
  */
class PlanProbeSpec extends AnyFunSuite {
  import SparkTestSession._

  test("cypher edge-property plan carries no materialized props map") {
    val df = SparkEntry.queries("q_cypher_edge_props")(spark, sfDir)
    val optimized = df.queryExecution.optimizedPlan
    val maps = optimized.collect {
      case p if p.expressions.exists(_.exists(_.isInstanceOf[CreateMap])) => p
    }
    assert(maps.isEmpty,
      s"props CreateMap survived optimization:\n${maps.mkString("\n")}")
  }

  test("selectivity-ordered anchor: 3-hop chain seeds from the selective " +
      "label (traverse_order.c analogue)") {
    val sess = new graft.cypher.CypherSession(spark)
    sess.run("UNWIND range(0, 400) AS i CREATE (:Big {v: i})")
    sess.run("CREATE (:Tiny {v: 0})-[:R]->(:Mid {v: 0})")
    sess.run(
      """MATCH (t:Tiny), (m:Mid), (b:Big)
        |WHERE b.v < 3 AND m.v = 0 AND t.v = 0
        |CREATE (b)-[:R]->(m2:Mid2 {v: b.v}), (m2)-[:R]->(t2:Tiny2)""".stripMargin)
    // stats must be computed for the heuristic to engage (a cold read
    // never pays the counting job)
    sess.graph.labelCounts
    // pattern order anchors at Big (401 nodes); the cheap end is Tiny2
    val df = sess.run(
      "MATCH (a:Big)-[:R]->(m:Mid2)-[:R]->(z:Tiny2) RETURN id(z) AS z")
    assert(df.count() == 3)
    val plan = df.queryExecution.optimizedPlan.treeString
    val big = plan.indexOf("Big")
    val tiny = plan.indexOf("Tiny2")
    assert(big >= 0 && tiny >= 0, s"labels not visible in plan:\n$plan")
    // left-deep expand tree prints the ANCHOR scan before later hops: the
    // reversed pattern must seed from Tiny2, leaving Big as the last hop
    assert(tiny < big,
      s"anchor not reordered to the selective label:\n${plan.take(4000)}")
  }

  test("cypher scan projections read only native key columns") {
    val df = SparkEntry.queries("q_cypher_two_hop")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // every FileScan's ReadSchema should be narrow (no props/variant reads)
    val schemas = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toList
    assert(schemas.nonEmpty)
    schemas.foreach { s =>
      assert(s.count(_ == ',') <= 2, s"wide scan: $s")
    }
  }
}
