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

  test("rel-type-selective anchor: equal end labels, chain seeds from the " +
      "rare-reltype end (traverse_order relation-operand scoring)") {
    val sess = new graft.cypher.CypherSession(spark)
    // equal-sized end labels: node scoring alone cannot pick a side
    sess.run("UNWIND range(0, 19) AS i CREATE (:EndA {v: i})")
    sess.run("UNWIND range(0, 19) AS i CREATE (:EndB {v: i})")
    // COMMON dominates the edge population; RARE is a handful
    sess.run(
      """UNWIND range(0, 199) AS i
        |CREATE (:FillA {v: i})-[:COMMON]->(:FillB {v: i})""".stripMargin)
    sess.run(
      """MATCH (a:EndA), (b:EndB) WHERE a.v = b.v AND a.v < 3
        |CREATE (a)-[:COMMON]->(m:MidX {v: a.v}), (m)-[:RARE]->(b)"""
        .stripMargin)
    sess.graph.labelCounts; sess.graph.reltypeCounts
    // pattern order anchors at EndA whose first hop is COMMON (200+ edges);
    // the reversed order seeds EndB whose first hop is RARE (3 edges)
    val df = sess.run(
      "MATCH (a:EndA)-[:COMMON]->(m:MidX)-[:RARE]->(z:EndB) " +
        "RETURN id(a) AS a")
    assert(df.count() == 3)
    val plan = df.queryExecution.optimizedPlan.treeString
    val endA = plan.indexOf("EndA")
    val endB = plan.indexOf("EndB")
    assert(endA >= 0 && endB >= 0, s"labels not visible in plan:\n$plan")
    // left-deep expand tree prints the ANCHOR scan first: the reversal must
    // seed from EndB (rare first hop), leaving EndA as the last hop
    assert(endB < endA,
      s"anchor not reordered to the rare-reltype end:\n${plan.take(4000)}")
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
