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
