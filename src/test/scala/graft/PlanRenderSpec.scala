package graft

import graft.cypher.Graft
import org.scalatest.funsuite.AnyFunSuite

/** `Graft.explainOps`: reference-shaped operator trees (op names from
  * `src/execution_plan/ops/op.h:19-54`, indentation per
  * `execution_plan_debug.c`) for representative query shapes — the wire
  * format the reference's flow plan tests assert against
  * (`tests/flow/test_optimizations_plan.py`).
  */
class PlanRenderSpec extends AnyFunSuite {
  import SparkTestSession._

  private def graft(): Graft = {
    val g = new Graft(spark)
    g.query("pr",
      """UNWIND range(0, 9) AS i
        |CREATE (:N {x: i})-[:R {w: i}]->(:M {y: i})""".stripMargin)
    g
  }

  private def ops(g: Graft, q: String): List[String] =
    g.explainOps("pr", q).linesIterator.map(_.trim).toList

  test("label scan + expand + aggregate") {
    val g = graft()
    val plan = ops(g,
      "MATCH (a:N)-[r:R]->(b:M) RETURN b.y AS y, count(*) AS c")
    assert(plan == List(
      "Results",
      "Aggregate",
      "Conditional Traverse | (a:N)-[r:R]->(b:M)",
      "Node By Label Scan | (a:N)"), plan.mkString("\n"))
    // indentation: 4 spaces per level, root first (cmd_explain shape)
    val raw = g.explainOps("pr",
      "MATCH (a:N)-[r:R]->(b:M) RETURN count(*) AS c").linesIterator.toList
    assert(raw(1).startsWith("    ") && raw(2).startsWith("        "))
  }

  test("id equality promotes the scan to NodeByIdSeek") {
    val g = graft()
    val plan = ops(g, "MATCH (n) WHERE id(n) = 3 RETURN n")
    assert(plan == List(
      "Results", "Project", "Filter", "NodeByIdSeek | (n)"),
      plan.mkString("\n"))
  }

  test("variable-length traverse, sort, skip and limit stack in order") {
    val g = graft()
    val plan = ops(g,
      """MATCH (a:N)-[:R*1..2]->(b)
        |RETURN b.y AS y ORDER BY y SKIP 1 LIMIT 2""".stripMargin)
    assert(plan == List(
      "Results", "Limit", "Skip", "Sort", "Project",
      "Conditional Variable Length Traverse | (a:N)-[:R*1..2]->(b)",
      "Node By Label Scan | (a:N)"), plan.mkString("\n"))
  }

  test("disjoint patterns meet in a Cartesian Product") {
    val g = graft()
    val plan = ops(g, "MATCH (a:N), (b:M) RETURN a.x AS x LIMIT 3")
    assert(plan == List(
      "Results", "Limit", "Project", "Cartesian Product",
      "Node By Label Scan | (a:N)", "Node By Label Scan | (b:M)"),
      plan.mkString("\n"))
  }

  test("optional match renders Apply + Optional; union renders Join") {
    val g = graft()
    val plan = ops(g,
      """MATCH (a:N) OPTIONAL MATCH (a)-[r:R]->(b:M)
        |RETURN a.x AS x""".stripMargin)
    assert(plan == List(
      "Results", "Project", "Apply",
      "Node By Label Scan | (a:N)",
      "Optional",
      "Conditional Traverse | (a)-[r:R]->(b:M)",
      "Argument | (a)"), plan.mkString("\n"))
    val union = ops(g,
      "MATCH (a:N) RETURN a.x AS v UNION MATCH (b:M) RETURN b.y AS v")
    assert(union == List(
      "Results", "Distinct", "Join",
      "Project", "Node By Label Scan | (a:N)",
      "Project", "Node By Label Scan | (b:M)"), union.mkString("\n"))
  }

  test("MERGE renders the op_merge three-stream tree") {
    val g = graft()
    // unbound merge: match stream + create stream
    val plain = ops(g, "MERGE (a:N {x: 1})")
    assert(plain == List(
      "Results",
      "Merge | (a:N)",
      "Filter", // the {x: 1} pattern prop (reference scans carry no props)
      "Node By Label Scan | (a:N)",
      "MergeCreate | (a:N)"), plain.mkString("\n"))
    // bound-variable merge: bound stream first, match stream taps the
    // bound variable as an Argument, create stream gets its Argument tap
    val boundM = ops(g, "MATCH (a:N) MERGE (a)-[r:R]->(b:M)")
    assert(boundM == List(
      "Results",
      "Merge | (a)-[r:R]->(b:M)",
      "Node By Label Scan | (a:N)",
      "Conditional Traverse | (a)-[r:R]->(b:M)",
      "Argument | (a)",
      "MergeCreate | (a)-[r:R]->(b:M)",
      "Argument"), boundM.mkString("\n"))
  }

  test("DETACH DELETE and SET render Update/Delete over the match pipeline") {
    val g = graft()
    val del = ops(g, "MATCH (a:N) DETACH DELETE a")
    assert(del == List(
      "Results",
      "Delete | detach",
      "Node By Label Scan | (a:N)"), del.mkString("\n"))
    val upd = ops(g, "MATCH (a:N {x: 1}) SET a.y = 2")
    assert(upd == List(
      "Results",
      "Update",
      "Filter", // the {x: 1} pattern prop
      "Node By Label Scan | (a:N)"), upd.mkString("\n"))
    val create = ops(g, "MATCH (a:N) CREATE (a)-[:R2]->(:M)")
    assert(create == List(
      "Results",
      "Create | (a)-[:R2]->(:M)",
      "Node By Label Scan | (a:N)"), create.mkString("\n"))
  }
}
