package graft

import graft.cypher.CypherSession
import org.scalatest.funsuite.AnyFunSuite

/** allShortestPaths: every minimal path survives (the reference REJECTS
  * allShortestPaths — `arithmetic_expression_construct.c:485` — so this is
  * a strict extension; shortestPath keeps exactly one).
  */
class AllShortestSpec extends AnyFunSuite {
  import SparkTestSession._

  test("diamond graph: allShortestPaths keeps both 2-hop routes") {
    val s = new CypherSession(spark)
    // a→b1→z, a→b2→z (two minimal routes), plus a 3-hop detour a→c→d→z
    s.run("CREATE (a:S {n:'a'})-[:T]->(:M {n:'b1'})-[:T]->(z:E {n:'z'})")
    s.run("MATCH (a:S), (z:E) CREATE (a)-[:T]->(:M {n:'b2'})-[:T]->(z)")
    s.run("MATCH (a:S), (z:E) " +
      "CREATE (a)-[:T]->(:M {n:'c'})-[:T]->(:M {n:'d'})-[:T]->(z)")
    val one = s.rows(s.run(
      """MATCH p = shortestPath((a:S)-[:T*1..3]->(z:E))
        |RETURN length(p) AS l""".stripMargin))
    assert(one == Seq(Map("l" -> 2L)))
    val all = s.rows(s.run(
      """MATCH p = allShortestPaths((a:S)-[:T*1..3]->(z:E))
        |RETURN length(p) AS l""".stripMargin))
    assert(all == Seq(Map("l" -> 2L), Map("l" -> 2L)))
  }
}

/** Named paths, var-length path-multiplicity semantics, path functions,
  * point/distance, and the reduceCount statistics fast path
  * (reference: tests/flow/test_path.py, test_variable_length_traversals.py,
  * optimizations/reduce_count.c).
  */
class PathSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshSession(create: String*): CypherSession = {
    val s = new CypherSession(spark)
    create.foreach(s.run(_))
    s
  }

  private def rows(s: CypherSession, q: String): Seq[Map[String, Any]] =
    s.rows(s.run(q))

  test("var-len returns one row per path, not per reachable node") {
    // diamond: a->b->d, a->c->d — two 2-hop paths a⇝d
    val s = freshSession(
      "CREATE (a:N {name:'a'})-[:R]->(b:N {name:'b'})-[:R]->(d:N {name:'d'})",
      "MATCH (a:N {name:'a'}), (d:N {name:'d'}) CREATE (a)-[:R]->(c:N {name:'c'})-[:R]->(d)")
    val r = rows(s,
      "MATCH (a:N {name:'a'})-[*2..2]->(d:N {name:'d'}) RETURN count(*) AS c")
    assert(r == Seq(Map("c" -> 2L)))
    // *1..2 from a: b, c (1 hop) + d twice (2 hops) = 4 paths
    val r2 = rows(s, "MATCH (a:N {name:'a'})-[*1..2]->(x) RETURN count(*) AS c")
    assert(r2 == Seq(Map("c" -> 4L)))
  }

  test("var-len respects edge uniqueness (no immediate backtrack)") {
    val s = freshSession("CREATE (a:U {v:1})-[:R]->(b:U {v:2})")
    // undirected *2..2 from a: a-b then b-a would reuse the same edge
    val r = rows(s, "MATCH (a:U {v:1})-[*2..2]-(x) RETURN count(*) AS c")
    assert(r == Seq(Map("c" -> 0L)))
  }

  test("named path: nodes(), relationships(), length()") {
    val s = freshSession(
      "CREATE (:P {name:'x'})-[:R {w:1}]->(:P {name:'y'})-[:S {w:2}]->(:P {name:'z'})")
    val r = rows(s,
      """MATCH p = (:P {name:'x'})-[:R]->()-[:S]->(z)
        |RETURN length(p) AS len, z.name AS z""".stripMargin)
    assert(r == Seq(Map("len" -> 2L, "z" -> "z")))
    val r2 = s.rows(s.run(
      "MATCH p = (:P {name:'x'})-[:R]->() RETURN p"))
    val p = r2.head("p").asInstanceOf[Map[String, Any]]
    val ns = p("nodes").asInstanceOf[List[Map[String, Any]]]
    assert(ns.map(_("props").asInstanceOf[Map[String, Any]]("name"))
      == List("x", "y"))
    assert(p("rels").asInstanceOf[List[Map[String, Any]]]
      .head("reltype") == "R")
  }

  test("named path over var-len segment") {
    val s = freshSession(
      "CREATE (:C {v:1})-[:R]->(:C {v:2})-[:R]->(:C {v:3})")
    val r = rows(s,
      "MATCH p = (:C {v:1})-[*1..2]->(x) RETURN length(p) AS len ORDER BY len")
    assert(r == Seq(Map("len" -> 1L), Map("len" -> 2L)))
  }

  test("var-len edge variable binds the edge list") {
    val s = freshSession(
      "CREATE (:W {v:1})-[:R {w:10}]->(:W {v:2})-[:R {w:20}]->(:W {v:3})")
    val r = s.rows(s.run(
      "MATCH (:W {v:1})-[rs*2..2]->(:W {v:3}) RETURN rs"))
    val rs = r.head("rs").asInstanceOf[List[Map[String, Any]]]
    assert(rs.map(_("props").asInstanceOf[Map[String, Any]]("w"))
      == List(10L, 20L))
  }

  test("count fast path answers from statistics") {
    val s = freshSession(
      "CREATE (:A)", "CREATE (:A)", "CREATE (:B)",
      "MATCH (a:A), (b:B) CREATE (a)-[:R]->(b)")
    assert(rows(s, "MATCH (n) RETURN count(n) AS c") == Seq(Map("c" -> 3L)))
    assert(rows(s, "MATCH (n:A) RETURN count(n) AS c") == Seq(Map("c" -> 2L)))
    assert(rows(s, "MATCH ()-[r:R]->() RETURN count(r) AS c")
      == Seq(Map("c" -> 2L)))
    assert(rows(s, "MATCH ()-[r]->() RETURN count(*) AS c")
      == Seq(Map("c" -> 2L)))
    // statistics refresh after mutation
    s.run("CREATE (:A)")
    assert(rows(s, "MATCH (n:A) RETURN count(n) AS c") == Seq(Map("c" -> 3L)))
  }

  test("point() and distance() haversine") {
    val s = freshSession("CREATE (:G)")
    // Paris → London ≈ 344 km (EARTH_RADIUS 6378140 per reference)
    val r = rows(s,
      """MATCH (:G) RETURN distance(
        |  point({latitude: 48.8566, longitude: 2.3522}),
        |  point({latitude: 51.5074, longitude: -0.1278})) AS d""".stripMargin)
    val d = r.head("d").asInstanceOf[Double]
    assert(d > 330000 && d < 350000, s"distance was $d")
  }

  test("startNode/endNode id composition") {
    val s = freshSession("CREATE (:S {v:1})-[:R]->(:S {v:2})")
    val r = rows(s,
      """MATCH (a)-[r:R]->(b)
        |RETURN id(startNode(r)) = id(a) AS s, id(endNode(r)) = id(b) AS e""".stripMargin)
    assert(r == Seq(Map("s" -> true, "e" -> true)))
  }
}
