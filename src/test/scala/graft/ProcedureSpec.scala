package graft

import graft.cypher.CypherSession
import org.scalatest.funsuite.AnyFunSuite

/** CALL … YIELD procedures (reference registry
  * `src/procedures/procedure.c:29-42`; flow tests tests/flow/test_procs.py,
  * test_index_scan fulltext cases).
  */
class ProcedureSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshSession(create: String*): CypherSession = {
    val s = new CypherSession(spark)
    create.foreach(s.run(_))
    s
  }

  private def rows(s: CypherSession, q: String): Seq[Map[String, Any]] =
    s.rows(s.run(q))

  test("db.labels / db.relationshipTypes / db.propertyKeys") {
    val s = freshSession(
      "CREATE (:A {x:1})-[:R {w:2}]->(:B {y:'s'})")
    assert(rows(s, "CALL db.labels() YIELD label RETURN label ORDER BY label")
      == Seq(Map("label" -> "A"), Map("label" -> "B")))
    assert(rows(s, "CALL db.relationshipTypes() YIELD relationshipType RETURN relationshipType")
      == Seq(Map("relationshipType" -> "R")))
    assert(rows(s,
      "CALL db.propertyKeys() YIELD propertyKey RETURN propertyKey ORDER BY propertyKey")
      == Seq(Map("propertyKey" -> "w"), Map("propertyKey" -> "x"),
        Map("propertyKey" -> "y")))
  }

  test("YIELD aliases and downstream clauses") {
    val s = freshSession("CREATE (:A)", "CREATE (:B)", "CREATE (:C)")
    val r = rows(s,
      """CALL db.labels() YIELD label AS l
        |WITH l WHERE l <> 'B' RETURN count(*) AS c""".stripMargin)
    assert(r == Seq(Map("c" -> 2L)))
  }

  test("algo.pageRank yields positive scores for all nodes") {
    val s = freshSession(
      "CREATE (a:P)-[:L]->(b:P)-[:L]->(c:P)-[:L]->(a)")
    val r = rows(s,
      "CALL algo.pageRank() YIELD node, score RETURN id(node) AS id, score")
    assert(r.size == 3)
    assert(r.forall(_("score").asInstanceOf[Double] > 0))
  }

  test("algo.BFS levels from a source") {
    val s = freshSession(
      "CREATE (:V {name:'a'})-[:E]->(:V {name:'b'})-[:E]->(:V {name:'c'})")
    // find id of a through a query, feed as param-free literal via two steps
    val aId = rows(s, "MATCH (a:V {name:'a'}) RETURN id(a) AS i")
      .head("i").asInstanceOf[Long]
    val r = rows(s,
      s"CALL algo.BFS($aId, 10) YIELD node, level RETURN node.name AS n, level ORDER BY level")
    assert(r == Seq(Map("n" -> "b", "level" -> 1L),
      Map("n" -> "c", "level" -> 2L)))
  }

  test("fulltext index: create, query, drop") {
    val s = freshSession(
      "CREATE (:Doc {title: 'the quick brown fox'})",
      "CREATE (:Doc {title: 'lazy dogs sleep'})",
      "CREATE (:Doc {title: 'quick quick dogs'})")
    s.run("CALL db.idx.fulltext.createNodeIndex('Doc', 'title')")
    val r = rows(s,
      """CALL db.idx.fulltext.queryNodes('Doc', 'quick fox') YIELD node, score
        |RETURN node.title AS t, score ORDER BY score DESC, t""".stripMargin)
    assert(r == Seq(
      Map("t" -> "the quick brown fox", "score" -> 2.0),
      Map("t" -> "quick quick dogs", "score" -> 1.0)))
    // index follows graph mutations (lazy rebuild on version bump)
    s.run("CREATE (:Doc {title: 'fox cubs'})")
    val r2 = rows(s,
      """CALL db.idx.fulltext.queryNodes('Doc', 'fox') YIELD node
        |RETURN count(*) AS c""".stripMargin)
    assert(r2 == Seq(Map("c" -> 2L)))
    assert(rows(s, "CALL db.indexes() YIELD label RETURN label")
      == Seq(Map("label" -> "Doc")))
    // a WITH-bound LITERAL evaluates in arg position (the reference
    // evaluates bound variables there); an out-of-scope variable keeps
    // the reference's "not defined" shape, an in-scope non-constant one
    // gets the must-be-constant message instead of a misleading
    // "not defined"
    val r3 = rows(s,
      """WITH 'fox' AS q CALL db.idx.fulltext.queryNodes('Doc', q)
        |YIELD node RETURN count(*) AS c""".stripMargin)
    assert(r3 == Seq(Map("c" -> 2L)))
    def msg(q: String): String =
      intercept[Exception](rows(s, q)).getMessage
    assert(msg("CALL db.idx.fulltext.queryNodes('Doc', nope) YIELD node RETURN 1")
      .contains("not defined"))
    assert(msg("""MATCH (d:Doc) WITH d.title AS t
        |CALL db.idx.fulltext.queryNodes('Doc', t) YIELD node
        |RETURN 1""".stripMargin)
      .contains("must be constant"))
  }

  test("ad-hoc procedure: registration, arg filtering, implicit args") {
    val s = freshSession()
    s.registerProcedure(
      "test.my.proc(name :: STRING?, id :: INTEGER?) :: (city :: STRING?)",
      Seq("name", "id", "city"),
      Seq(Seq("Ann", 1L, "Malmö"), Seq("Bob", 1L, "Berlin"),
        Seq("Ann", 2L, "London")))
    // explicit args select matching rows, in registration order
    assert(rows(s, "CALL test.my.proc('Ann', 1)")
      == Seq(Map("city" -> "Malmö")))
    // standalone implicit args bind from parameters
    assert(s.rows(s.run("CALL test.my.proc",
      Map("name" -> "Ann", "id" -> 2L))) == Seq(Map("city" -> "London")))
    // numeric assignability: FLOAT? accepts an INTEGER literal
    s.registerProcedure("test.f(x :: FLOAT?) :: (out :: STRING?)",
      Seq("x", "out"), Seq(Seq(42.0, "ok")))
    assert(rows(s, "CALL test.f(42)") == Seq(Map("out" -> "ok")))
    // wrong arg type / count / in-query without YIELD all reject
    intercept[Exception](rows(s, "CALL test.f(true)"))
    intercept[Exception](rows(s, "CALL test.f(1, 2)"))
    intercept[Exception](
      rows(s, "MATCH (n) CALL test.f(42) RETURN n"))
    // in-query call fans out per input row once YIELDed
    s.run("CREATE (:P {v: 1}) CREATE (:P {v: 2})")
    assert(rows(s,
      "MATCH (p:P) CALL test.f(42) YIELD out RETURN p.v AS v, out ORDER BY v")
      == Seq(Map("v" -> 1L, "out" -> "ok"), Map("v" -> 2L, "out" -> "ok")))
    // VOID procedure passes rows through in-query
    s.registerProcedure("test.void() :: ()", Seq.empty, Seq.empty)
    assert(rows(s, "MATCH (p:P) CALL test.void() RETURN count(*) AS c")
      == Seq(Map("c" -> 2L)))
    assert(rows(s, "CALL test.void()").isEmpty)
  }
}
