package graft

import graft.cypher.CypherSession
import org.scalatest.funsuite.AnyFunSuite

/** Scratch repro harness for in-flight TCK triage (round 4). */
class ScratchSpec extends AnyFunSuite {
  import SparkTestSession._

  private def fresh = new CypherSession(spark)

  private def vals(s: CypherSession, q: String): Seq[Map[String, Any]] =
    s.rows(s.run(q))

  test("float equality 1.0 = 1.0") {
    val s = fresh
    assert(vals(s, "RETURN 1.0 = 1.0 AS result").head("result") == true)
    assert(vals(s, "RETURN {k: 1.0} = {k: 1.0} AS result").head("result") == true)
    assert(vals(s, "RETURN '1' = 1 AS result").head("result") == false)
  }

  test("list ordering with nulls") {
    val s = fresh
    assert(vals(s, "RETURN [1, 2] >= [1, null] AS result").head("result") == null)
    assert(vals(s, "RETURN [1, 'a'] >= [1, null] AS result").head("result") == null)
    assert(vals(s, "RETURN [1, 2] >= [3, null] AS result").head("result") == false)
    assert(vals(s, "RETURN [1, null] >= [1] AS result").head("result") == true)
    assert(vals(s, "RETURN [1, 0] >= [1] AS result").head("result") == true)
  }

  test("head(collect(map)) chain") {
    val s = fresh
    s.run("CREATE (a:Person), (b:Person), (m:Message {id: 10}) " +
      "CREATE (a)-[:LIKE {creationDate: 20160614}]->(m)-[:POSTED_BY]->(b)")
    val r = vals(s,
      """MATCH (person:Person)<--(message)<-[like]-(:Person)
        |WITH like.creationDate AS likeTime, person AS person
        |  ORDER BY likeTime, message.id
        |WITH head(collect({likeTime: likeTime})) AS latestLike, person AS person
        |RETURN latestLike.likeTime AS likeTime
        |  ORDER BY likeTime""".stripMargin)
    assert(r.map(_("likeTime")) == Seq(20160614L))
  }

  test("count DISTINCT nested maps in lists") {
    val s = fresh
    s.run("CREATE ({list: ['A', 'B']}), ({list: ['A', 'B']})")
    val r = vals(s, "MATCH (n) RETURN count(DISTINCT {name: [{name2: n.list}, " +
      "{baz: {apa: n.list}}]}) AS count")
    assert(r.head("count") == 1L)
  }

  test("MERGE binds a path (node + rel)") {
    val s = fresh
    val r = vals(s, "MERGE p = (a {num: 1}) RETURN p")
    assert(r.size == 1)
    val s2 = fresh
    s2.run("MERGE (a {num: 1})")
    s2.run("MERGE (b {num: 2})")
    val r2 = vals(s2, "MERGE (a {num: 1}) MERGE (b {num: 2}) " +
      "MERGE p = (a)-[:R]->(b) RETURN p")
    assert(r2.size == 1)
  }

  test("MERGE undirected startNode/endNode prop access") {
    val s = fresh
    val r = vals(s, "CREATE (a {id: 2}), (b {id: 1}) " +
      "MERGE (a)-[r:KNOWS]-(b) RETURN startNode(r).id AS st, endNode(r).id AS e")
    assert(r.map(m => (m("st"), m("e"))).toSet == Set((2L, 1L)))
  }

  test("MERGE ON MATCH undefined variable errors") {
    val s = fresh
    intercept[Exception](s.run("MERGE (n) ON MATCH SET x.num = 1"))
  }

  test("MERGE bound variable with new label errors") {
    val s = fresh
    intercept[Exception](s.run("CREATE (a:Foo) MERGE (a)-[r:KNOWS]->(a:Bar)"))
  }

  test("NOT on list literal errors") {
    val s = fresh
    intercept[Exception](s.run("RETURN NOT []"))
    intercept[Exception](s.run("RETURN NOT [true]"))
  }

  test("rel variable reused as node in varlen pattern errors") {
    val s = fresh
    intercept[Exception](
      s.run("MATCH ()-[*]-()-[r]-(), (), (r)-[*]-() RETURN r"))
  }

  test("cyclic comma pattern with bound re-match") {
    val s = fresh
    s.run("CREATE (a:A), (b:B {id: 1}), (c:C {id: 2}), (d:D) " +
      "CREATE (a)-[:T]->(b), (a)-[:T]->(c), (a)-[:T]->(d), " +
      "(b)-[:T]->(c), (b)-[:T]->(d), (c)-[:T]->(d)")
    val r = vals(s,
      """MATCH (a)--(b)--(c)--(d)--(a), (b)--(d)
        |WHERE a.id = 1 AND c.id = 2
        |RETURN d""".stripMargin)
    assert(r.size == 2)
  }

  test("OR pattern predicate with labels on bound vars") {
    val s = fresh
    s.run("CREATE (a:TheLabel {id: 0}), (b:TheLabel {id: 1}), " +
      "(c:TheLabel {id: 2}) CREATE (a)-[:T]->(b), (b)-[:T]->(c)")
    val r = vals(s,
      """MATCH (a), (b)
        |WHERE a.id = 0
        |  AND (a)-[:T]->(b:TheLabel)
        |  OR (a)-[:T*]->(b:MissingLabel)
        |RETURN DISTINCT b""".stripMargin)
    assert(r.size == 1)
  }

  test("large literal list folds to a single literal") {
    val s = fresh
    val big = (1 to 2000).mkString("[", ", ", "]")
    val t0 = System.nanoTime()
    val r = vals(s, s"RETURN size($big) AS n")
    val ms = (System.nanoTime() - t0) / 1e6
    assert(r.head("n") == 2000L)
    assert(ms < 30000, s"took $ms ms")
  }

  test("comprehension over collected paths") {
    val s = fresh
    s.run("CREATE (a:A) CREATE (a)-[:T]->(:B), (a)-[:T]->(:C)")
    val r = vals(s, "MATCH p = (n)-->() " +
      "RETURN [x IN collect(p) | head(nodes(x))] AS p")
    assert(r.size == 1)
    val lst = r.head("p").asInstanceOf[List[_]]
    assert(lst.size == 2)
    val r2 = vals(s, "MATCH p = (n:A)-->() " +
      "WITH [x IN collect(p) | head(nodes(x))] AS p, count(n) AS c " +
      "RETURN p, c")
    assert(r2.head("c") == 2L)
  }

  test("nodes()/relationships() on null path") {
    val s = fresh
    val r = vals(s, "WITH null AS a OPTIONAL MATCH p = (a)-[r]->() " +
      "RETURN nodes(p) AS n, nodes(null) AS nn")
    assert(r.head("n") == null && r.head("nn") == null)
    val r2 = vals(s, "WITH null AS a OPTIONAL MATCH p = (a)-[r]->() " +
      "RETURN relationships(p) AS x, relationships(null) AS y")
    assert(r2.head("x") == null && r2.head("y") == null)
  }

  test("list index via WITH-aliased float errors at compile") {
    val s = fresh
    intercept[Exception](s.run(
      "WITH [1, 2, 3, 4, 5] AS list, 3.14 AS idx RETURN list[idx]"))
  }

  test("large all-literal CREATE folds prop maps") {
    val s = fresh
    val stmt = (1 to 120).map(i =>
      s"(p$i:Person {name: 'n$i', born: ${1900 + i}})").mkString(
      "CREATE ", ", ", "")
    val t0 = System.nanoTime()
    s.run(stmt)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(s.rows(s.run("MATCH (n:Person) RETURN count(n) AS c"))
      .head("c") == 120L)
    assert(ms < 60000, s"took $ms ms")
  }

  test("range() empty and null bounds") {
    val s = fresh
    assert(vals(s, "RETURN range(0, -1) AS r").head("r") == List())
    assert(vals(s, "RETURN range(2, 18, 3) AS r").head("r") ==
      List(2L, 5L, 8L, 11L, 14L, 17L))
  }
}
