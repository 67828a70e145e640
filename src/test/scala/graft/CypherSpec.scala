package graft

import graft.cypher.CypherSession
import org.scalatest.funsuite.AnyFunSuite

/** TCK-style end-to-end Cypher tests: scenario-local graphs built through
  * the engine's own CREATE path (mirrors the reference's
  * tests/tck/features/ approach).
  */
class CypherSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshSession(create: String*): CypherSession = {
    val s = new CypherSession(spark)
    create.foreach(s.run(_))
    s
  }

  private def rows(s: CypherSession, q: String,
      params: Map[String, Any] = Map.empty): Seq[Map[String, Any]] =
    s.rows(s.run(q, params))

  test("CREATE then MATCH with label and prop filter") {
    val s = freshSession(
      "CREATE (:Person {name: 'Ann', age: 30})",
      "CREATE (:Person {name: 'Bob', age: 25})",
      "CREATE (:Robot {name: 'R2'})")
    val r = rows(s, "MATCH (p:Person) WHERE p.age > 26 RETURN p.name AS name")
    assert(r == Seq(Map("name" -> "Ann")))
    val all = rows(s, "MATCH (n) RETURN count(*) AS c")
    assert(all == Seq(Map("c" -> 3L)))
  }

  test("edge traversal with direction and type") {
    val s = freshSession(
      "CREATE (a:P {name:'a'})-[:KNOWS]->(b:P {name:'b'})-[:KNOWS]->(c:P {name:'c'})",
      "CREATE (x:P {name:'x'})-[:HATES]->(y:P {name:'y'})")
    assert(rows(s,
      "MATCH (p)-[:KNOWS]->(q) RETURN p.name AS a, q.name AS b ORDER BY a")
      == Seq(Map("a" -> "a", "b" -> "b"), Map("a" -> "b", "b" -> "c")))
    // reversed arrow
    assert(rows(s,
      "MATCH (p)<-[:KNOWS]-(q) RETURN p.name AS a ORDER BY a")
      == Seq(Map("a" -> "b"), Map("a" -> "c")))
    // undirected
    assert(rows(s,
      "MATCH (p {name:'b'})--(q) RETURN q.name AS n ORDER BY n")
      == Seq(Map("n" -> "a"), Map("n" -> "c")))
  }

  test("two-hop pattern and relationship uniqueness") {
    val s = freshSession(
      "CREATE (a:N {v:1})-[:R]->(b:N {v:2})-[:R]->(c:N {v:3})")
    // (a)-[r1]->(b)-[r2]->(c) with r1 <> r2
    assert(rows(s,
      "MATCH (x)-[]->(y)-[]->(z) RETURN x.v AS x, z.v AS z")
      == Seq(Map("x" -> 1L, "z" -> 3L)))
    // a-b-a backtracking is forbidden by edge uniqueness (undirected)
    assert(rows(s,
      "MATCH (x {v:1})-[]-(y)-[]-(z) RETURN z.v AS z")
      == Seq(Map("z" -> 3L)))
  }

  test("OPTIONAL MATCH yields nulls for non-matches") {
    val s = freshSession(
      "CREATE (a:P {name:'ann'})-[:HAS]->(:Dog {name:'rex'})",
      "CREATE (:P {name:'bob'})")
    val r = rows(s,
      """MATCH (p:P) OPTIONAL MATCH (p)-[:HAS]->(d:Dog)
        |RETURN p.name AS p, d.name AS d ORDER BY p""".stripMargin)
    assert(r == Seq(
      Map("p" -> "ann", "d" -> "rex"),
      Map("p" -> "bob", "d" -> null)))
  }

  test("aggregation: count/sum/avg/collect/min/max with nulls skipped") {
    val s = freshSession(
      "CREATE (:X {g:'a', v:1})", "CREATE (:X {g:'a', v:3})",
      "CREATE (:X {g:'b', v:10})", "CREATE (:X {g:'b'})")
    val r = rows(s,
      """MATCH (x:X) RETURN x.g AS g, count(*) AS n, count(x.v) AS nv,
        |sum(x.v) AS s, min(x.v) AS mn, max(x.v) AS mx,
        |collect(x.v) AS vs ORDER BY g""".stripMargin)
    assert(r(0) == Map("g" -> "a", "n" -> 2L, "nv" -> 2L, "s" -> 4.0,
      "mn" -> 1L, "mx" -> 3L, "vs" -> List(1L, 3L)))
    assert(r(1)("n") == 2L)
    assert(r(1)("nv") == 1L)
    assert(r(1)("s") == 10.0)
  }

  test("ORDER BY global sort order: string < bool < number, null last") {
    val s = freshSession(
      "CREATE (:V {v: 5})", "CREATE (:V {v: 'str'})",
      "CREATE (:V {v: true})", "CREATE (:V)")
    val r = rows(s, "MATCH (n:V) RETURN n.v AS v ORDER BY v")
    assert(r.map(_("v")) == Seq("str", true, 5L, null))
    val d = rows(s, "MATCH (n:V) RETURN n.v AS v ORDER BY v DESC")
    assert(d.map(_("v")) == Seq(null, 5L, true, "str"))
  }

  test("UNWIND and range()") {
    val s = freshSession()
    assert(rows(s, "UNWIND [1, 2, 3] AS x RETURN x")
      .map(_("x")) == Seq(1L, 2L, 3L))
    assert(rows(s, "UNWIND range(1, 5, 2) AS x RETURN sum(x) AS s")
      == Seq(Map("s" -> 9.0)))
  }

  test("WITH chaining, DISTINCT, SKIP and LIMIT") {
    val s = freshSession(
      "CREATE (:Y {v:1})", "CREATE (:Y {v:1})", "CREATE (:Y {v:2})",
      "CREATE (:Y {v:3})")
    val r = rows(s,
      """MATCH (y:Y) WITH DISTINCT y.v AS v
        |RETURN v ORDER BY v SKIP 1 LIMIT 1""".stripMargin)
    assert(r == Seq(Map("v" -> 2L)))
    val agg = rows(s,
      """MATCH (y:Y) WITH y.v AS v, count(*) AS c WHERE c > 1
        |RETURN v, c""".stripMargin)
    assert(agg == Seq(Map("v" -> 1L, "c" -> 2L)))
  }

  test("variable-length paths") {
    val s = freshSession(
      "CREATE (a:C {v:1})-[:R]->(b:C {v:2})-[:R]->(c:C {v:3})-[:R]->(d:C {v:4})")
    assert(rows(s,
      "MATCH (x {v:1})-[*1..2]->(y) RETURN y.v AS v ORDER BY v")
      .map(_("v")) == Seq(2L, 3L))
    assert(rows(s,
      "MATCH (x {v:1})-[*]->(y) RETURN count(y) AS c")
      == Seq(Map("c" -> 3L)))
    assert(rows(s,
      "MATCH (x {v:1})-[*2]->(y) RETURN y.v AS v") == Seq(Map("v" -> 3L)))
  }

  test("UNION and UNION ALL") {
    val s = freshSession("CREATE (:U {v:1})", "CREATE (:U {v:1})")
    assert(rows(s,
      """MATCH (u:U) RETURN u.v AS v UNION MATCH (u:U) RETURN u.v AS v""")
      == Seq(Map("v" -> 1L)))
    assert(rows(s,
      """MATCH (u:U) RETURN u.v AS v UNION ALL MATCH (u:U) RETURN u.v AS v""")
      .size == 4)
  }

  test("pattern predicates: WHERE (n)-->() and NOT") {
    val s = freshSession(
      "CREATE (a:W {n:'hub'})-[:L]->(:W {n:'leaf'})")
    assert(rows(s,
      "MATCH (w:W) WHERE (w)-[:L]->() RETURN w.n AS n")
      == Seq(Map("n" -> "hub")))
    assert(rows(s,
      "MATCH (w:W) WHERE NOT (w)-[:L]->() RETURN w.n AS n")
      == Seq(Map("n" -> "leaf")))
  }

  test("string predicates and functions") {
    val s = freshSession("CREATE (:S {t:'Hello World'})")
    val r = rows(s,
      """MATCH (s:S) WHERE s.t STARTS WITH 'Hello'
        |RETURN toUpper(s.t) AS up, toLower(s.t) AS lo,
        |substring(s.t, 0, 5) AS sub, size(s.t) AS n,
        |reverse(s.t) AS rev, replace(s.t, 'World', 'There') AS rep
        |""".stripMargin)
    assert(r == Seq(Map("up" -> "HELLO WORLD", "lo" -> "hello world",
      "sub" -> "Hello", "n" -> 11L, "rev" -> "dlroW olleH",
      "rep" -> "Hello There")))
  }

  test("CASE, coalesce, IS NULL") {
    val s = freshSession("CREATE (:Z {v:1})", "CREATE (:Z {v:2})", "CREATE (:Z)")
    val r = rows(s,
      """MATCH (z:Z)
        |RETURN coalesce(z.v, -1) AS v,
        |  CASE WHEN z.v = 1 THEN 'one' WHEN z.v IS NULL THEN 'none'
        |       ELSE 'many' END AS c
        |ORDER BY v""".stripMargin)
    assert(r == Seq(
      Map("v" -> -1L, "c" -> "none"),
      Map("v" -> 1L, "c" -> "one"),
      Map("v" -> 2L, "c" -> "many")))
  }

  test("arithmetic: integer division, float promotion, modulo, power") {
    val s = freshSession()
    val r = rows(s,
      """RETURN 7 / 2 AS idiv, 7.0 / 2 AS fdiv, 7 % 3 AS m,
        |2 ^ 10 AS p, 1 + 2 * 3 AS prec, -(3 - 5) AS neg""".stripMargin)
    assert(r == Seq(Map("idiv" -> 3L, "fdiv" -> 3.5, "m" -> 1L,
      "p" -> 1024.0, "prec" -> 7L, "neg" -> 2L)))
  }

  test("IN list with null semantics, list ops") {
    val s = freshSession()
    val r = rows(s,
      """RETURN 2 IN [1, 2, 3] AS yes, 5 IN [1, 2, 3] AS no,
        |5 IN [1, null] AS unk,
        |[1,2,3][0] AS first, [1,2,3][-1] AS last_e,
        |[1,2,3,4][1..3] AS mid, size([1,2,3]) AS n,
        |head([1,2]) AS h, tail([1,2,3]) AS t""".stripMargin)
    assert(r == Seq(Map(
      "yes" -> true, "no" -> false, "unk" -> null,
      "first" -> 1L, "last_e" -> 3L, "mid" -> List(2L, 3L), "n" -> 3L,
      "h" -> 1L, "t" -> List(2L, 3L))))
  }

  test("list comprehension and quantifiers") {
    val s = freshSession()
    val r = rows(s,
      """RETURN [x IN [1,2,3,4] WHERE x % 2 = 0 | x * 10] AS ev,
        |any(x IN [1,2] WHERE x > 1) AS a,
        |all(x IN [1,2] WHERE x > 0) AS al,
        |none(x IN [1,2] WHERE x > 5) AS no,
        |single(x IN [1,2] WHERE x = 2) AS si""".stripMargin)
    assert(r == Seq(Map("ev" -> List(20L, 40L), "a" -> true, "al" -> true,
      "no" -> true, "si" -> true)))
  }

  test("null comparison semantics: null = null is null, ternary logic") {
    val s = freshSession()
    val r = rows(s,
      """RETURN null = null AS a, null <> 1 AS b,
        |1 = 'x' AS c, 1 < 'x' AS d,
        |(1 > null) OR true AS e, null AND false AS f""".stripMargin)
    assert(r == Seq(Map("a" -> null, "b" -> null, "c" -> false, "d" -> null,
      "e" -> true, "f" -> false)))
  }

  test("parameters") {
    val s = freshSession("CREATE (:P {name:'ann'})")
    val r = rows(s, "MATCH (p:P) WHERE p.name = $who RETURN count(*) AS c",
      Map("who" -> "ann"))
    assert(r == Seq(Map("c" -> 1L)))
  }

  test("CYPHER k=v wire-prefix parameters") {
    val s = freshSession("CREATE (:P {name:'ann', age: 30})")
    val r = rows(s,
      """CYPHER who = 'ann' min_age = 21;
        |MATCH (p:P) WHERE p.name = $who AND p.age > $min_age
        |RETURN count(*) AS c""".stripMargin)
    assert(r == Seq(Map("c" -> 1L)))
    // no semicolon, multiple types, explicit map wins on conflict
    val r2 = rows(s,
      "CYPHER who = 'bob' flag = true MATCH (p:P) WHERE p.name = $who " +
        "RETURN count(*) AS c", Map("who" -> "ann"))
    assert(r2 == Seq(Map("c" -> 1L)))
  }

  test("id() and labels() and type()") {
    val s = freshSession("CREATE (:A {x:1})-[:T]->(:B {x:2})")
    val r = rows(s,
      """MATCH (a)-[r]->(b) RETURN labels(a) AS la, type(r) AS t,
        |id(a) >= 0 AS ok""".stripMargin)
    assert(r == Seq(Map("la" -> List("A"), "t" -> "T", "ok" -> true)))
  }

  test("cartesian product of disconnected patterns") {
    val s = freshSession(
      "CREATE (:L {v:1})", "CREATE (:L {v:2})", "CREATE (:M {w:10})")
    val r = rows(s,
      "MATCH (l:L), (m:M) RETURN l.v AS v, m.w AS w ORDER BY v")
    assert(r == Seq(Map("v" -> 1L, "w" -> 10L), Map("v" -> 2L, "w" -> 10L)))
  }

  test("indegree and outdegree") {
    val s = freshSession(
      "CREATE (a:D {n:'a'})-[:R]->(b:D {n:'b'})-[:R]->(c:D {n:'c'})",
      "MATCH (a:D {n:'a'}), (c:D {n:'c'}) CREATE (a)-[:R]->(c)")
    val r = rows(s,
      """MATCH (d:D) RETURN d.n AS n, indegree(d) AS i, outdegree(d) AS o
        |ORDER BY n""".stripMargin)
    assert(r == Seq(
      Map("n" -> "a", "i" -> 0L, "o" -> 2L),
      Map("n" -> "b", "i" -> 1L, "o" -> 1L),
      Map("n" -> "c", "i" -> 2L, "o" -> 0L)))
    // degree in WHERE
    assert(rows(s,
      "MATCH (d:D) WHERE outdegree(d) = 0 RETURN d.n AS n")
      == Seq(Map("n" -> "c")))
  }

  test("shortestPath keeps one minimal path per endpoint pair") {
    // diamond + long way round: a->b->d (2 hops), a->c->d (2 hops), a->d (1)
    val s = freshSession(
      "CREATE (a:S {n:'a'})-[:R]->(b:S {n:'b'})-[:R]->(d:S {n:'d'})",
      "MATCH (a:S {n:'a'}), (d:S {n:'d'}) CREATE (a)-[:R]->(:S {n:'c'})-[:R]->(d)",
      "MATCH (a:S {n:'a'}), (d:S {n:'d'}) CREATE (a)-[:R]->(d)")
    val r = rows(s,
      """MATCH p = shortestPath((a:S {n:'a'})-[:R*1..4]->(d:S {n:'d'}))
        |RETURN length(p) AS len""".stripMargin)
    assert(r == Seq(Map("len" -> 1L)))
    // without shortestPath: all three routes enumerate
    val all = rows(s,
      """MATCH p = (a:S {n:'a'})-[:R*1..4]->(d:S {n:'d'})
        |RETURN count(*) AS c""".stripMargin)
    assert(all == Seq(Map("c" -> 3L)))
  }

  test("shortestPath ranks per input row, not globally per endpoint pair") {
    // same diamond graph; UNWIND multiplies the input stream ×3 — every
    // input row must keep its own shortest path (3 result rows), not one
    // global winner per (a, d) pair
    val s = freshSession(
      "CREATE (a:S {n:'a'})-[:R]->(b:S {n:'b'})-[:R]->(d:S {n:'d'})",
      "MATCH (a:S {n:'a'}), (d:S {n:'d'}) CREATE (a)-[:R]->(:S {n:'c'})-[:R]->(d)",
      "MATCH (a:S {n:'a'}), (d:S {n:'d'}) CREATE (a)-[:R]->(d)")
    val r = rows(s,
      """UNWIND [1, 2, 3] AS x
        |MATCH p = shortestPath((a:S {n:'a'})-[:R*1..4]->(d:S {n:'d'}))
        |RETURN x, length(p) AS len ORDER BY x""".stripMargin)
    assert(r == Seq(
      Map("x" -> 1L, "len" -> 1L),
      Map("x" -> 2L, "len" -> 1L),
      Map("x" -> 3L, "len" -> 1L)))
  }

  test("property(), latitude/longitude, randomUUID") {
    val s = freshSession("CREATE (:G {name:'x', lat: 1.5, lon: 2.5})")
    val r = rows(s,
      """MATCH (g:G) RETURN property(g, 'name') AS p,
        |property(g, 'missing') AS m,
        |latitude(point({latitude: g.lat, longitude: g.lon})) AS la,
        |longitude(point({latitude: g.lat, longitude: g.lon})) AS lo""".stripMargin)
    assert(r == Seq(Map("p" -> "x", "m" -> null, "la" -> 1.5, "lo" -> 2.5)))
    val u = rows(s, "RETURN randomUUID() AS u").head("u").asInstanceOf[String]
    assert(u.length == 36 && u.count(_ == '-') == 4)
  }

  test("postfix operators chain after numeric literals") {
    val s = freshSession()
    assert(rows(s, "RETURN 1 IS NULL AS a, 1.5 IS NOT NULL AS b, " +
      "-1 IS NULL AS c")
      == Seq(Map("a" -> false, "b" -> true, "c" -> false)))
  }
}
