package graft

import graft.cypher.CypherSession
import org.scalatest.funsuite.AnyFunSuite

/** Expression/clause semantics scenarios in the style of the openCypher TCK
  * (`/root/reference/tests/tck/features/{clauses,expressions}`) — each test
  * is a self-contained scenario graph + query + exact expected rows.
  */
class TckSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshSession(create: String*): CypherSession = {
    val s = new CypherSession(spark)
    create.foreach(s.run(_))
    s
  }

  private def rows(s: CypherSession, q: String,
      params: Map[String, Any] = Map.empty): Seq[Map[String, Any]] =
    s.rows(s.run(q, params))

  test("aggregates skip NULL values (count/sum/avg/collect)") {
    val s = freshSession(
      "CREATE (:N {v: 1})", "CREATE (:N {v: 3})", "CREATE (:N)")
    val r = rows(s,
      """MATCH (n:N) RETURN count(*) AS total, count(n.v) AS vs,
        |sum(n.v) AS s, avg(n.v) AS a, collect(n.v) AS c""".stripMargin)
    assert(r == Seq(Map("total" -> 3L, "vs" -> 2L, "s" -> 4.0, "a" -> 2.0,
      "c" -> List(1L, 3L))))
  }

  test("DISTINCT aggregation") {
    val s = freshSession(
      "CREATE (:N {v: 1})", "CREATE (:N {v: 1})", "CREATE (:N {v: 2})")
    val r = rows(s,
      "MATCH (n:N) RETURN count(DISTINCT n.v) AS d, count(n.v) AS c")
    assert(r == Seq(Map("d" -> 2L, "c" -> 3L)))
  }

  test("WITH DISTINCT then ORDER BY, SKIP, LIMIT") {
    val s = freshSession(
      "UNWIND [3, 1, 2, 3, 1] AS x CREATE (:M {v: x})")
    val r = rows(s,
      """MATCH (m:M) WITH DISTINCT m.v AS v
        |RETURN v ORDER BY v SKIP 1 LIMIT 2""".stripMargin)
    assert(r == Seq(Map("v" -> 2L), Map("v" -> 3L)))
  }

  test("ORDER BY global order: numbers before strings? strings < bool < numbers; NULL last") {
    // reference enum order (value.h:19-41): STRING < BOOLEAN < numerics,
    // NULL greatest — ascending puts strings first, null last
    val s = freshSession(
      "CREATE (:O {v: 5})", "CREATE (:O {v: 'a'})",
      "CREATE (:O {v: true})", "CREATE (:O)")
    val r = rows(s, "MATCH (o:O) RETURN o.v AS v ORDER BY v")
    assert(r.map(_("v")) == Seq("a", true, 5L, null))
  }

  test("list semantics: subscript, negative index, slice, range step") {
    val s = freshSession()
    val r = rows(s,
      """RETURN [10,20,30][0] AS a, [10,20,30][-1] AS b,
        |[10,20,30][1..3] AS c, range(0, 6, 2) AS d,
        |[10,20,30][5] AS e""".stripMargin)
    assert(r == Seq(Map("a" -> 10L, "b" -> 30L, "c" -> List(20L, 30L),
      "d" -> List(0L, 2L, 4L, 6L), "e" -> null)))
  }

  test("IN with NULLs: ternary membership") {
    val s = freshSession()
    val r = rows(s,
      """RETURN 2 IN [1, 2] AS a, 3 IN [1, 2] AS b,
        |3 IN [1, null] AS c, null IN [1] AS d""".stripMargin)
    assert(r == Seq(Map("a" -> true, "b" -> false, "c" -> null, "d" -> null)))
  }

  test("list comprehension with WHERE and projection; quantifiers") {
    val s = freshSession()
    val r = rows(s,
      """RETURN [x IN range(1,5) WHERE x % 2 = 0 | x * 10] AS evens,
        |any(x IN [1,2] WHERE x > 1) AS anyv,
        |all(x IN [1,2] WHERE x > 0) AS allv,
        |none(x IN [1,2] WHERE x > 5) AS nonev,
        |single(x IN [1,2] WHERE x = 2) AS singlev""".stripMargin)
    assert(r == Seq(Map("evens" -> List(20L, 40L), "anyv" -> true,
      "allv" -> true, "nonev" -> true, "singlev" -> true)))
  }

  test("CASE: simple (scrutinee) and searched forms") {
    val s = freshSession("CREATE (:C {v: 2})")
    val r = rows(s,
      """MATCH (c:C) RETURN
        |CASE c.v WHEN 1 THEN 'one' WHEN 2 THEN 'two' ELSE 'many' END AS w,
        |CASE WHEN c.v > 1 THEN 'big' ELSE 'small' END AS z""".stripMargin)
    assert(r == Seq(Map("w" -> "two", "z" -> "big")))
  }

  test("string functions: 0-based substring, left/right, replace, split") {
    val s = freshSession()
    val r = rows(s,
      """RETURN substring('hello', 1, 3) AS sub, left('hello', 2) AS l,
        |right('hello', 2) AS rr, replace('a.b.c', '.', '-') AS rep,
        |split('a,b,c', ',') AS sp, toString(42) AS ts,
        |'he' + 'llo' AS cat""".stripMargin)
    assert(r == Seq(Map("sub" -> "ell", "l" -> "he", "rr" -> "lo",
      "rep" -> "a-b-c", "sp" -> List("a", "b", "c"), "ts" -> "42",
      "cat" -> "hello")))
  }

  test("arithmetic: int division, mod, power, list concat via +") {
    val s = freshSession()
    val r = rows(s,
      """RETURN 7 / 2 AS idiv, 7.0 / 2 AS fdiv, 7 % 3 AS m,
        |2 ^ 10 AS p, [1] + [2, 3] AS lcat, -(3) AS neg""".stripMargin)
    assert(r == Seq(Map("idiv" -> 3L, "fdiv" -> 3.5, "m" -> 1L,
      "p" -> 1024.0, "lcat" -> List(1L, 2L, 3L), "neg" -> -3L)))
  }

  test("UNWIND: literal list, range(), and re-UNWIND of collected values") {
    val s = freshSession("UNWIND range(1, 3) AS x CREATE (:U {v: x})")
    val r = rows(s,
      """MATCH (u:U) WITH collect(u.v) AS vs
        |UNWIND vs AS v RETURN v ORDER BY v""".stripMargin)
    assert(r.map(_("v")) == Seq(1L, 2L, 3L))
  }

  test("OPTIONAL MATCH: count(var) skips non-matches, count(*) does not") {
    val s = freshSession(
      "CREATE (:P {name:'a'})-[:HAS]->(:D)", "CREATE (:P {name:'b'})")
    val r = rows(s,
      """MATCH (p:P) OPTIONAL MATCH (p)-[:HAS]->(d:D)
        |RETURN count(*) AS rows, count(d) AS ds""".stripMargin)
    assert(r == Seq(Map("rows" -> 2L, "ds" -> 1L)))
  }

  test("UNION dedups, UNION ALL keeps duplicates") {
    val s = freshSession("CREATE (:V {v: 1})", "CREATE (:V {v: 1})")
    assert(rows(s,
      "MATCH (v:V) RETURN v.v AS x UNION MATCH (v:V) RETURN v.v AS x").size == 1)
    assert(rows(s,
      """MATCH (v:V) RETURN v.v AS x UNION ALL
        |MATCH (v:V) RETURN v.v AS x""".stripMargin).size == 4)
  }

  test("toInteger / toFloat conversions incl. from string") {
    val s = freshSession()
    val r = rows(s,
      """RETURN toInteger('42') AS i, toInteger(3.9) AS t,
        |toFloat('2.5') AS f, toInteger('nope') AS n""".stripMargin)
    assert(r == Seq(Map("i" -> 42L, "t" -> 3L, "f" -> 2.5, "n" -> null)))
  }

  test("list parameters and property parameters") {
    val s = freshSession(
      "CREATE (:Q {v: 1})", "CREATE (:Q {v: 2})", "CREATE (:Q {v: 5})")
    val r = rows(s,
      "MATCH (q:Q) WHERE q.v IN $ids RETURN count(*) AS c",
      Map("ids" -> List(1, 5)))
    assert(r == Seq(Map("c" -> 2L)))
  }

  test("undirected relationship pattern matches both directions") {
    val s = freshSession("CREATE (:A {n:'a'})-[:T]->(:B {n:'b'})")
    val r = rows(s,
      "MATCH (x:A)-[:T]-(y) RETURN y.n AS n")
    assert(r == Seq(Map("n" -> "b")))
    val r2 = rows(s,
      "MATCH (x:B)-[:T]-(y) RETURN y.n AS n")
    assert(r2 == Seq(Map("n" -> "a")))
  }

  test("unbounded and single-bound var-len: *, *2, *0..1") {
    val s = freshSession(
      "CREATE (:N {v:1})-[:T]->(:N {v:2})-[:T]->(:N {v:3})")
    // * ≡ 1..∞
    val r = rows(s,
      "MATCH (a:N {v:1})-[:T*]->(b) RETURN b.v AS v ORDER BY v")
    assert(r == Seq(Map("v" -> 2L), Map("v" -> 3L)))
    // *2 ≡ exactly two hops
    val r2 = rows(s, "MATCH (a:N {v:1})-[:T*2]->(b) RETURN b.v AS v")
    assert(r2 == Seq(Map("v" -> 3L)))
    // *0..1 includes the start node itself at zero hops
    val r3 = rows(s,
      "MATCH (a:N {v:1})-[:T*0..1]->(b) RETURN b.v AS v ORDER BY v")
    assert(r3 == Seq(Map("v" -> 1L), Map("v" -> 2L)))
  }

  test("multiple relationship types [:A|B]") {
    val s = freshSession(
      "CREATE (:X {n:'x'})-[:A]->(:Y {n:'p'})",
      "MATCH (x:X) CREATE (x)-[:B]->(:Y {n:'q'})",
      "MATCH (x:X) CREATE (x)-[:C]->(:Y {n:'r'})")
    val r = rows(s,
      "MATCH (:X)-[:A|B]->(y) RETURN y.n AS n ORDER BY n")
    assert(r == Seq(Map("n" -> "p"), Map("n" -> "q")))
  }

  test("inline property map on a relationship pattern") {
    val s = freshSession(
      "CREATE (:U {n:'u'})-[:R {w: 1}]->(:V {n:'v1'})",
      "MATCH (u:U) CREATE (u)-[:R {w: 2}]->(:V {n:'v2'})")
    val r = rows(s,
      "MATCH (:U)-[:R {w: 2}]->(v) RETURN v.n AS n")
    assert(r == Seq(Map("n" -> "v2")))
  }

  test("MERGE: ON CREATE SET vs ON MATCH SET fire on the right branch") {
    val s = freshSession()
    s.run("MERGE (p:MM {k: 1}) ON CREATE SET p.made = true ON MATCH SET p.seen = true")
    s.run("MERGE (p:MM {k: 1}) ON CREATE SET p.made = false ON MATCH SET p.seen = true")
    val r = rows(s,
      "MATCH (p:MM) RETURN p.k AS k, p.made AS made, p.seen AS seen")
    assert(r == Seq(Map("k" -> 1L, "made" -> true, "seen" -> true)))
  }

  test("DETACH DELETE removes the node and its relationships") {
    val s = freshSession(
      "CREATE (:DD {n:'a'})-[:R]->(:DD {n:'b'})")
    s.run("MATCH (x:DD {n:'a'}) DETACH DELETE x")
    assert(rows(s, "MATCH (x:DD) RETURN count(*) AS c") ==
      Seq(Map("c" -> 1L)))
    assert(rows(s, "MATCH (:DD)-[r:R]->() RETURN count(r) AS c") ==
      Seq(Map("c" -> 0L)))
  }

  test("NOT pattern predicate filters to anti-matches") {
    val s = freshSession(
      "CREATE (:AP {n:'has'})-[:R]->(:AQ)", "CREATE (:AP {n:'not'})")
    val r = rows(s,
      """MATCH (p:AP) WHERE NOT (p)-[:R]->(:AQ)
        |RETURN p.n AS n""".stripMargin)
    assert(r == Seq(Map("n" -> "not")))
  }

  test("STARTS WITH / ENDS WITH / CONTAINS, and NULL propagation") {
    val s = freshSession()
    val r = rows(s,
      """RETURN 'hello' STARTS WITH 'he' AS a, 'hello' ENDS WITH 'lo' AS b,
        |'hello' CONTAINS 'ell' AS c, 'hello' STARTS WITH null AS d""".stripMargin)
    assert(r == Seq(Map("a" -> true, "b" -> true, "c" -> true, "d" -> null)))
  }

  test("WITH aggregate feeds a further MATCH in the next segment") {
    val s = freshSession(
      "CREATE (:G {g: 1})-[:E]->(:H {v: 10})",
      "MATCH (g:G {g:1}) CREATE (g)-[:E]->(:H {v: 20})",
      "CREATE (:G {g: 2})-[:E]->(:H {v: 30})")
    // segment 1: per-group count; segment 2: re-match on the aggregate
    val r = rows(s,
      """MATCH (g:G)-[:E]->(h:H)
        |WITH g.g AS grp, count(h) AS n WHERE n > 1
        |MATCH (g2:G {g: grp})-[:E]->(h2:H)
        |RETURN grp, sum(h2.v) AS tot""".stripMargin)
    assert(r == Seq(Map("grp" -> 1L, "tot" -> 30L)))
  }

  test("var-len relationship variable binds the traversed edge list") {
    val s = freshSession(
      "CREATE (:VA {v:1})-[:T]->(:VB {v:2})-[:T]->(:VC {v:3})")
    val r = rows(s,
      "MATCH (a:VA)-[rs:T*1..2]->(x) RETURN size(rs) AS n, x.v AS v ORDER BY n")
    assert(r == Seq(Map("n" -> 1L, "v" -> 2L), Map("n" -> 2L, "v" -> 3L)))
  }

  test("ORDER BY a repeated aggregate expression") {
    val s = freshSession(
      "UNWIND [1, 1, 2, 3, 3, 3] AS x CREATE (:OA {v: x})")
    val r = rows(s,
      """MATCH (n:OA) RETURN n.v AS v, count(*) AS c
        |ORDER BY count(*) DESC, v""".stripMargin)
    assert(r.map(m => (m("v"), m("c"))) ==
      Seq((3L, 3L), (1L, 2L), (2L, 1L)))
  }

  test("RETURN * / WITH * project all bound variables; LIMIT folds constants") {
    val s = freshSession("CREATE (:RS {v:1})-[:T]->(:RT {v:2})",
      "CREATE (:RS {v:3})-[:T]->(:RT {v:4})")
    val r = rows(s,
      "MATCH (a:RS)-[:T]->(b:RT) WITH * RETURN a.v + b.v AS s ORDER BY s")
    assert(r.map(_("s")) == Seq(3L, 7L))
    val r2 = rows(s,
      "MATCH (b:RT) RETURN b.v AS v ORDER BY v LIMIT 1 + 1")
    assert(r2.map(_("v")) == Seq(2L, 4L))
  }

  test("nested quantifier sees the outer comprehension variable") {
    val s = freshSession()
    val r = rows(s,
      "RETURN [x IN [1,2,3] WHERE any(y IN [2,3] WHERE y = x) | x * 10] AS z")
    assert(r == Seq(Map("z" -> List(20L, 30L))))
  }

  test("nested list literals (depth 2 and 3)") {
    val s = freshSession()
    val r = rows(s,
      """RETURN [[1,2],[3]] AS a, [[1,2],[3]][0] AS b, size([[1],[2,3]]) AS c,
        |[[[1]],[[2,3]]] AS d""".stripMargin)
    assert(r == Seq(Map(
      "a" -> List(List(1L, 2L), List(3L)),
      "b" -> List(1L, 2L),
      "c" -> 2L,
      "d" -> List(List(List(1L)), List(List(2L, 3L))))))
  }

  test("list comprehension projecting lists; nested membership and equality") {
    val s = freshSession()
    val r = rows(s,
      """RETURN [x IN [1,2] | range(1, x)] AS z,
        |[1,2] IN [[1,2],[3]] AS m, [9] IN [[1,2]] AS n,
        |[[1,2],[3]] = [[1,2],[3]] AS e""".stripMargin)
    assert(r == Seq(Map(
      "z" -> List(List(1L), List(1L, 2L)),
      "m" -> true, "n" -> false, "e" -> true)))
  }

  test("collect of collected lists nests; UNWIND unrolls one level") {
    val s = freshSession(
      "CREATE (:NL {g: 1, v: 1})", "CREATE (:NL {g: 1, v: 2})",
      "CREATE (:NL {g: 2, v: 3})")
    val r = rows(s,
      """MATCH (n:NL) WITH n.g AS g, collect(n.v) AS vs ORDER BY g
        |RETURN collect(vs) AS groups""".stripMargin)
    assert(r == Seq(Map("groups" -> List(List(1L, 2L), List(3L)))))
    val u = rows(s,
      """MATCH (n:NL) WITH n.g AS g, collect(n.v) AS vs
        |UNWIND vs AS v RETURN v ORDER BY v""".stripMargin)
    assert(u.map(_("v")) == Seq(1L, 2L, 3L))
  }

  test("literal nesting beyond the inline depth boxes and round-trips") {
    // past the fixed variant depth, pure-literal lists fold to the boxed
    // tagged-JSON branch (Values.T_BOXED) and decode back losslessly
    // (≡ SIArray arbitrary nesting, src/datatypes/array.c)
    val s = freshSession()
    val r = rows(s, "RETURN [[[[1]]]] AS z, [[[[[[[]]]]]]] AS d7")
    assert(r.head("z") == List(List(List(List(1L)))))
    assert(r.head("d7") ==
      List(List(List(List(List(List(List())))))))
    // non-literal deep nesting still errors loudly at translation
    val e = intercept[Exception] {
      s.run("WITH [[[1]]] AS x RETURN [x] AS z").collect()
    }
    assert(e.getMessage.contains("nesting depth") ||
      Option(e.getCause).exists(_.getMessage.contains("nesting depth")))
  }

  test("collect(entity) yields entity structs; var-len edge property filter") {
    val s = freshSession(
      "CREATE (:CA {v:1})-[:T {w:1}]->(:CB {v:2})-[:T {w:2}]->(:CC {v:3})")
    // the BASELINE index_node_lookup shape: RETURN a, collect(b)
    val r = rows(s,
      "MATCH (a:CA)-[:T]->(b) RETURN a.v AS av, collect(b) AS bs")
    assert(r.size == 1 && r.head("av") == 1L)
    assert(r.head("bs").asInstanceOf[Seq[_]].size == 1)
    // per-edge property filter inside the var-len traversal
    // (filterVariableLengthEdges, optimizer pass 5)
    val r2 = rows(s,
      "MATCH (a:CA)-[:T*1..2 {w:1}]->(x) RETURN x.v AS v")
    assert(r2 == Seq(Map("v" -> 2L)))
  }

  test("undirected MERGE matches either direction, creates outgoing") {
    val s = freshSession("CREATE (:UA {v:1})<-[:T]-(:UB {v:2})")
    // pattern matches the existing reversed edge — nothing created
    s.run("MATCH (a:UA), (b:UB) MERGE (a)-[:T]-(b)")
    assert(rows(s, "MATCH ()-[r:T]->() RETURN count(r) AS c") ==
      Seq(Map("c" -> 1L)))
    // no match anywhere → creates a single OUTGOING edge
    val s2 = freshSession("CREATE (:UA {v:1})", "CREATE (:UB {v:2})")
    s2.run("MATCH (a:UA), (b:UB) MERGE (a)-[:T]-(b)")
    assert(rows(s2,
      "MATCH (a:UA)-[r:T]->(b:UB) RETURN count(r) AS c") ==
      Seq(Map("c" -> 1L)))
  }

  test("map parameters: wire prefix, $p.key access, SET += $props") {
    val s = freshSession("CREATE (:MP {v: 1})")
    // wire-prefix map param + dotted access (test_entity_update.py:110)
    val r = rows(s,
      "CYPHER props={w: 5} MATCH (a:MP) RETURN a.v + $props.w AS s")
    assert(r == Seq(Map("s" -> 6L)))
    // client-API map param merged into properties
    s.run("MATCH (a:MP) SET a += $props", Map("props" -> Map("q" -> 7)))
    assert(rows(s, "MATCH (a:MP) RETURN a.q AS q") == Seq(Map("q" -> 7L)))
  }

  test("toJSON: entities render as typed JSON objects; strings quote") {
    val s = freshSession("CREATE (:TJ {v: 1, name: 'x'})-[:R {w: 2}]->(:TK)")
    val j = rows(s, "MATCH (a:TJ) RETURN toJSON(a) AS j").head("j").toString
    assert(j.startsWith("{\"type\": \"node\", \"id\": "))
    assert(j.contains("\"labels\": [\"TJ\"]"))
    assert(j.contains("\"name\": \"x\"") && j.contains("\"v\": 1"))
    val je = rows(s, "MATCH ()-[r:R]->() RETURN toJSON(r) AS j")
      .head("j").toString
    assert(je.startsWith("{\"type\": \"relationship\"") &&
      je.contains("\"w\": 2"))
    assert(rows(s, "RETURN toJSON('a\"b') AS j") ==
      Seq(Map("j" -> "\"a\\\"b\"")))
  }

  test("map literal as a returned value") {
    val s = freshSession()
    val r = rows(s, "RETURN {a: 1, b: 'x'} AS m")
    assert(r == Seq(Map("m" -> Map("a" -> 1L, "b" -> "x"))))
  }

  test("undirected MERGE from symmetric rows creates exactly one edge") {
    val s = freshSession("CREATE (:SY {v:1})", "CREATE (:SY {v:2})")
    s.run("MATCH (x:SY), (y:SY) WHERE x.v <> y.v MERGE (x)-[:T]-(y)")
    assert(rows(s, "MATCH ()-[r:T]->() RETURN count(r) AS c") ==
      Seq(Map("c" -> 1L)))
    // idempotent: re-running merges against the now-existing edge
    s.run("MATCH (x:SY), (y:SY) WHERE x.v <> y.v MERGE (x)-[:T]-(y)")
    assert(rows(s, "MATCH ()-[r:T]->() RETURN count(r) AS c") ==
      Seq(Map("c" -> 1L)))
  }

  test("collect(DISTINCT entity) dedups by id") {
    val s = freshSession(
      "CREATE (a:CD {v:1})-[:T]->(:CE)",
      "MATCH (a:CD) CREATE (a)-[:T]->(:CE)")
    val r = rows(s,
      "MATCH (a:CD)-[:T]->() RETURN collect(DISTINCT a) AS cs")
    assert(r.head("cs").asInstanceOf[Seq[_]].size == 1)
    val r2 = rows(s,
      "MATCH (a:CD)-[:T]->() RETURN collect(a) AS cs")
    assert(r2.head("cs").asInstanceOf[Seq[_]].size == 2)
  }

  test("list values flow through map params and SET = replacement") {
    val s = freshSession("CREATE (:LP {v: 1})")
    s.run("MATCH (n:LP) SET n += $props",
      Map("props" -> Map("xs" -> List(1L, 2L))))
    assert(rows(s, "MATCH (n:LP) RETURN size(n.xs) AS k") ==
      Seq(Map("k" -> 2L)))
    s.run("MATCH (n:LP) SET n = $props", Map("props" -> Map("w" -> 9)))
    assert(rows(s, "MATCH (n:LP) RETURN n.v AS v, n.w AS w") ==
      Seq(Map("v" -> null, "w" -> 9L)))
  }

  test("toJSON escapes control characters (parseable output)") {
    val s = freshSession()
    assert(rows(s, "RETURN toJSON('a\nb') AS j") ==
      Seq(Map("j" -> "\"a\\nb\"")))
  }

  test("out-of-int-range LIMIT errors instead of wrapping") {
    val s = freshSession("CREATE (:LR {v: 1})")
    val e = intercept[graft.cypher.Translator.TranslateError] {
      s.run("MATCH (n:LR) RETURN n.v AS v SKIP 4294967296").collect()
    }
    assert(e.getMessage.contains("out of range"))
  }

  test("RETURN DISTINCT paths: parallel edges stay distinct; map values dedup") {
    val s = freshSession(
      "CREATE (:PP {n:'a'})-[:T]->(:PQ {n:'b'})",
      "MATCH (a:PP), (b:PQ) CREATE (a)-[:T]->(b)")
    // two parallel edges → two distinct paths over identical node sequences
    val r = rows(s, "MATCH p = (:PP)-[:T]->(:PQ) RETURN DISTINCT p")
    assert(r.size == 2)
    // map-bearing value projections (nodes(p)) dedup via a serialized key
    val r2 = rows(s,
      "MATCH p = (:PP)-[:T]->(:PQ) RETURN DISTINCT nodes(p) AS ns")
    assert(r2.size == 1)
  }

  test("RETURN DISTINCT entities dedups by identity") {
    val s = freshSession(
      "CREATE (a:DE {v:1})-[:T]->(:DF)",
      "MATCH (a:DE) CREATE (a)-[:T]->(:DF)",
      "CREATE (:DE {v:2})-[:T]->(:DF)")
    // node a has two outgoing edges → two match rows, one distinct entity
    val r = rows(s,
      "MATCH (a:DE)-[:T]->() RETURN DISTINCT a")
    assert(r.size == 2)
  }

  test("comma-joined patterns share variables; MATCH continues after OPTIONAL") {
    val s = freshSession(
      "CREATE (:CJ {v:1})-[:X]->(:CK {v:2})",
      "MATCH (b:CK) CREATE (b)-[:Y]->(:CL {v:3})")
    val r = rows(s,
      "MATCH (a:CJ)-[:X]->(b), (b)-[:Y]->(c) RETURN a.v + b.v + c.v AS s")
    assert(r == Seq(Map("s" -> 6L)))
    val r2 = rows(s,
      """MATCH (a:CJ) OPTIONAL MATCH (a)-[:NOPE]->(z)
        |MATCH (c:CL) RETURN a.v + c.v AS s, z IS NULL AS zn""".stripMargin)
    assert(r2 == Seq(Map("s" -> 4L, "zn" -> true)))
  }

  test("sum/avg over all-NULL values yield 0 with rows, NULL with none") {
    val s = freshSession("CREATE (:AG {v: 1})", "CREATE (:AG)")
    // rows processed, but the aggregated property is NULL on every row
    // that survives the skip → reference returns 0 (AGG_SUM/AvgFinalize)
    val r = rows(s, "MATCH (a:AG) RETURN sum(a.nope) AS s, avg(a.nope) AS a")
    assert(r == Seq(Map("s" -> 0.0, "a" -> 0.0)))
    // zero rows → NULL
    val r2 = rows(s, "MATCH (x:NOPE) RETURN sum(x.v) AS s")
    assert(r2 == Seq(Map("s" -> null)))
  }

  test("startNode/endNode of a NULL relationship are NULL") {
    val s = freshSession("CREATE (:SN {v:1})")
    val r = rows(s,
      """MATCH (a:SN) OPTIONAL MATCH (a)-[r:NOPE]->()
        |RETURN id(startNode(r)) AS i, id(endNode(r)) AS j""".stripMargin)
    assert(r == Seq(Map("i" -> null, "j" -> null)))
  }

  test("entity functions null-propagate; type() on a node is a type error") {
    val s = freshSession("CREATE (:EN {v:1})")
    val r = rows(s,
      """MATCH (a:EN) OPTIONAL MATCH (a)-[:NOPE]->(z)
        |RETURN id(z) AS i, labels(z) AS l""".stripMargin)
    assert(r == Seq(Map("i" -> null, "l" -> null)))
    val e = intercept[graft.cypher.Translator.TranslateError] {
      s.run("MATCH (a:EN) RETURN type(a) AS t").collect()
    }
    assert(e.getMessage.contains("expects a relationship"))
  }

  test("chained comparison and exists() on property") {
    val s = freshSession("CREATE (:W {v: 5})", "CREATE (:W)")
    val r = rows(s,
      """MATCH (w:W) WHERE exists(w.v) AND 1 < w.v <= 5
        |RETURN count(*) AS c""".stripMargin)
    assert(r == Seq(Map("c" -> 1L)))
  }

  test("SKIP/LIMIT accept runtime-evaluated expressions (op_skip.c)") {
    val s = freshSession()
    val r = rows(s,
      """UNWIND [1,2,3,4] AS x RETURN x ORDER BY x
        |SKIP size([1]) LIMIT size([1,2])""".stripMargin)
    assert(r.map(_("x")) == Seq(2L, 3L))
    val e = intercept[graft.cypher.Translator.TranslateError] {
      s.run("UNWIND [1,2] AS x RETURN x LIMIT 'nope'").collect()
    }
    assert(e.getMessage.contains("LIMIT"))
  }

  // ─── ApplyMultiplexer: pattern predicates under OR/NOT (op_apply_multiplexer.c) ───

  private def orGraph(): CypherSession = freshSession(
    // a: has KNOWS out-edge; b: has LIKES out-edge; c: both; d: neither
    """CREATE (a:P {name:'a'}), (b:P {name:'b'}), (c:P {name:'c'}),
      |(d:P {name:'d'}), (t:T),
      |(a)-[:KNOWS]->(t), (b)-[:LIKES]->(t),
      |(c)-[:KNOWS]->(t), (c)-[:LIKES]->(t)""".stripMargin)

  test("OR of two pattern predicates") {
    val s = orGraph()
    val r = rows(s,
      """MATCH (p:P) WHERE (p)-[:KNOWS]->() OR (p)-[:LIKES]->()
        |RETURN p.name AS n ORDER BY n""".stripMargin)
    assert(r.map(_("n")) == Seq("a", "b", "c"))
  }

  test("pattern predicate OR value predicate") {
    val s = orGraph()
    val r = rows(s,
      """MATCH (p:P) WHERE (p)-[:LIKES]->() OR p.name = 'd'
        |RETURN p.name AS n ORDER BY n""".stripMargin)
    assert(r.map(_("n")) == Seq("b", "c", "d"))
  }

  test("NOT over an OR of pattern predicates") {
    val s = orGraph()
    val r = rows(s,
      """MATCH (p:P) WHERE NOT ((p)-[:KNOWS]->() OR (p)-[:LIKES]->())
        |RETURN p.name AS n""".stripMargin)
    assert(r.map(_("n")) == Seq("d"))
  }

  test("AND-of-OR mixing patterns and values; exists() inside OR") {
    val s = orGraph()
    val r = rows(s,
      """MATCH (p:P)
        |WHERE (exists((p)-[:KNOWS]->()) OR p.name = 'b') AND p.name <> 'c'
        |RETURN p.name AS n ORDER BY n""".stripMargin)
    assert(r.map(_("n")) == Seq("a", "b"))
  }

  test("same pattern repeated in OR runs once and still answers correctly") {
    val s = orGraph()
    val r = rows(s,
      """MATCH (p:P) WHERE (p)-[:KNOWS]->() OR (p)-[:KNOWS]->()
        |RETURN count(*) AS c""".stripMargin)
    assert(r == Seq(Map("c" -> 2L)))
  }
}
