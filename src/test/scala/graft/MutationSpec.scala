package graft

import graft.cypher.CypherSession
import org.scalatest.funsuite.AnyFunSuite

/** Graph DML tests (SURVEY.md §2.5): CREATE with bound vars, SET, DELETE,
  * DETACH DELETE, MERGE with ON MATCH / ON CREATE — behavior mirrors the
  * reference's flow suites (tests/flow/test_graph_update.py,
  * test_graph_delete.py, test_merge.py).
  */
class MutationSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshSession(create: String*): CypherSession = {
    val s = new CypherSession(spark)
    create.foreach(s.run(_))
    s
  }

  private def rows(s: CypherSession, q: String): Seq[Map[String, Any]] =
    s.rows(s.run(q))

  private def stat(s: CypherSession, q: String, col: String): Long = {
    val df = s.run(q)
    df.collect().head.getLong(df.columns.indexOf(col))
  }

  test("MATCH ... CREATE fans out per matched row") {
    val s = freshSession(
      "CREATE (:P {name:'a'})", "CREATE (:P {name:'b'})")
    val n = stat(s,
      "MATCH (p:P) CREATE (p)-[:OWNS]->(:Thing {of: p.name})",
      "relationships_created")
    assert(n == 2)
    assert(rows(s,
      "MATCH (p:P)-[:OWNS]->(t:Thing) RETURN p.name AS p, t.of AS t ORDER BY p")
      == Seq(Map("p" -> "a", "t" -> "a"), Map("p" -> "b", "t" -> "b")))
  }

  test("CREATE ... RETURN projects created entities") {
    val s = freshSession()
    val r = rows(s, "CREATE (n:P {name:'x', v: 1 + 2}) RETURN n.name AS n, n.v AS v")
    assert(r == Seq(Map("n" -> "x", "v" -> 3L)))
  }

  test("UNWIND ... CREATE creates one node per element") {
    val s = freshSession()
    val n = stat(s, "UNWIND [1,2,3] AS x CREATE (:N {v: x * 10})",
      "nodes_created")
    assert(n == 3)
    assert(rows(s, "MATCH (n:N) RETURN n.v AS v ORDER BY v")
      == Seq(Map("v" -> 10L), Map("v" -> 20L), Map("v" -> 30L)))
  }

  test("SET updates, adds, and removes (null) properties") {
    val s = freshSession(
      "CREATE (:P {name:'a', age: 1})", "CREATE (:P {name:'b', age: 2})")
    val n = stat(s,
      "MATCH (p:P) SET p.age = p.age * 10, p.tag = 'x'", "properties_set")
    assert(n == 4)
    assert(rows(s, "MATCH (p:P) RETURN p.name AS n, p.age AS a, p.tag AS t ORDER BY n")
      == Seq(Map("n" -> "a", "a" -> 10L, "t" -> "x"),
        Map("n" -> "b", "a" -> 20L, "t" -> "x")))
    // SET to null removes
    s.run("MATCH (p:P {name:'a'}) SET p.tag = null")
    assert(rows(s, "MATCH (p:P) WHERE p.tag IS NULL RETURN p.name AS n")
      == Seq(Map("n" -> "a")))
  }

  test("SET ... RETURN sees updated properties") {
    val s = freshSession("CREATE (:P {name:'a', v: 1})")
    val r = rows(s, "MATCH (p:P) SET p.v = 99 RETURN p.v AS v")
    assert(r == Seq(Map("v" -> 99L)))
  }

  test("SET on edge properties") {
    val s = freshSession("CREATE (:A)-[:R {w: 1}]->(:B)")
    s.run("MATCH (:A)-[r:R]->(:B) SET r.w = 5")
    assert(rows(s, "MATCH (:A)-[r:R]->(:B) RETURN r.w AS w")
      == Seq(Map("w" -> 5L)))
  }

  test("DELETE edge keeps nodes; DETACH DELETE node removes its edges") {
    val s = freshSession(
      "CREATE (a:P {name:'a'})-[:R]->(b:P {name:'b'})-[:R]->(c:P {name:'c'})")
    val rels = stat(s, "MATCH (:P {name:'a'})-[r:R]->() DELETE r",
      "relationships_deleted")
    assert(rels == 1)
    assert(rows(s, "MATCH (n:P) RETURN count(*) AS c") == Seq(Map("c" -> 3L)))
    // detach delete b: removes b and its remaining edge to c
    val nd = stat(s, "MATCH (b:P {name:'b'}) DETACH DELETE b", "nodes_deleted")
    assert(nd == 1)
    assert(rows(s, "MATCH (n:P) RETURN count(*) AS c") == Seq(Map("c" -> 2L)))
    assert(rows(s, "MATCH ()-[r]->() RETURN count(*) AS c")
      == Seq(Map("c" -> 0L)))
  }

  test("MERGE matches existing else creates; dedups identical pendings") {
    val s = freshSession("CREATE (:City {name:'paris'})")
    // existing → no create
    val n1 = stat(s, "MERGE (c:City {name:'paris'})", "nodes_created")
    assert(n1 == 0)
    // new → create once even when fed three identical rows
    val n2 = stat(s, "UNWIND [1,2,3] AS x MERGE (c:City {name:'rome'})",
      "nodes_created")
    assert(n2 == 1)
    // mixed values → one node per distinct key
    val n3 = stat(s, "UNWIND ['oslo','rome','oslo'] AS nm MERGE (c:City {name: nm})",
      "nodes_created")
    assert(n3 == 1)
    assert(rows(s, "MATCH (c:City) RETURN c.name AS n ORDER BY n")
      == Seq(Map("n" -> "oslo"), Map("n" -> "paris"), Map("n" -> "rome")))
  }

  test("CREATE with a null endpoint errors and commits nothing") {
    // reference commands.md: "attempting to create a relation with a null
    // endpoint will cause an error … no changes committed"
    val s = freshSession("CREATE (:P {v:1})")
    intercept[graft.cypher.Translator.TranslateError] {
      s.run("MATCH (p:P) OPTIONAL MATCH (p)-[:W]->(c:C) " +
        "CREATE (c)-[:NEW]->(:X)")
    }
    assert(rows(s, "MATCH (x:X) RETURN count(*) AS c") ==
      Seq(Map("c" -> 0L)))
  }

  test("SET and DELETE ignore null inputs (unmatched OPTIONAL vars)") {
    val s = freshSession("CREATE (:P {v:1})")
    s.run("MATCH (p:P) OPTIONAL MATCH (p)-[:W]->(c:C) SET c.v = 9")
    s.run("MATCH (p:P) OPTIONAL MATCH (p)-[:W]->(c:C) DELETE c")
    assert(rows(s, "MATCH (n) RETURN count(*) AS c") == Seq(Map("c" -> 1L)))
  }

  test("SET += merges only listed keys; SET = replaces the whole bag") {
    val s = freshSession("CREATE (:M {a: 1, b: 2})")
    // merge: b kept, c added (reference test_entity_update.py:67)
    s.run("MATCH (m:M) SET m += {a: 10, c: 3}")
    val r1 = s.rows(s.run(
      "MATCH (m:M) RETURN m.a AS a, m.b AS b, m.c AS c"))
    assert(r1 == Seq(Map("a" -> 10L, "b" -> 2L, "c" -> 3L)))
    // replace: only the map's keys survive (test_entity_update.py:75)
    s.run("MATCH (m:M) SET m = {z: 9}")
    val r2 = s.rows(s.run(
      "MATCH (m:M) RETURN m.a AS a, m.z AS z"))
    assert(r2 == Seq(Map("a" -> null, "z" -> 9L)))
  }

  test("multi-row SET folds sequentially per entity (record-by-record)") {
    // the reference applies updates record by record: two targets
    // binding the SAME node both land (a pick-one-write-row fold would
    // keep only the last target's map)
    val s = freshSession("CREATE (:Q {a: 0})")
    s.run("MATCH (x:Q), (y:Q) SET x.x = 1, y.y = 2")
    val r = s.rows(s.run(
      "MATCH (q:Q) RETURN q.a AS a, q.x AS x, q.y AS y"))
    assert(r == Seq(Map("a" -> 0L, "x" -> 1L, "y" -> 2L)))
    // duplicate writes count ONCE against the running state: the second
    // row leaves the value intact and sets nothing
    val s2 = freshSession("CREATE (:Q2)")
    val n = stat(s2, "UNWIND [7, 7] AS v MATCH (q:Q2) SET q.v = v",
      "properties_set")
    assert(n == 1)
    // distinct values still count per row (running state changes twice)
    val s3 = freshSession("CREATE (:Q3)")
    assert(stat(s3, "UNWIND [1, 2] AS v MATCH (q:Q3) SET q.v = v",
      "properties_set") == 2)
  }

  test("MERGE relationship between bound nodes") {
    val s = freshSession(
      "CREATE (:P {name:'a'})", "CREATE (:P {name:'b'})")
    val q = "MATCH (a:P {name:'a'}), (b:P {name:'b'}) MERGE (a)-[:KNOWS]->(b)"
    assert(stat(s, q, "relationships_created") == 1)
    // idempotent second run
    assert(stat(s, q, "relationships_created") == 0)
    assert(rows(s, "MATCH (:P)-[r:KNOWS]->(:P) RETURN count(*) AS c")
      == Seq(Map("c" -> 1L)))
  }

  test("MERGE ON CREATE / ON MATCH SET") {
    val s = freshSession()
    s.run("MERGE (n:K {k:'x'}) ON CREATE SET n.c = 1 ON MATCH SET n.m = 1")
    assert(rows(s, "MATCH (n:K) RETURN n.c AS c, n.m AS m")
      == Seq(Map("c" -> 1L, "m" -> null)))
    s.run("MERGE (n:K {k:'x'}) ON CREATE SET n.c = 2 ON MATCH SET n.m = 9")
    assert(rows(s, "MATCH (n:K) RETURN n.c AS c, n.m AS m")
      == Seq(Map("c" -> 1L, "m" -> 9L)))
  }

  test("MERGE ... RETURN binds both matched and created") {
    val s = freshSession("CREATE (:V {name:'a'})")
    val r = rows(s,
      "UNWIND ['a','b'] AS nm MERGE (v:V {name: nm}) RETURN v.name AS n ORDER BY n")
    assert(r == Seq(Map("n" -> "a"), Map("n" -> "b")))
  }

  test("concurrent writers are serialized: no lost updates") {
    // single-writer discipline (cmd_query.c:156-170): N threads × M CREATEs
    // must land exactly N·M nodes — unserialized snapshot-swap commits
    // would drop whole batches
    val s = freshSession()
    val (nThreads, mCreates) = (4, 5)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to nThreads).map { t =>
      val th = new Thread(() => {
        try (1 to mCreates).foreach { m =>
          s.run(s"CREATE (:CW {t: $t, m: $m})")
        } catch { case e: Throwable => errs.add(e) }
      })
      th.start(); th
    }
    threads.foreach(_.join())
    assert(errs.isEmpty, s"writer failed: ${Option(errs.peek()).map(_.getMessage)}")
    val r = rows(s, "MATCH (n:CW) RETURN count(n) AS c")
    assert(r == Seq(Map("c" -> (nThreads * mCreates).toLong)))
    // distinct (t, m) pairs all present — not N·M copies of one write
    val d = rows(s, "MATCH (n:CW) RETURN count(DISTINCT n.t * 100 + n.m) AS c")
    assert(d == Seq(Map("c" -> (nThreads * mCreates).toLong)))
  }
}
