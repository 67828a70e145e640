package graft

import graft.cypher.CypherSession
import org.scalatest.funsuite.AnyFunSuite

/** Port of `tests/flow/test_procedures.py` (the scenarios beyond what
  * ProcedureSpec / TCK Call1-3 already pin): the fruit graph, YIELD
  * subset/duplicate/unknown errors, argument-arity errors, the full
  * CALL + clause-mixing matrix, catalog procedures and db.indexes
  * reporting.
  */
class FlowProceduresSpec extends AnyFunSuite {
  import SparkTestSession._

  /** populate_graph(): 5 fruit + one goWellWith edge + fulltext index. */
  private def fruitSession(): CypherSession = {
    val s = new CypherSession(spark)
    s.run("""CREATE (o1:fruit {name: 'Orange1', value: 1}),
      |(:fruit {name: 'Orange2', value: 2}), (:fruit {name: 'Orange3', value: 3}),
      |(:fruit {name: 'Orange4', value: 4}), (b:fruit {name: 'Banana', value: 5}),
      |(o1)-[:goWellWith]->(b)""".stripMargin)
    s.run("CALL db.idx.fulltext.createNodeIndex('fruit', 'name')")
    s
  }

  private def rows(s: CypherSession, q: String,
      params: Map[String, Any] = Map.empty): Seq[Map[String, Any]] =
    s.rows(s.run(q, params))

  /** A returned node's name property. */
  private def name(v: Any): String =
    v.asInstanceOf[Map[String, Any]]("props")
      .asInstanceOf[Map[String, Any]]("name").asInstanceOf[String]

  private val prefixParams = Map[String, Any]("prefix" -> "Orange*")

  test("test01 no YIELD: standalone call includes all outputs") {
    val s = fruitSession()
    val r = rows(s, "CALL db.idx.fulltext.queryNodes('fruit', 'Orange1')")
    assert(r.size == 1)
    assert(r.head.contains("node") && r.head("node") != null)
    assert(name(r.head("node")) == "Orange1")
  }

  test("test02 YIELD subset ok; unknown or duplicated output is an error") {
    val s = fruitSession()
    val r = rows(s,
      """CALL db.idx.fulltext.queryNodes('fruit', 'Orange1') YIELD node
        |RETURN node""".stripMargin)
    assert(r.size == 1 && name(r.head("node")) == "Orange1")
    intercept[Exception](rows(s,
      """CALL db.idx.fulltext.queryNodes('fruit', 'Orange1') YIELD unknown
        |RETURN unknown""".stripMargin))
    intercept[Exception](rows(s,
      """CALL db.idx.fulltext.queryNodes('fruit', 'Orange1')
        |YIELD node, node RETURN node""".stripMargin))
  }

  test("test03 argument arity errors: omitted and overloaded") {
    val s = fruitSession()
    intercept[Exception](
      rows(s, "CALL db.idx.fulltext.queryNodes() YIELD node RETURN node"))
    intercept[Exception](rows(s,
      "CALL db.idx.fulltext.queryNodes('arg1') YIELD node RETURN node"))
    intercept[Exception](rows(s,
      """CALL db.idx.fulltext.queryNodes('fruit', 'q', 'fruit', 'q')
        |YIELD node RETURN node""".stripMargin))
  }

  test("test04 CALL mixed with WHERE/RETURN/ORDER/SKIP/LIMIT/MATCH/UNWIND") {
    val s = fruitSession()
    val oranges = Set("Orange1", "Orange2", "Orange3", "Orange4")
    def names(q: String): Seq[String] =
      rows(s, q, prefixParams).map(r => name(r("node")))

    // CALL + RETURN (unordered membership, like the reference harness)
    assert(names("""CALL db.idx.fulltext.queryNodes('fruit', $prefix)
      |YIELD node RETURN node""".stripMargin).toSet == oranges)
    // CALL + WHERE + RETURN
    assert(names("""CALL db.idx.fulltext.queryNodes('fruit', $prefix)
      |YIELD node WHERE node.value > 2 RETURN node""".stripMargin).toSet
      == Set("Orange3", "Orange4"))
    // CALL + WHERE + RETURN + ORDER + SKIP
    assert(names("""CALL db.idx.fulltext.queryNodes('fruit', $prefix)
      |YIELD node WHERE node.value > 2 RETURN node
      |ORDER BY node.value SKIP 1""".stripMargin) == Seq("Orange4"))
    // CALL + WHERE + RETURN + LIMIT (membership under cap)
    val lim = names("""CALL db.idx.fulltext.queryNodes('fruit', $prefix)
      |YIELD node WHERE node.value > 2 RETURN node LIMIT 2""".stripMargin)
    assert(lim.size == 2 && lim.toSet.subsetOf(Set("Orange3", "Orange4")))
    // CALL + WHERE + RETURN + ORDER + SKIP + LIMIT
    assert(names("""CALL db.idx.fulltext.queryNodes('fruit', $prefix)
      |YIELD node WHERE node.value > 2 RETURN node
      |ORDER BY node.value SKIP 1 LIMIT 1""".stripMargin) == Seq("Orange4"))
    // CALL + RETURN + ORDER
    assert(names("""CALL db.idx.fulltext.queryNodes('fruit', $prefix)
      |YIELD node RETURN node ORDER BY node.value""".stripMargin)
      == Seq("Orange1", "Orange2", "Orange3", "Orange4"))
    // CALL + RETURN + ORDER + SKIP
    assert(names("""CALL db.idx.fulltext.queryNodes('fruit', $prefix)
      |YIELD node RETURN node ORDER BY node.value SKIP 1""".stripMargin)
      == Seq("Orange2", "Orange3", "Orange4"))
    // CALL + RETURN + ORDER + LIMIT
    assert(names("""CALL db.idx.fulltext.queryNodes('fruit', $prefix)
      |YIELD node RETURN node ORDER BY node.value LIMIT 2""".stripMargin)
      == Seq("Orange1", "Orange2"))
    // CALL + RETURN + ORDER + SKIP + LIMIT
    assert(names("""CALL db.idx.fulltext.queryNodes('fruit', $prefix)
      |YIELD node RETURN node ORDER BY node.value SKIP 1 LIMIT 1"""
      .stripMargin) == Seq("Orange2"))
    // CALL + WHERE + RETURN + ORDER
    assert(names("""CALL db.idx.fulltext.queryNodes('fruit', $prefix)
      |YIELD node WHERE node.value > 2 RETURN node ORDER BY node.value"""
      .stripMargin) == Seq("Orange3", "Orange4"))
    // CALL + WHERE + RETURN + ORDER + LIMIT
    assert(names("""CALL db.idx.fulltext.queryNodes('fruit', $prefix)
      |YIELD node WHERE node.value > 2 RETURN node
      |ORDER BY node.value LIMIT 1""".stripMargin) == Seq("Orange3"))
    // CALL + MATCH + RETURN: expand from the yielded node
    val z = rows(s, """CALL db.idx.fulltext.queryNodes('fruit', $prefix)
      |YIELD node MATCH (node)-[]->(z) RETURN z""".stripMargin, prefixParams)
    assert(z.map(r => name(r("z"))) == Seq("Banana"))
    // UNWIND + CALL + RETURN: the call runs per driving row
    assert(names("""UNWIND [1, 2] AS x
      |CALL db.idx.fulltext.queryNodes('fruit', $prefix) YIELD node
      |RETURN node""".stripMargin).groupBy(identity)
      .view.mapValues(_.size).toMap == oranges.map(_ -> 2).toMap)
  }

  test("test05-07 catalog procedures on the fruit graph") {
    val s = fruitSession()
    assert(rows(s, "CALL db.labels()") == Seq(Map("label" -> "fruit")))
    assert(rows(s, "CALL db.relationshipTypes()")
      == Seq(Map("relationshipType" -> "goWellWith")))
    assert(rows(s, "CALL db.propertyKeys()")
      .map(_("propertyKey")).toSet == Set("name", "value"))
  }

  test("test08 fulltext syntax error propagates") {
    val s = fruitSession()
    intercept[Exception](rows(s,
      """CALL db.idx.fulltext.queryNodes('fruit', 'Orange || Apple')
        |YIELD node RETURN node""".stripMargin))
  }

  test("test09 procedure lookup is case-insensitive; unknown errors") {
    val s = fruitSession()
    assert(rows(s, "CALL dB.LaBeLS()") == Seq(Map("label" -> "fruit")))
    intercept[Exception](rows(s, "CALL db.nonExistingProc()"))
    assert(rows(s,
      """CALL db.IDX.FulLText.QueRyNoDes('fruit', 'Orange1') YIELD node
        |RETURN node""".stripMargin).size == 1)
  }

  test("test10 dbms.procedures lists the registry with modes") {
    val s = fruitSession()
    val procs = rows(s, "CALL dbms.procedures() YIELD name, mode")
      .map(r => (r("name"), r("mode"))).toSet
    Seq(("db.labels", "READ"),
      ("db.idx.fulltext.createNodeIndex", "WRITE"),
      ("db.propertyKeys", "READ"), ("dbms.procedures", "READ"),
      ("db.relationshipTypes", "READ"), ("algo.BFS", "READ"),
      ("algo.pageRank", "READ"), ("db.idx.fulltext.queryNodes", "READ"),
      ("db.idx.fulltext.drop", "WRITE")).foreach { exp =>
      assert(procs.contains(exp), s"missing $exp")
    }
  }

  test("test11 db.indexes reporting incl. YIELD-subset projection") {
    val s = fruitSession()
    assert(rows(s,
      "CALL db.indexes() YIELD type, label, properties")
      == Seq(Map("type" -> "full-text", "label" -> "fruit",
        "properties" -> List("name"))))
    // exact-match index on another property of the same label
    assert(s.run("CREATE INDEX ON :fruit(other_property)")
      .select("indices_created").head().getLong(0) == 1L)
    assert(rows(s,
      """CALL db.indexes() YIELD type, label, properties
        |RETURN type, label, properties ORDER BY type""".stripMargin)
      == Seq(
        Map("type" -> "exact-match", "label" -> "fruit",
          "properties" -> List("other_property")),
        Map("type" -> "full-text", "label" -> "fruit",
          "properties" -> List("name"))))
    // exact-match on the fulltext-indexed property: still its own index
    assert(s.run("CREATE INDEX ON :fruit(name)")
      .select("indices_created").head().getLong(0) == 1L)
    assert(rows(s,
      """CALL db.indexes() YIELD type, label, properties
        |RETURN type, label, properties ORDER BY type""".stripMargin)
      == Seq(
        Map("type" -> "exact-match", "label" -> "fruit",
          "properties" -> List("other_property", "name")),
        Map("type" -> "full-text", "label" -> "fruit",
          "properties" -> List("name"))))
    // yielding only one element projects it
    assert(rows(s, "CALL db.indexes() YIELD label")
      == Seq(Map("label" -> "fruit"), Map("label" -> "fruit")))
  }
}
