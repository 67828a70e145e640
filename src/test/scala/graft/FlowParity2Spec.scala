package graft

import graft.cypher.{CypherSession, Graft}
import org.scalatest.funsuite.AnyFunSuite

/** Second tranche of reference flow suites ported verbatim (sources named
  * per section under `/root/reference/tests/flow/`): same graphs, queries,
  * plan assertions and result sets, driven through `Graft`/`explainOps`.
  * Divergences are triaged at their assertions.
  */
class FlowParity2Spec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val g = new Graft(spark)
  private lazy val sess = new CypherSession(spark)
  private def rows(gid: String, q: String): Seq[Map[String, Any]] =
    sess.rows(g.query(gid, q))
  private def plan(gid: String, q: String): String = g.explainOps(gid, q)

  // ── test_null_handling.py ──────────────────────────────────────────────
  test("null handling: writes, functions and joins on null entities") {
    g.query("fp_null", "CREATE (:L {v: 'v1'})")
    // test01: CREATE with a null endpoint errors
    intercept[Exception](g.query("fp_null",
      """MATCH (a) OPTIONAL MATCH (a)-[ne]->(nn) CREATE (nn)-[:E]->(a)"""))
    intercept[Exception](g.query("fp_null",
      """MATCH (a) OPTIONAL MATCH (a)-[ne]->(nn) CREATE (a)-[:E]->(nn)"""))
    // test02: MERGE with a null endpoint errors
    intercept[Exception](g.query("fp_null",
      """MATCH (a) OPTIONAL MATCH (a)-[ne]->(nn) MERGE (nn)-[:E]->(a)"""))
    intercept[Exception](g.query("fp_null",
      """MATCH (a) OPTIONAL MATCH (a)-[ne]->(nn) MERGE (a)-[:E]->(nn)"""))
    // test03: SET updates real entities and ignores null ones
    assert(rows("fp_null",
      """MATCH (a) OPTIONAL MATCH (a)-[ne]->(nn)
        |SET a.v2 = true, nn.v2 = true, a.v3 = nn.v3
        |RETURN a.v2, nn.v2, a.v3""".stripMargin) ==
      Seq(Map("a.v2" -> true, "nn.v2" -> null, "a.v3" -> null)))
    // ...and counts exactly the one real write (stats frame needs no RETURN;
    // a.v2 is already true so only restoring it to a new value counts)
    assert(rows("fp_null",
      """MATCH (a) OPTIONAL MATCH (a)-[ne]->(nn)
        |SET a.v2 = false, nn.v2 = true, a.v3 = nn.v3""".stripMargin)
      .head("properties_set") == 1L)
    // test04: DELETE ignores null entities
    assert(rows("fp_null",
      "MATCH (a) OPTIONAL MATCH (a)-[ne]->(nn) DELETE nn")
      .head("nodes_deleted") == 0L)
    assert(rows("fp_null", "MATCH (a) RETURN count(a)")
      .head("count(a)") == 1L)
    // test05: functions pass null through
    assert(rows("fp_null",
      "MATCH (a) OPTIONAL MATCH (a)-[r]->(b) RETURN type(r), labels(b), b.v * 5")
      .map(r => (r("type(r)"), r("labels(b)"), r("b.v * 5"))) ==
      Seq((null, null, null)))
    // test06: null named paths — p and length(p) are null, collect drops it
    assert(rows("fp_null",
      "MATCH (a) OPTIONAL MATCH p = (a)-[r]->() RETURN p, length(p), collect(relationships(p))")
      .map(r => (r("p"), r("length(p)"), r("collect(relationships(p))"))) ==
      Seq((null, null, Seq())))
    // test07: scans/traversals on a bound null input
    assert(rows("fp_null", "WITH NULL AS a MATCH (a) RETURN a") ==
      Seq(Map("a" -> null)))
    // the isolated bare rebind is a pure pass-through (the reference's
    // no-op re-match) — a DYNAMIC non-entity value survives intact, while
    // a traversal over it still matches nothing. (A statically-literal
    // bind `WITH 5 AS a MATCH (a)` raises VariableTypeConflict at compile
    // time instead — promoted TCK Match1 [11].)
    assert(rows("fp_null", "WITH abs(5) AS a MATCH (a) RETURN a") ==
      Seq(Map("a" -> 5L)))
    assert(rows("fp_null",
      "WITH abs(5) AS a MATCH (a)-[e]->(b) RETURN a, e, b").isEmpty)
    intercept[Exception](
      rows("fp_null", "WITH 5 AS a MATCH (a) RETURN a"))
    val q7b = "WITH NULL AS a MATCH (a)-[e]->(b) RETURN a, e, b"
    val p7b = plan("fp_null", q7b)
    assert(!p7b.contains("Scan"), p7b)
    assert(p7b.contains("Conditional Traverse"), p7b)
    assert(rows("fp_null", q7b).isEmpty)
    val q7c = "WITH NULL AS e MATCH (a:L)-[e]->(b) RETURN a, e, b"
    val p7c = plan("fp_null", q7c)
    assert(p7c.contains("Label Scan"), p7c)
    assert(p7c.contains("Conditional Traverse"), p7c)
    assert(rows("fp_null", q7c).isEmpty)
    // test08: ValueHashJoin never treats null as equal to null
    val q8 = "MATCH (a), (b) WHERE a.fakeval = b.fakeval RETURN a, b"
    assert(plan("fp_null", q8).contains("Value Hash Join"), plan("fp_null", q8))
    assert(rows("fp_null", q8).isEmpty)
    assert(rows("fp_null", "MATCH (a), (b) WHERE a.v = b.v RETURN a.v, b.v")
      .map(r => (r("a.v"), r("b.v"))) == Seq(("v1", "v1")))
  }

  // ── test_params.py ─────────────────────────────────────────────────────
  test("params: literals, expressions, scans, skip/limit and missing") {
    def prows(q: String, params: Map[String, Any]): Seq[Map[String, Any]] =
      sess.rows(g.query("fp_par", q, params))
    // test_simple_params
    val simple: Seq[Any] = Seq(1L, 2.3d, -1L, -2.3d, "str", true, false,
      null, List(0L, 1L, 2L))
    simple.foreach { p =>
      assert(prows("RETURN $param", Map("param" -> p)).head("$param") == p,
        String.valueOf(p))
    }
    // test_expression_on_param
    assert(prows("RETURN $param + 1", Map("param" -> 1)).head("$param + 1")
      == 2L)
    // test_node_retrival
    g.query("fp_par",
      """CREATE (:Person {name:'a'}), (:Person {name:'b'}),
        |(:NoPerson {name:'a'})""".stripMargin)
    val n = prows("MATCH (n :Person {name:$name}) RETURN n",
      Map("name" -> "a"))
    assert(n.size == 1 && n.head("n").asInstanceOf[Map[String, Any]]("props")
      .asInstanceOf[Map[String, Any]] == Map("name" -> "a"), n.toString)
    // test_parameterized_skip_limit
    assert(prows("UNWIND [1,2,3] AS X RETURN X SKIP $skip LIMIT $limit",
      Map("skip" -> 1, "limit" -> 1)).map(_("X")) == Seq(2L))
    intercept[Exception](prows(
      "UNWIND [1,2,3] AS X RETURN X SKIP $skip LIMIT $limit",
      Map("skip" -> "1", "limit" -> 1)))
    // test_missing_parameter
    intercept[Exception](prows("RETURN $missing", Map.empty))
    intercept[Exception](prows(
      "MATCH (a) WHERE a.v = $missing RETURN a", Map.empty))
    intercept[Exception](prows(
      "MATCH (a) SET a.v = $missing RETURN a", Map.empty))
    // test_id_scan (wire-prefix params header, NodeByIdSeek plan)
    g.query("fp_par", "CREATE ({val:1})")
    assert(prows("MATCH (n) WHERE id(n)=$id RETURN n.val", Map("id" -> 3))
      .map(_("n.val")) == Seq(1L))
    assert(plan("fp_par", "CYPHER id=3 MATCH (n) WHERE id(n)=$id RETURN n.val")
      .contains("NodeByIdSeek"))
  }

  // ── test_union.py ──────────────────────────────────────────────────────
  test("union: dedup, column agreement, edge aliases, mixed entity kinds") {
    g.query("fp_un",
      """CREATE (:L {v:'v1'})-[:E1 {v:'v1_v2'}]->(:L {v:'v2'})
        |-[:E2 {v:'v2_v3'}]->(:L {v:'v3'})""".stripMargin)
    // test01
    assert(rows("fp_un", "RETURN 1 as one UNION ALL RETURN 1 as one")
      .map(_("one")) == Seq(1L, 1L))
    assert(rows("fp_un", "RETURN 1 as one UNION RETURN 1 as one")
      .map(_("one")) == Seq(1L))
    assert(rows("fp_un",
      """MATCH a = () RETURN length(a) AS len UNION ALL
        |MATCH b = () RETURN length(b) AS len""".stripMargin).size == 6)
    // test02: projections must agree exactly
    intercept[Exception](
      rows("fp_un", "RETURN 1 as one UNION RETURN 1 as two"))
    // test03: UNION of identical sides ≡ one side
    val oneSide = rows("fp_un",
      "MATCH (a)-[]->(b) RETURN a.v, b.v ORDER BY a.v, b.v")
    assert(rows("fp_un",
      """MATCH (a)-[]->(b) RETURN a.v, b.v ORDER BY a.v, b.v
        |UNION
        |MATCH (a)-[]->(b) RETURN a.v, b.v ORDER BY a.v, b.v""".stripMargin)
      == oneSide)
    // test04: edge alias reuse within one side errors
    intercept[Exception](rows("fp_un",
      """MATCH ()-[e]->()-[e]->() RETURN e
        |UNION
        |MATCH ()-[e]->() RETURN e""".stripMargin))
    // test05: the same edge alias on every side is expected
    assert(rows("fp_un",
      """MATCH ()-[e]->() RETURN e.v ORDER BY e.v
        |UNION
        |MATCH ()-[e]->() RETURN e.v ORDER BY e.v
        |UNION
        |MATCH ()-[e]->() RETURN e.v ORDER BY e.v""".stripMargin)
      .map(_("e.v")) == Seq("v1_v2", "v2_v3"))
    // test06: nodes and edges collate in one column; UNION ≡ UNION ALL
    // here (no duplicates between the sides)
    val u = rows("fp_un",
      "MATCH ()-[e]->() RETURN e UNION MATCH (e) RETURN e")
    assert(u.size == 5, u.toString)
    val ua = rows("fp_un",
      "MATCH ()-[e]->() RETURN e UNION ALL MATCH (e) RETURN e")
    assert(u.toSet == ua.toSet)
  }

  // ── test_graph_create.py ───────────────────────────────────────────────
  test("graph create: stats, projections, null props, volatile values") {
    def stats(q: String): Map[String, Any] = rows("fp_gc", q).head
    def labels(): Set[Any] =
      rows("fp_gc", "CALL db.labels()").map(_("label")).toSet
    // test01
    assert(stats("CREATE (a:person {name:'A'}), (b:person {name:'B'})")
      ("nodes_created") == 2L)
    val r1 = rows("fp_gc",
      """MATCH (src:person) CREATE (src)-[e:knows]->(dest {name:'C'})
        |RETURN src, e, dest ORDER BY ID(src) DESC LIMIT 1""".stripMargin)
    assert(r1.size == 1)
    assert(r1.head("src").asInstanceOf[Map[String, Any]]("props")
      .asInstanceOf[Map[String, Any]]("name") == "B")
    // the RETURN form surfaces the projection; verify the side effects
    assert(rows("fp_gc", "MATCH (n) RETURN count(n)")
      .head("count(n)") == 4L)
    assert(rows("fp_gc", "MATCH ()-[e:knows]->() RETURN count(e)")
      .head("count(e)") == 2L)
    // test02 (labels_added probed via db.labels — the stats frame carries
    // the reference's core counters; label-added is derived state here)
    val preLabels = labels()
    assert(!preLabels.contains("clone"))
    val r2 = rows("fp_gc",
      """MATCH (p:person)-[e:knows]->()
        |CREATE (c:clone {doublename: p.name + toLower(p.name),
        |                 source_of: TYPE(e)})
        |RETURN c.doublename, c.source_of ORDER BY c.doublename""".stripMargin)
    assert(r2.map(r => (r("c.doublename"), r("c.source_of"))) ==
      Seq(("Aa", "knows"), ("Bb", "knows")))
    assert(labels() == preLabels + "clone")
    // test03
    val r3 = rows("fp_gc",
      """UNWIND [10,20,30] AS x CREATE (p:person {age:x})
        |RETURN p.age ORDER BY p.age""".stripMargin)
    assert(r3.map(_("p.age")) == Seq(10L, 20L, 30L))
    val r3b = rows("fp_gc",
      """UNWIND ['Vancouver', 'Portland', 'Calgary'] AS city
        |CREATE (p:person {birthplace: city})
        |RETURN p.birthplace ORDER BY p.birthplace""".stripMargin)
    assert(r3b.map(_("p.birthplace")) ==
      Seq("Calgary", "Portland", "Vancouver"))
    // test04: null property values are not stored (and don't count)
    val r4 = rows("fp_gc", "CREATE (a:L {v1: NULL, v2: 'prop'}) RETURN a")
    assert(r4.head("a").asInstanceOf[Map[String, Any]]("props")
      .asInstanceOf[Map[String, Any]] == Map("v2" -> "prop"))
    rows("fp_gc", "CREATE (:M), (:M {v: 1})")
    val s4 = stats(
      "MATCH (m:M) WITH m ORDER BY m.v DESC CREATE ({v: m.v})")
    assert(s4("nodes_created") == 2L && s4("properties_set") == 1L,
      s4.toString)
    // test05: referencing a property of an entity created in the same
    // clause errors
    val e5 = intercept[Exception](
      rows("fp_gc", "CREATE (a {val: 2}), (b {val: a.val})"))
    assert(e5.getMessage.toLowerCase.contains("undefined"),
      e5.getMessage)
    // ...but only PROPERTY reads raise — a non-property reference to the
    // same-clause entity (id(a)) is legal and sees the assigned id
    val r5b = rows("fp_gc", "CREATE (a), (b {x: id(a)}) RETURN id(a) = b.x")
    assert(r5b.head.values.head == true, r5b.toString)
    // test06: volatile values project after entity creation
    val r6 = rows("fp_gc",
      "MATCH ()-[e*]->() CREATE (:L) WITH e RETURN 5")
    assert(r6.map(_("5")) == Seq(5L, 5L), r6.toString)
    val r6b = rows("fp_gc",
      "UNWIND [1, 2] AS val WITH collect(val) AS arr CREATE (:L) RETURN arr")
    assert(r6b.map(_("arr")) == Seq(List(1L, 2L)), r6b.toString)
  }

  // ── test_multiple_edges.py ─────────────────────────────────────────────
  test("multiple edges: parallel same-type edges create, match and delete") {
    def stats(q: String): Map[String, Any] = rows("fp_me", q).head
    rows("fp_me", "CREATE (a {v:1}), (b {v:2})")
    // DIVERGENCE (kept): the reference returns ZERO rows for a global
    // aggregate over an empty match; openCypher/TCK pin one row with
    // count = 0 (Aggregation1), which our engine follows
    assert(rows("fp_me",
      "MATCH (a {v:1})-[e]->(b {v:2}) RETURN count(e)")
      .head("count(e)") == 0L)
    assert(stats("MATCH (a {v:1}), (b {v:2}) CREATE (a)-[:R {v:1}]->(b)")
      ("relationships_created") == 1L)
    assert(rows("fp_me",
      "MATCH (a {v:1})-[e:R]->(b {v:2}) RETURN count(e)")
      .head("count(e)") == 1L)
    val firstId = rows("fp_me",
      "MATCH (a {v:1})-[e:R]->(b {v:2}) RETURN ID(e)").head("ID(e)")
      .asInstanceOf[Long]
    assert(stats("MATCH (a {v:1}), (b {v:2}) CREATE (a)-[:R {v:2}]->(b)")
      ("relationships_created") == 1L)
    assert(rows("fp_me",
      "MATCH (a {v:1})-[e:R]->(b {v:2}) RETURN count(e)")
      .head("count(e)") == 2L)
    assert(rows("fp_me",
      "MATCH (a {v:1})-[:R*]->(b {v:2}) RETURN count(b)")
      .head("count(b)") == 2L)
    assert(stats("MATCH (a {v:1})-[e:R {v:1}]->(b {v:2}) DELETE e")
      ("relationships_deleted") == 1L)
    val secondId = rows("fp_me",
      "MATCH (a {v:1})-[e:R]->(b {v:2}) RETURN ID(e)").head("ID(e)")
      .asInstanceOf[Long]
    assert(secondId != firstId) // distinct ids for parallel edges
    assert(stats("MATCH (a {v:1})-[e:R {v:2}]->(b {v:2}) DELETE e")
      ("relationships_deleted") == 1L)
    assert(rows("fp_me", // TCK count-0 divergence, as above
      "MATCH (a {v:1})-[e:R]->(b {v:2}) RETURN count(e)")
      .head("count(e)") == 0L)
    assert(stats("MATCH (a {v:1})-[e]->(b {v:2}) DELETE e")
      ("relationships_deleted") == 0L)
    assert(stats("MATCH (a {v:1}), (b {v:2}) CREATE (a)-[:R {v:3}]->(b)")
      ("relationships_created") == 1L)
    assert(rows("fp_me",
      "MATCH (a {v:1})-[e:R]->(b {v:2}) RETURN count(e)")
      .head("count(e)") == 1L)
  }

  // ── test_node_by_id.py ─────────────────────────────────────────────────
  test("node by id: every id-range predicate seeks and matches the " +
      "property-filter twin") {
    g.query("fp_nid", (0 until 10)
      .map(i => s"(:person {id:$i})").mkString("CREATE ", ", ", ""))
    rows("fp_nid", "MATCH (n) SET n.id = ID(n)")
    val cases = Seq(
      ("ID(n) > 0", "n.id > 0"), ("0 < ID(n)", "0 < n.id"),
      ("ID(n) >= 0", "n.id >= 0"), ("0 <= ID(n)", "0 <= n.id"),
      ("ID(n) = 0", "n.id = 0"),
      ("ID(n) > 5", "n.id > 5"), ("5 < ID(n)", "5 < n.id"),
      ("ID(n) >= 5", "n.id >= 5"), ("5 <= ID(n)", "5 <= n.id"),
      ("ID(n) < 5", "n.id < 5"),
      ("ID(n) <= 5", "n.id <= 5"), ("5 >= ID(n)", "5 >= n.id"),
      ("ID(n) < 9", "n.id < 9"), ("9 > ID(n)", "9 > n.id"),
      ("ID(n) <= 9", "n.id <= 9"), ("9 >= ID(n)", "9 >= n.id"),
      ("ID(n) < 100", "n.id < 100"), ("100 > ID(n)", "100 > n.id"),
      ("ID(n) <= 100", "n.id <= 100"), ("100 >= ID(n)", "100 >= n.id"))
    cases.foreach { case (idPred, propPred) =>
      val qa = s"MATCH (n) WHERE $idPred RETURN n ORDER BY n.id"
      val qb = s"MATCH (n) WHERE $propPred RETURN n ORDER BY n.id"
      assert(plan("fp_nid", qa).contains("NodeByIdSeek"), qa)
      assert(!plan("fp_nid", qb).contains("NodeByIdSeek"), qb)
      assert(rows("fp_nid", qa) == rows("fp_nid", qb), qa)
    }
    // cartesian product: per-branch id seeks reset correctly
    val qa = """MATCH (a), (b) WHERE ID(a) > 5 AND ID(b) <= 5
               |RETURN a, b ORDER BY a.id, b.id""".stripMargin
    val qb = """MATCH (a), (b) WHERE a.id > 5 AND b.id <= 5
               |RETURN a, b ORDER BY a.id, b.id""".stripMargin
    assert(plan("fp_nid", qa).contains("NodeByIdSeek"), plan("fp_nid", qa))
    assert(!plan("fp_nid", qb).contains("NodeByIdSeek"))
    assert(rows("fp_nid", qa) == rows("fp_nid", qb))
    // none-existing ids over a labeled scan: empty, and the combined
    // label+id op name renders
    Seq("ID(a) = 999", "ID(a) > 999", "ID(a) > 800 AND ID(a) < 900")
      .foreach { p =>
        val q = s"MATCH (a:person) WHERE $p RETURN a"
        assert(rows("fp_nid", q).isEmpty, q)
        assert(plan("fp_nid", q).contains("Node By Label and ID Scan"), q)
      }
  }

  // ── test_optional_match.py ─────────────────────────────────────────────
  test("optional match: 20 reference scenarios over the v1-v4 chain") {
    g.query("fp_om",
      """CREATE (a:L {v:'v1'}), (b:L {v:'v2'}), (c:L {v:'v3'}),
        |(d:L {v:'v4'}), (a)-[:E1]->(b), (b)-[:E2]->(c)""".stripMargin)
    def vals(q: String, cols: String*): Seq[Seq[Any]] =
      rows("fp_om", q).map(r => cols.map(r(_)).toSeq)
    // test01 disjoint optional
    assert(vals(
      "MATCH (a {v: 'v1'}) OPTIONAL MATCH (b) RETURN a.v, b.v ORDER BY a.v, b.v",
      "a.v", "b.v") == Seq(Seq("v1", "v1"), Seq("v1", "v2"),
        Seq("v1", "v3"), Seq("v1", "v4")))
    // test02 optional traverse, all match
    assert(vals(
      """MATCH (a) WHERE a.v IN ['v1', 'v2'] OPTIONAL MATCH (a)-[]->(b)
        |RETURN a.v, b.v ORDER BY a.v, b.v""".stripMargin, "a.v", "b.v") ==
      Seq(Seq("v1", "v2"), Seq("v2", "v3")))
    // test03 optional traverse with nulls
    assert(vals(
      "MATCH (a) OPTIONAL MATCH (a)-[]->(b) RETURN a.v, b.v ORDER BY a.v, b.v",
      "a.v", "b.v") == Seq(Seq("v1", "v2"), Seq("v2", "v3"),
        Seq("v3", null), Seq("v4", null)))
    // test04 optional traverse with predicate
    assert(vals(
      """MATCH (a) OPTIONAL MATCH (a)-[]->(b) WHERE b.v = 'v2'
        |RETURN a.v, b.v ORDER BY a.v, b.v""".stripMargin, "a.v", "b.v") ==
      Seq(Seq("v1", "v2"), Seq("v2", null), Seq("v3", null),
        Seq("v4", null)))
    // test05 optional expand-into repeats the match
    val t5 = vals(
      """MATCH (a)-[]->(b) OPTIONAL MATCH (a)-[e]->(b)
        |RETURN a.v, b.v, TYPE(e) ORDER BY a.v, b.v""".stripMargin,
      "a.v", "b.v", "TYPE(e)")
    assert(t5 == Seq(Seq("v1", "v2", "E1"), Seq("v2", "v3", "E2")))
    assert(t5 == vals(
      "MATCH (a)-[e]->(b) RETURN a.v, b.v, TYPE(e) ORDER BY a.v, b.v",
      "a.v", "b.v", "TYPE(e)"))
    // test06 optional expand-into with a new reltype filter
    assert(vals(
      """MATCH (a)-[]->(b) OPTIONAL MATCH (a)-[e:E2]->(b)
        |RETURN a.v, b.v, TYPE(e) ORDER BY a.v, b.v""".stripMargin,
      "a.v", "b.v", "TYPE(e)") ==
      Seq(Seq("v1", "v2", null), Seq("v2", "v3", "E2")))
    // test07 optional expand-into over a cartesian product
    assert(vals(
      """MATCH (a {v: 'v1'}), (b) OPTIONAL MATCH (a)-[e]->(b)
        |RETURN a.v, b.v, TYPE(e) ORDER BY a.v, b.v""".stripMargin,
      "a.v", "b.v", "TYPE(e)") ==
      Seq(Seq("v1", "v1", null), Seq("v1", "v2", "E1"),
        Seq("v1", "v3", null), Seq("v1", "v4", null)))
    // test09-11 optional variable-length
    assert(vals(
      "MATCH (a) OPTIONAL MATCH (a)-[*]->(b) RETURN a.v, b.v ORDER BY a.v, b.v",
      "a.v", "b.v") == Seq(Seq("v1", "v2"), Seq("v1", "v3"),
        Seq("v2", "v3"), Seq("v3", null), Seq("v4", null)))
    assert(vals(
      """MATCH (a {v: 'v1'}) OPTIONAL MATCH (a)-[*]->(b)
        |RETURN a.v, b.v ORDER BY a.v, b.v""".stripMargin, "a.v", "b.v") ==
      Seq(Seq("v1", "v2"), Seq("v1", "v3")))
    assert(vals(
      """MATCH (a {v: 'v3'}) OPTIONAL MATCH (a)-[*]->(b)
        |RETURN a.v, b.v ORDER BY a.v, b.v""".stripMargin, "a.v", "b.v") ==
      Seq(Seq("v3", null)))
    // test12-14 interdependent optional chains
    assert(vals(
      """MATCH (a) OPTIONAL MATCH (a)-[]->(b) OPTIONAL MATCH (b)-[]->(c)
        |RETURN a.v, b.v, c.v ORDER BY a.v, b.v, c.v""".stripMargin,
      "a.v", "b.v", "c.v") ==
      Seq(Seq("v1", "v2", "v3"), Seq("v2", "v3", null),
        Seq("v3", null, null), Seq("v4", null, null)))
    assert(vals(
      """MATCH (a) OPTIONAL MATCH (a)-[]-(b) OPTIONAL MATCH (b)-[]->(c)
        |RETURN a.v, b.v, c.v ORDER BY a.v, b.v, c.v""".stripMargin,
      "a.v", "b.v", "c.v") ==
      Seq(Seq("v1", "v2", "v3"), Seq("v2", "v1", "v2"),
        Seq("v2", "v3", null), Seq("v3", "v2", "v3"),
        Seq("v4", null, null)))
    assert(vals(
      """MATCH (a) OPTIONAL MATCH (a)-[]-(b) OPTIONAL MATCH (b)-[]-(c)
        |RETURN a.v, b.v, c.v ORDER BY a.v, b.v, c.v""".stripMargin,
      "a.v", "b.v", "c.v") ==
      Seq(Seq("v1", "v2", "v1"), Seq("v1", "v2", "v3"),
        Seq("v2", "v1", "v2"), Seq("v2", "v3", "v2"),
        Seq("v3", "v2", "v1"), Seq("v3", "v2", "v3"),
        Seq("v4", null, null)))
    // test15 optional named path
    assert(vals(
      """MATCH (a) OPTIONAL MATCH p = (a)-[]->(b)
        |RETURN length(p) ORDER BY length(p)""".stripMargin, "length(p)")
      .flatten == Seq(1L, 1L, null, null))
    // test16 nulls in the first records
    val t16 = rows("fp_om",
      """MATCH (a) OPTIONAL MATCH (a)-[e]->(b)
        |RETURN a, b, TYPE(e) ORDER BY EXISTS(b), a.v, b.v""".stripMargin)
    def nodeV(x: Any): Any = x match {
      case null => null
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]("props")
        .asInstanceOf[Map[String, Any]]("v")
    }
    assert(t16.map(r => (nodeV(r("a")), nodeV(r("b")), r("TYPE(e)"))) ==
      Seq(("v3", null, null), ("v4", null, null),
        ("v1", "v2", "E1"), ("v2", "v3", "E2")))
    // test17 label introductions inside the optional
    assert(vals(
      """MATCH (a) OPTIONAL MATCH (a:L)-[]->(b:L)
        |RETURN a.v, b.v ORDER BY a.v, b.v""".stripMargin, "a.v", "b.v") ==
      Seq(Seq("v1", "v2"), Seq("v2", "v3"), Seq("v3", null),
        Seq("v4", null)))
    // test18 bound-bound optional renders Expand Into
    assert(plan("fp_om",
      "MATCH (a)-[]->(b)-[]->(c) OPTIONAL MATCH (b)-[]->(c) RETURN a")
      .contains("Expand Into"))
    // test19 filters with a leading plain MATCH
    assert(vals("MATCH (n) WHERE n.v = 'v1' RETURN n.v", "n.v") ==
      Seq(Seq("v1")))
    // test20 path filters on optional clauses
    assert(vals(
      """MATCH (n {v: 'v1'}) OPTIONAL MATCH (m:L)-[]->() WHERE (n)--()
        |RETURN n.v, m.v ORDER BY n.v, m.v""".stripMargin, "n.v", "m.v") ==
      Seq(Seq("v1", "v1"), Seq("v1", "v2")))
    assert(vals(
      """MATCH (n) OPTIONAL MATCH (m {v:'v1'})--() WHERE (n)--()
        |RETURN n.v, m.v ORDER BY n.v, m.v""".stripMargin, "n.v", "m.v") ==
      Seq(Seq("v1", "v1"), Seq("v2", "v1"), Seq("v3", "v1"),
        Seq("v4", null)))
    // test21 filters without variable references
    assert(rows("fp_om",
      """OPTIONAL MATCH (a {v: 'v1'}), (b {v: 'v2'}) WHERE false
        |RETURN a, b""".stripMargin)
      .map(r => (r("a"), r("b"))) == Seq((null, null)))
    assert(vals(
      """OPTIONAL MATCH (a {v: 'v1'}), (b {v: 'v2'}) WHERE true
        |RETURN a.v, b.v""".stripMargin, "a.v", "b.v") ==
      Seq(Seq("v1", "v2")))
  }

  // ── test_with_clause.py ────────────────────────────────────────────────
  test("with clause: scalars, arithmetic, aggregates, filters and scopes") {
    val values = Seq("'str1'", "'str2'", "false", "true", "5", "10.5")
    g.query("fp_wc", values.zipWithIndex.flatMap { case (v, i) =>
      Seq(s"(s$i:label_a {a_val: $v, a_idx: $i})",
        s"(d$i:label_b {b_val: $v, b_idx: $i})",
        s"(s$i)-[:connects {edgeval: $i}]->(d$i)")
    }.mkString("CREATE ", ", ", ""))
    def col(q: String, c: String): Seq[Any] = rows("fp_wc", q).map(_(c))
    // test01: projected scalars, global sort order strings<bools<numbers
    assert(col(
      "MATCH (a:label_a) WITH a.a_val AS val RETURN val ORDER BY val",
      "val") == Seq("str1", "str2", false, true, 5L, 10.5d))
    assert(col(
      """MATCH (a:label_a) WITH a.a_val AS val ORDER BY val
        |SKIP 1 LIMIT 1 RETURN val""".stripMargin, "val") == Seq("str2"))
    assert(col(
      """MERGE (a:label_a {a_val: 5}) WITH a.a_val AS val ORDER BY val
        |RETURN val""".stripMargin, "val") == Seq(5L))
    assert(col(
      """MERGE ()-[e:connects {edgeval: 5}]->() WITH e.edgeval AS val
        |RETURN val""".stripMargin, "val") == Seq(5L))
    // test02: arithmetic over ids (12 nodes, 6 edges, allocated from 0)
    assert(col("MATCH (a) WITH ID(a) AS id RETURN id ORDER BY id", "id") ==
      (0L until 12L))
    assert(col("MATCH ()-[e]->() WITH ID(e) AS id RETURN id ORDER BY id",
      "id") == (0L until 6L))
    assert(col(
      """MATCH (a)-[]->(b) WHERE a.a_val > 0 AND b.b_val > 0
        |WITH a.a_val * 2 + b.b_val AS val ORDER BY val RETURN val"""
        .stripMargin, "val") == Seq(15L, 31.5d))
    // test03: aggregates inside WITH
    assert(rows("fp_wc",
      """MATCH (a)-[e]->() WITH COUNT(a.a_val) AS count_res,
        |SUM(ID(e)) AS sum_res RETURN count_res, sum_res""".stripMargin)
      .map(r => (r("count_res"), r("sum_res"))) == Seq((6L, 15L)))
    // test04: UNWIND through WITH chains
    assert(col("UNWIND [1, 2, 3] AS x WITH x AS y RETURN y", "y") ==
      Seq(1L, 2L, 3L))
    assert(col("UNWIND [1, 2, 3] AS x WITH x * 2 AS y RETURN y", "y") ==
      Seq(2L, 4L, 6L))
    assert(col(
      "UNWIND [1, 2, 3] AS x WITH x * 2 AS y WITH y * 2 AS z RETURN z",
      "z") == Seq(4L, 8L, 12L))
    assert(col(
      """UNWIND [1, 2, 3] AS x WITH x * 2 AS y WITH y * 2 AS z
        |WITH MIN(z) as min RETURN min""".stripMargin, "min") == Seq(4L))
    // test05: CREATE feeding WITH
    assert(col(
      "CREATE (c:c_label {c_val: 25}) WITH c AS c RETURN c.c_val AS val",
      "val") == Seq(25L))
    val s5 = rows("fp_wc",
      "UNWIND [5] AS a WITH a AS b CREATE (:unwind_label {prop: 'some_constant'})")
      .head
    assert(s5("nodes_created") == 1L && s5("properties_set") == 1L)
    assert(col("MATCH (a:unwind_label) RETURN a.prop", "a.prop") ==
      Seq("some_constant"))
    // test06: SET feeding WITH
    assert(col(
      "MATCH (c:c_label) SET c.c_val = 50 WITH c.c_val AS val RETURN val",
      "val") == Seq(50L))
    // test07: RETURN * lists user aliases alphabetically
    val df7 = g.query("fp_wc",
      """MATCH (a)-[e]->(b) WITH a, e, b.b_val AS b_val
        |ORDER BY a.a_val LIMIT 2 RETURN *""".stripMargin)
    assert(df7.columns.toSeq == Seq("a", "b_val", "e"))
    assert(df7.count() == 2)
    // test08: filters over computed projections.
    // DIVERGENCE (kept): the reference divides ints as floats
    // (value.c SIValue_Divide "Always perform floating-point division"),
    // so ceil(x/2) > floor(x/2) holds for odd x → 5. openCypher/TCK pin
    // integer division (Mathematical8 [1] expects the INTEGER 1 from
    // 12/4*3-2*4; Return6 [4], @skip upstream because the reference
    // fails it, expects count(n)/60/60 = 2) — our engine follows TCK, so
    // x/2 is integral and the filter never passes
    assert(rows("fp_wc",
      """unwind(range(0, 10)) as x with x as x
        |where ceil(x/2) > floor(x/2) return count(x)""".stripMargin)
      .head("count(x)") == 0L)
    assert(rows("fp_wc",
      """unwind(range(0, 10)) as x with x as x
        |where ceil(x/2.0) > floor(x/2.0) return count(x)""".stripMargin)
      .head("count(x)") == 5L) // the float-division form behaves alike
    // test09: filter on the projected alias and on the pre-alias name
    assert(col("UNWIND [1,2,3] AS a WITH a WHERE a = 2 RETURN a", "a") ==
      Seq(2L))
    assert(col("UNWIND [1,2,3] AS a WITH a AS b WHERE a = 2 RETURN b",
      "b") == Seq(2L))
    // test10: filters never leak into earlier scopes
    assert(col(
      """UNWIND ['scope1'] AS a WITH a AS b UNWIND ['scope2'] AS a
        |WITH a WHERE a = 'scope1' RETURN a""".stripMargin, "a").isEmpty)
    assert(col(
      """UNWIND ['scope1'] AS a WITH a AS b UNWIND ['scope2'] AS a
        |WITH a WHERE a = 'scope2' RETURN a""".stripMargin, "a") ==
      Seq("scope2"))
    val q10 = """MATCH (a) OPTIONAL MATCH (b) WITH a, b
                |WHERE b.fakeprop = true RETURN a, b""".stripMargin
    assert(rows("fp_wc", q10).isEmpty)
    assert("(?s)Filter\\s+Apply".r.findFirstIn(plan("fp_wc", q10)).isDefined,
      plan("fp_wc", q10))
    val q10b = """UNWIND [1] AS a WITH a AS b, 'projected' AS a
                 |WHERE a = 1 RETURN a""".stripMargin
    assert(rows("fp_wc", q10b).isEmpty)
    assert("(?s)Filter\\s+Project".r.findFirstIn(plan("fp_wc", q10b))
      .isDefined, plan("fp_wc", q10b))
    val q10c = """UNWIND [1] AS a WITH a AS b, 'projected' AS a
                 |WHERE a = 'projected' RETURN a""".stripMargin
    assert(col(q10c, "a") == Seq("projected"))
    assert("(?s)Filter\\s+Project".r.findFirstIn(plan("fp_wc", q10c))
      .isDefined)
  }

  // ── test_distinct.py ───────────────────────────────────────────────────
  test("distinct: plan omission under aggregation, issue-395, unions") {
    // testReturnDistinctFlow2's single-statement graph (Flow1 builds the
    // same shape statement by statement — covered by the same assertions)
    g.query("fp_di",
      """CREATE (s:PARENT {name: 'Stevie'}), (m:PARENT {name: 'Mike'}),
        |(j:PARENT {name: 'James'}), (r:PARENT {name: 'Rich'}),
        |(s)-[:HAS]->(:CHILD {name: 'child1'}),
        |(s)-[:HAS]->(:CHILD {name: 'child2'}),
        |(s)-[:HAS]->(:CHILD {name: 'child3'}),
        |(m)-[:HAS]->(:CHILD {name: 'child4'}),
        |(j)-[:HAS]->(:CHILD {name: 'child5'}),
        |(j)-[:HAS]->(:CHILD {name: 'child6'})""".stripMargin)
    // distinct stays for plain projections, drops under aggregation
    assert(plan("fp_di", "MATCH (n) RETURN DISTINCT n.name, n.age")
      .contains("Distinct"))
    assert(!plan("fp_di", "MATCH (n) RETURN DISTINCT n.name, max(n.age)")
      .contains("Distinct"))
    def names(q: String): Seq[Any] = rows("fp_di", q).map(_("p.name"))
    val base = "MATCH (p:PARENT)-[:HAS]->(:CHILD) RETURN p.name"
    val dBase = "MATCH (p:PARENT)-[:HAS]->(:CHILD) RETURN DISTINCT p.name"
    // unordered forms: multiset equality (the reference asserts its scan
    // order; ours is not specified without ORDER BY)
    assert(names(base).groupBy(identity).view.mapValues(_.size).toMap ==
      Map("Stevie" -> 3, "Mike" -> 1, "James" -> 2))
    assert(names(base + " ORDER BY p.name") ==
      Seq("James", "James", "Mike", "Stevie", "Stevie", "Stevie"))
    assert(names(base + " LIMIT 2").size == 2)
    assert(names(base + " ORDER BY p.name DESC LIMIT 2") ==
      Seq("Stevie", "Stevie"))
    assert(names(dBase).toSet == Set("Stevie", "Mike", "James"))
    assert(names(dBase + " ORDER BY p.name DESC") ==
      Seq("Stevie", "Mike", "James"))
    val ld = names(dBase + " LIMIT 2")
    assert(ld.size == 2 && ld.distinct.size == 2 &&
      ld.forall(Set("Stevie", "Mike", "James")))
    assert(names(dBase + " ORDER BY p.name DESC LIMIT 2") ==
      Seq("Stevie", "Mike"))
    // testDistinct (a)-[:know]->(b) x2, (a)-[:know]->(c)
    g.query("fp_di3",
      "CREATE (a), (b), (c), (a)-[:know]->(b), (a)-[:know]->(b), (a)-[:know]->(c)")
    assert(rows("fp_di3",
      """UNWIND [1, 2, 2, "a", "a", null] as x RETURN count(distinct x)""")
      .head("count(distinct x)") == 3L)
    assert(rows("fp_di3", "MATCH (a)-[]->(x) RETURN count(distinct x)")
      .head("count(distinct x)") == 2L)
    assert(rows("fp_di3",
      "UNWIND ['a', 'a', null, 1, 2, 2, 3, 3, 3] AS x RETURN collect(distinct x)")
      .head("collect(distinct x)") == List("a", 1L, 2L, 3L))
    assert(rows("fp_di3",
      """MATCH p1 = ()-[]->(), p2 = ()-[]->() UNWIND [p1, p2] AS a
        |RETURN DISTINCT a""".stripMargin).size == 3)
    assert(rows("fp_di3", "UNWIND [null, null, null] AS x RETURN DISTINCT x")
      .map(_("x")) == Seq(null))
    // UNION implicit distinct over aggregate combinations
    Seq(
      "MATCH (n) WITH n AS n RETURN 1 UNION MATCH (n), (z) WHERE ID(n) = ID(z) RETURN 1" -> "1",
      "MATCH (n) WITH n AS n RETURN max(1) AS one UNION MATCH (n), (z) WHERE ID(n) = ID(z) RETURN 1 AS one" -> "one",
      "MATCH (n) WITH n AS n RETURN 1 AS one UNION MATCH (n), (z) WHERE ID(n) = ID(z) RETURN max(1) AS one" -> "one",
      "MATCH (n) WITH n AS n RETURN max(1) AS one UNION MATCH (n), (z) WHERE ID(n) = ID(z) RETURN min(1) AS one" -> "one")
      .foreach { case (q, c) =>
        assert(rows("fp_di3", q).map(_(c)) == Seq(1L), q)
      }
    assert(rows("fp_di3",
      """MATCH (n) WITH n AS n RETURN 2 as key, max(1) AS one UNION
        |MATCH (n), (z) WHERE ID(n) = ID(z) RETURN 2 as key, min(1) AS one"""
        .stripMargin).map(r => (r("key"), r("one"))) == Seq((2L, 1L)))
  }

  // ── test_results.py ────────────────────────────────────────────────────
  test("results: headers, entity returns, agg defaults, RESULTSET_SIZE") {
    val people = Seq("Roi", "Alon", "Ailon", "Boaz")
    g.query("fp_rs", people.zipWithIndex
      .map { case (p, i) => s"(:person {name:'$p', val:$i})" }
      .mkString("CREATE ", ", ", ""))
    g.query("fp_rs",
      """MATCH (a), (b) WHERE a.name <> b.name
        |CREATE (a)-[:know]->(b)""".stripMargin)
    // test01 scalars + header
    val df1 = g.query("fp_rs",
      "MATCH (a) RETURN a.name, a.val ORDER BY a.val")
    assert(df1.columns.length == 2)
    assert(sess.rows(df1).map(r => (r("a.name"), r("a.val"))) ==
      Seq(("Roi", 0L), ("Alon", 1L), ("Ailon", 2L), ("Boaz", 3L)))
    // test02-04 entity returns
    assert(g.query("fp_rs", "MATCH (a) RETURN a").count() == 4)
    assert(g.query("fp_rs", "MATCH ()-[e]->() RETURN e").count() == 12)
    val df4 = g.query("fp_rs",
      "MATCH (a)-[e]->() RETURN a.name, a, e ORDER BY a.val")
    assert(df4.count() == 12 && df4.columns.length == 3)
    // test05 distinct full entities
    val s5 = rows("fp_rs2", "CREATE (a)-[:e]->(), (a)-[:e]->()").head
    assert(s5("nodes_created") == 3L && s5("relationships_created") == 2L)
    assert(rows("fp_rs2", "MATCH (a)-[]->() RETURN a").size == 2)
    assert(rows("fp_rs2", "MATCH (a)-[]->() RETURN DISTINCT a").size == 1)
    // test06 RETURN * alphabetical aliases
    val df6 = g.query("fp_rs", "MATCH (a)-[e]->(b) RETURN *")
    assert(df6.columns.toSeq == Seq("a", "b", "e"))
    // test07 aggregate defaults over an absent property
    def agg1(expr: String): Any =
      rows("fp_rs", s"MATCH (a) RETURN $expr").head(expr)
    assert(agg1("max(a.missing_field)") == null)
    assert(agg1("min(a.missing_field)") == null)
    assert(agg1("count(a.missing_field)") == 0L)
    assert(agg1("avg(a.missing_field)") == 0.0d)
    assert(agg1("stDev(a.missing_field)") == 0.0d)
    assert(agg1("collect(a.missing_field)") == List())
    assert(agg1("percentileCont(a.missing_field, 0.1)") == null)
    assert(agg1("percentileDisc(a.missing_field, 0.1)") == null)
    // test08 duplicate expressions and duplicate aliases
    Seq("MATCH (a) RETURN max(a.val), max(a.val)",
      "MATCH (a) return max(a.val) as x, max(a.val) as x",
      "MATCH (a) RETURN a.val, a.val LIMIT 1",
      "MATCH (a) return a.val as x, a.val as x LIMIT 1").foreach { q =>
      val row = g.query("fp_rs", q).collect().head
      assert(row.get(0) == row.get(1), q)
    }
    // test09 implicit RESULTSET_SIZE limit
    val full = g.query("fp_rs", "MATCH (a) RETURN a").count()
    assert(full > 1)
    g.configSet("RESULTSET_SIZE", full - 1)
    try assert(g.query("fp_rs", "MATCH (a) RETURN a").count() == full - 1)
    finally g.configSet("RESULTSET_SIZE", -1L)
    assert(g.query("fp_rs", "MATCH (a) RETURN a").count() == full)
  }

  // ── test_list.py ───────────────────────────────────────────────────────
  test("list: GRAPH.LIST lifecycle and null-input list functions") {
    // testGraphList over a dedicated Graft instance (GRAPH.EXPLAIN
    // creates the key; string keys are out of scope — no shared keyspace)
    val g2 = new Graft(spark)
    assert(g2.list == Seq())
    g2.explain("G", "RETURN 1")
    assert(g2.list == Seq("G"))
    g2.explain("X", "RETURN 1")
    assert(g2.list == Seq("G", "X"))
    g2.delete("G")
    assert(g2.list == Seq("X"))
    g2.delete("X")
    assert(g2.list == Seq())
    // testList
    g.query("fp_li", (1 to 10).map(_ => "()").mkString("CREATE ", ", ", ""))
    val collected = rows("fp_li", "MATCH (n) RETURN collect(n)")
    assert(collected.size == 1)
    assert(collected.head("collect(n)").asInstanceOf[List[_]].size == 10)
    assert(rows("fp_li", "unwind(range(0,10)) as x return x").map(_("x")) ==
      (0L to 10L))
    // null-input list functions → null
    Seq("WITH NULL as list RETURN list[0]",
      "WITH NULL as list RETURN list[0..5]",
      "WITH NULL as list RETURN head(list)",
      "WITH NULL as list RETURN tail(list)",
      "WITH NULL as list RETURN 'val' in list",
      "WITH NULL as list RETURN size(list)",
      "WITH ['a'] as list RETURN list[NULL]",
      "RETURN NULL in ['val']",
      "WITH ['a'] as list RETURN list[0..NULL]").foreach { q =>
      val r = rows("fp_li", q)
      assert(r.size == 1 && r.head.values.head == null, q)
    }
    intercept[Exception](rows("fp_li", "RETURN range(NULL, 5)"))
    assert(rows("fp_li", "RETURN NULL in []").head.values.head == false)
  }

  // ── test_map.py ────────────────────────────────────────────────────────
  test("map: accesses, projections, nesting, order, comparison, distinct") {
    g.query("fp_ma",
      "CREATE (:L {val:1})-[:E]->(:L {val:2})-[:E]->(:L {val:3})")
    def one(q: String): Any = rows("fp_ma", q).head.values.head
    // test01 basic accesses
    assert(one("WITH {val: 5} AS map RETURN map") == Map("val" -> 5L))
    assert(one("WITH {val: 5} AS map RETURN map.val") == 5L)
    assert(one("WITH {val: 5} AS map RETURN map['val']") == 5L)
    // test02 map projections
    assert(rows("fp_ma", "MATCH (a) RETURN a {.val} ORDER BY a.val")
      .map(_.values.head) == Seq(Map("val" -> 1L), Map("val" -> 2L),
        Map("val" -> 3L)))
    assert(rows("fp_ma",
      """WITH 'lit' AS literal MATCH (a) RETURN a {.val, literal}
        |ORDER BY a.val""".stripMargin).map(_.values.head) ==
      Seq(Map("val" -> 1L, "literal" -> "lit"),
        Map("val" -> 2L, "literal" -> "lit"),
        Map("val" -> 3L, "literal" -> "lit")))
    // test03 nested maps
    assert(one(
      "WITH {val: 5, nested: {nested_val: 'nested_str'}} AS map RETURN map")
      == Map("val" -> 5L, "nested" -> Map("nested_val" -> "nested_str")))
    assert(one(
      """WITH {val: 5, nested: {nested_val: 'nested_str'}} AS map
        |RETURN map.nested""".stripMargin)
      == Map("nested_val" -> "nested_str"))
    assert(one(
      """WITH {val: 5, nested: {nested_val: 'nested_str'}} AS map
        |RETURN map.val + '_' + map.nested.nested_val""".stripMargin)
      == "5_nested_str")
    assert(one(
      "RETURN {a: {b: {c: {d: {e: {f: {g: {h: {i: {j: {}}}}}}}}}}}") ==
      Map("a" -> Map("b" -> Map("c" -> Map("d" -> Map("e" -> Map("f" ->
        Map("g" -> Map("h" -> Map("i" -> Map("j" -> Map())))))))))))
    // test04 map sorting: keys first, then values
    assert(rows("fp_ma", "UNWIND[{b: 1}, {a: 2}] AS map RETURN map ORDER BY map")
      .map(_.values.head) == Seq(Map("a" -> 2L), Map("b" -> 1L)))
    assert(rows("fp_ma", "UNWIND[{a: 2}, {a: 1}] AS map RETURN map ORDER BY map")
      .map(_.values.head) == Seq(Map("a" -> 1L), Map("a" -> 2L)))
    assert(rows("fp_ma",
      "UNWIND[{a: 2}, {x: 1, k: 2}] AS map RETURN map ORDER BY map")
      .map(_.values.head) ==
      Seq(Map("a" -> 2L), Map("x" -> 1L, "k" -> 2L)))
    // test05 map comparison: keys first, then values; order-insensitive =
    assert(rows("fp_ma",
      """WITH {b: 2} AS map_1, {a: 1} AS map_2
        |RETURN map_1 > map_2, map_1 < map_2, map_1 = map_2, map_1 <> map_2"""
        .stripMargin).head.values.toSet == Set(true, false))
    def cmp4(q: String): Seq[Any] = {
      val r = rows("fp_ma", q).head
      val df = g.query("fp_ma", q)
      df.columns.toSeq.map(r(_))
    }
    assert(cmp4(
      """WITH {b: 2} AS map_1, {a: 1} AS map_2
        |RETURN map_1 > map_2, map_1 < map_2, map_1 = map_2, map_1 <> map_2"""
        .stripMargin) == Seq(true, false, false, true))
    assert(cmp4(
      """WITH {a: 2} AS map_1, {a: 1} AS map_2
        |RETURN map_1 > map_2, map_1 < map_2, map_1 = map_2, map_1 <> map_2"""
        .stripMargin) == Seq(true, false, false, true))
    assert(cmp4(
      """WITH {a: 1, b: 2} AS map_1, {b: 2, a: 1} AS map_2
        |RETURN map_1 > map_2, map_1 < map_2, map_1 = map_2, map_1 <> map_2"""
        .stripMargin) == Seq(false, false, true, false))
    // test05b distinct is key-order-insensitive
    assert(rows("fp_ma",
      """UNWIND[{b: 2, a: 1}, {b: 2, a: 1}, {a: 1, b: 2}] AS map
        |RETURN DISTINCT map""".stripMargin).map(_.values.head) ==
      Seq(Map("a" -> 1L, "b" -> 2L)))
    // test06/07 invalid lookups error
    intercept[Exception](rows("fp_ma", "WITH {val: 5} AS map RETURN map[0]"))
    intercept[Exception](rows("fp_ma", "RETURN 5 {v: 'b'}"))
  }
}
