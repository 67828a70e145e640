package graft

import graft.cypher.{CypherSession, Graft}
import org.scalatest.funsuite.AnyFunSuite

/** Seventh tranche: `tests/flow/test_index_updates.py` (write-through
  * index consistency) and `tests/flow/test_cache.py` (cached plans with
  * fresh parameters) ported per section. The reference exposes a
  * `cached_execution` flag; here the cache-correctness contract is the
  * testable half — the SAME query text re-run with different parameters
  * (served by the AST/plan caches) must produce the new parameters'
  * results and an identical plan rendering.
  */
class FlowParity7Spec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val g = new Graft(spark)
  private lazy val sess = new CypherSession(spark)

  private def rows(gid: String, q: String,
      params: Map[String, Any] = Map.empty): Seq[Map[String, Any]] =
    sess.rows(g.query(gid, q, params))
  private def col1(gid: String, q: String,
      params: Map[String, Any] = Map.empty): Seq[Any] =
    rows(gid, q, params).map(_.values.head)

  // ── test_index_updates.py ──────────────────────────────────────────────
  test("index updates: indexes stay consistent through writes") {
    val gid = "fp_iu"
    val rnd = new scala.util.Random(7)
    // 200 deterministic nodes: label_a gets even `unique`, label_b odd
    val creates = (0 until 200).map { i =>
      val label = if (i % 2 == 0) "label_a" else "label_b"
      val group = if (rnd.nextBoolean()) "Group A" else "Group B"
      val dv = math.round(rnd.nextDouble() * 200 - 100) / 100.0
      val iv = rnd.nextInt(10000) + 1
      s"(:$label {unique: $i, group: '$group', doubleval: $dv, intval: $iv})"
    }
    g.query(gid, creates.mkString("CREATE ", ", ", ""))
    Seq("unique", "group", "doubleval", "intval").foreach { f =>
      g.query(gid, s"CREATE INDEX ON :label_a($f)")
      g.query(gid, s"CREATE INDEX ON :label_b($f)")
    }
    def validate(): Unit = {
      // unique parity invariant
      assert(col1(gid, "MATCH (a:label_a) RETURN a.unique")
        .forall(_.asInstanceOf[Long] % 2 == 0))
      assert(col1(gid, "MATCH (b:label_b) RETURN b.unique")
        .forall(_.asInstanceOf[Long] % 2 == 1))
      Seq("label_a", "label_b").foreach { l =>
        // index-scan plans...
        val q = s"MATCH (a:$l) WHERE a.intval > 0 " +
          "RETURN a.intval AS v ORDER BY a.intval"
        assert(g.explainOps(gid, q).contains("Index Scan"))
        // ...return exactly the label-scan results
        assert(col1(gid, q) == col1(gid,
          s"MATCH (a:$l) RETURN a.intval AS v ORDER BY a.intval"))
        val qd = s"MATCH (a:$l) WHERE a.doubleval < 100 " +
          "RETURN a.doubleval AS v ORDER BY a.doubleval"
        assert(g.explainOps(gid, qd).contains("Index Scan"))
        assert(col1(gid, qd) == col1(gid,
          s"MATCH (a:$l) RETURN a.doubleval AS v ORDER BY a.doubleval"))
      }
    }
    validate()
    // test01: full property update touches every node in two indexes
    val s1 = rows(gid, "MATCH (a) SET a.doubleval = a.doubleval + 0.37")
    assert(s1.head("properties_set") == 200L, s1.toString)
    validate()
    // test02: partial update over an index-served predicate
    rows(gid, "MATCH (a) WHERE a.doubleval > 0 " +
      "SET a.doubleval = a.doubleval + 0.11")
    validate()
    // test03: creation joins the index
    g.query(gid, (200 until 220).map { i =>
      val label = if (i % 2 == 0) "label_a" else "label_b"
      s"(:$label {unique: $i, group: 'Group A', doubleval: 0.5, intval: 7})"
    }.mkString("CREATE ", ", ", ""))
    validate()
    // test04: deletions leave the index
    val s4 = rows(gid,
      "MATCH (a:label_a) WHERE a.group = 'Group A' DELETE a")
    assert(s4.head("nodes_deleted").asInstanceOf[Long] > 0L)
    validate()
    // test05: updating an unindexed property alongside a same-value
    // indexed one counts only the real write
    rows(gid, "MATCH (a) SET a.unindexed = 'unindexed'")
    val u = col1(gid, "MATCH (a) RETURN a.unique LIMIT 1")
      .head.asInstanceOf[Long]
    val s5 = rows(gid, s"MATCH (a {unique: $u}) " +
      s"SET a.unindexed = 5, a.unique = $u " +
      "RETURN a.unindexed AS x, a.unique AS y")
    assert(s5 == Seq(Map("x" -> 5L, "y" -> u)), s5.toString)
    // test06: a null-ed indexed property leaves the index
    val s6 = rows(gid, "CREATE (:NEW {v: 5})")
    assert(s6.head("properties_set") == 1L)
    g.query(gid, "CREATE INDEX ON :NEW(v)")
    val s6b = rows(gid, "MATCH (a:NEW {v: 5}) SET a.v = NULL")
    assert(s6b.head("properties_set") == 1L, s6b.toString)
    val q6 = "MATCH (a:NEW {v: 5}) RETURN a"
    assert(g.explainOps(gid, q6).contains("Index Scan"))
    assert(rows(gid, q6).isEmpty)
  }

  // ── test_cache.py ──────────────────────────────────────────────────────
  private def planStable(gid: String, q: String): Unit =
    assert(g.explainOps(gid, q) == g.explainOps(gid, q))

  test("cache: repeated statements with fresh params compute fresh results") {
    // test01/02: repeated CREATE, literal and parameterized
    val g1 = "fp_c1"
    planStable(g1, "CREATE ()")
    assert(rows(g1, "CREATE ()").head("nodes_created") == 1L)
    assert(rows(g1, "CREATE ()").head("nodes_created") == 1L)
    planStable(g1, "CREATE ({val:$val})")
    assert(rows(g1, "CREATE ({val:$val})", Map("val" -> 1L))
      .head("nodes_created") == 1L)
    assert(rows(g1, "CREATE ({val:$val})", Map("val" -> 2L))
      .head("nodes_created") == 1L)
    assert(col1(g1, "MATCH (n) WHERE n.val IS NOT NULL " +
      "RETURN n.val ORDER BY n.val") == Seq(1L, 2L))
    // test03: parameterized point delete through the cached plan
    val g3 = "fp_c3"
    (0 to 1).foreach(i =>
      rows(g3, "CREATE ({val:$val})-[:R]->()", Map("val" -> i.toLong)))
    planStable(g3, "MATCH (n {val:$val}) DELETE n")
    val d0 = rows(g3, "MATCH (n {val:$val}) DELETE n", Map("val" -> 0L)).head
    val d1 = rows(g3, "MATCH (n {val:$val}) DELETE n", Map("val" -> 1L)).head
    assert(d0("nodes_deleted") == d1("nodes_deleted"))
    assert(d0("relationships_deleted") == d1("relationships_deleted"))
    // test04: MERGE ON CREATE / ON MATCH through the cached plan
    val g4 = "fp_c4"
    val mq = "MERGE (n) ON CREATE SET n.val = $create_val " +
      "ON MATCH SET n.val = $match_val RETURN n.val AS v"
    planStable(g4, mq)
    val p4 = Map("create_val" -> 0L, "match_val" -> 1L)
    assert(col1(g4, mq, p4) == Seq(0L))
    assert(col1(g4, mq, p4) == Seq(1L))
    // test05: branching path filters re-parameterize
    val g5 = "fp_c5"
    rows(g5, "CREATE ({val:1})-[:R]->({val:2})-[:R2]->({val:3})")
    val bq = "MATCH (n) WHERE (n)-[:R]->({val:$val}) OR " +
      "(n)-[:R2]->({val:$val}) RETURN n.val AS v"
    planStable(g5, bq)
    assert(col1(g5, bq, Map("val" -> 2L)) == Seq(1L))
    assert(col1(g5, bq, Map("val" -> 3L)) == Seq(2L))
    // test06: index lookups re-parameterize
    val g6 = "fp_c6"
    rows(g6, "CREATE INDEX ON :N(val)")
    rows(g6, "CREATE (:N{val:1}), (:N{val:2})")
    val iq = "MATCH (n:N{val:$val}) RETURN n.val AS v"
    planStable(g6, iq)
    assert(col1(g6, iq, Map("val" -> 1L)) == Seq(1L))
    assert(col1(g6, iq, Map("val" -> 2L)) == Seq(2L))
    // test07: id scans re-parameterize
    val g7 = "fp_c7"
    rows(g7, "CREATE (), ()")
    val ids = col1(g7, "MATCH (n) RETURN id(n) AS i ORDER BY id(n)")
    val idq = "MATCH (n) WHERE ID(n)=$id RETURN id(n) AS i"
    planStable(g7, idq)
    assert(col1(g7, idq, Map("id" -> ids.head)) == Seq(ids.head))
    assert(col1(g7, idq, Map("id" -> ids(1))) == Seq(ids(1)))
    // test08: value joins re-parameterize
    val g8 = "fp_c8"
    rows(g8, "CREATE ({val:1}), ({val:2}), ({val:3}),({val:4})")
    val jq = "MATCH (a {val:$val}), (b) WHERE a.val = b.val-1 " +
      "RETURN a.val AS av, b.val AS bv"
    planStable(g8, jq)
    assert(rows(g8, jq, Map("val" -> 1L)).map(r => (r("av"), r("bv"))) ==
      Seq((1L, 2L)))
    assert(rows(g8, jq, Map("val" -> 3L)).map(r => (r("av"), r("bv"))) ==
      Seq((3L, 4L)))
    // test09: repeated edge MERGE creates once then matches
    val g9 = "fp_c9"
    rows(g9, "CREATE ({val:1}), ({val:2})")
    val eq = "MATCH (a {val:1}), (b {val:2}) MERGE (a)-[e:leads]->(b) " +
      "RETURN type(e) AS t"
    planStable(g9, eq)
    val m1 = g.query(g9, eq)
    assert(sess.rows(m1).map(_("t")) == Seq("leads"))
    val m2 = g.query(g9, eq)
    assert(sess.rows(m2).map(_("t")) == Seq("leads"))
    assert(rows(g9, "MATCH ()-[e:leads]->() RETURN count(e) AS c")
      .head("c") == 1L)
    // test10: a label scan compiled before the label existed sees it
    val g10 = "fp_c10"
    assert(rows(g10, "MATCH (n:Label) RETURN n").isEmpty)
    assert(rows(g10, "MERGE (n:Label)").head("nodes_created") == 1L)
    val r10 = rows(g10, "MATCH (n:Label) RETURN n")
    assert(r10.size == 1)
    // test11: MERGE+SET across an index created mid-stream
    val g11 = "fp_c11"
    val mq11 = "MERGE (n:Label {v: 1}) SET n.v = $v"
    val r11a = rows(g11, mq11, Map("v" -> 1L)).head
    assert(r11a("nodes_created") == 1L)
    assert(rows(g11, "CREATE INDEX ON :Label(v)")
      .head("indices_created") == 1L)
    val r11b = rows(g11, mq11, Map("v" -> 5L)).head
    assert(r11b("nodes_created") == 0L && r11b("properties_set") == 1L,
      r11b.toString)
    // test12: parameterized SKIP/LIMIT re-evaluate per execution
    val g12 = "fp_c12"
    val sq = "UNWIND [1,2,3,4] AS arr RETURN arr SKIP $s LIMIT $l"
    assert(col1(g12, sq, Map("s" -> 1L, "l" -> 1L)) == Seq(2L))
    assert(col1(g12, sq, Map("s" -> 2L, "l" -> 2L)) == Seq(3L, 4L))
  }
}
