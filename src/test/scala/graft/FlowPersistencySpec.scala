package graft

import graft.cypher.Graft
import org.scalatest.funsuite.AnyFunSuite

/** Port of `tests/flow/test_persistency.py` with [[graft.graph.GraphStore]]
  * save/restore as the RDB dump-and-reload analogue: each scenario builds
  * a graph, saves it, restores into a FRESH Graft (new session, no shared
  * state) and re-runs the assertions. Covers deleted-entity compaction,
  * index-definition persistence, property-type round-trips, and repeated
  * (parallel) edges.
  */
class FlowPersistencySpec extends AnyFunSuite {
  import SparkTestSession._

  /** Drop any leftover `graft_<gid>_*` tables/dirs (a previous aborted
    * run can leave warehouse directories without catalog entries, which
    * fails saveAsTable with LOCATION_ALREADY_EXISTS).
    */
  private def clean(gid: String): Unit = {
    Seq("nodes", "edges", "edges_rev", "meta").foreach { t =>
      val name = s"graft_${gid}_$t"
      try spark.sql(s"DROP TABLE IF EXISTS $name")
      catch { case _: Throwable => () }
      val dir = new java.io.File(s"spark-warehouse/$name")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(dir)
      }
    }
  }

  private def reload(g: Graft, gid: String): Graft = {
    g.save(gid, buckets = 4)
    val g2 = new Graft(spark)
    g2.restore(gid)
    g2
  }

  test("01 save/load: entities, filters, edges, and indexes survive") {
    val g = new Graft(spark)
    val gid = "persist_g"
    clean(gid)
    val people = Seq("Roi", "Alon", "Ailon", "Boaz", "Tal", "Omri", "Ori")
    val countries = Seq("Israel", "USA", "Japan", "United Kingdom")
    g.query(gid, people.zipWithIndex.map { case (p, i) =>
      s"(:person {name:'$p', height:${160 + i * 5}})"
    }.mkString("CREATE ", ", ", ""))
    g.query(gid, countries.zipWithIndex.map { case (c, i) =>
      s"(:country {name:'$c', population:${100 + i * 50}})"
    }.mkString("CREATE ", ", ", ""))
    Seq("Roi" -> "USA", "Alon" -> "Israel", "Ailon" -> "Japan",
      "Boaz" -> "United Kingdom").foreach { case (p, c) =>
      g.query(gid,
        s"""MATCH (a:person {name:'$p'}), (b:country {name:'$c'})
           |CREATE (a)-[:visit {purpose:'pleasure'}]->(b)""".stripMargin)
    }
    g.query(gid,
      "MATCH (n:person) WHERE n.name = 'Roi' or n.name = 'Ailon' DELETE n")
    g.query(gid, "MATCH (n:country) WHERE n.name = 'USA' DELETE n")
    g.query(gid, "CREATE INDEX ON :person(name)")
    g.query(gid, "CREATE INDEX ON :person(height)")
    g.query(gid, "CREATE INDEX ON :country(name)")
    g.query(gid, "CREATE INDEX ON :country(population)")

    Seq(g, reload(g, gid)).foreach { gr =>
      val sess = gr.sessionFor(gid)
      def one(q: String): Any = sess.rows(gr.query(gid, q)).head("c")
      assert(one("MATCH (p:person) RETURN COUNT(p) AS c") == 5L)
      assert(one(
        "MATCH (p:person) WHERE p.name='Alon' RETURN COUNT(p) AS c") == 1L)
      assert(one("MATCH (c:country) RETURN COUNT(c) AS c") == 3L)
      assert(one(
        "MATCH (c:country) WHERE c.name = 'Israel' RETURN COUNT(c) AS c") ==
        1L)
      assert(one(
        """MATCH (n:person)-[e:visit]->(c:country)
          |WHERE e.purpose='pleasure' RETURN COUNT(e) AS c""".stripMargin) ==
        2L)
      // db.indexes(): (type, label, properties) rows, both labels present
      val idx = sess.rows(gr.query(gid,
        """CALL db.indexes() YIELD type, label, properties
          |RETURN type, label, properties ORDER BY label""".stripMargin))
      assert(idx.map(r => (r("type"), r("label"))) ==
        Seq(("exact-match", "country"), ("exact-match", "person")), idx)
      assert(idx.map(_("properties")) ==
        Seq(Seq("name", "population"), Seq("height", "name")) ||
        idx.map(_("properties")) ==
        Seq(Seq("name", "population"), Seq("name", "height")), idx)
    }
  }

  test("02 deleted entities do not disturb surviving edges across reload") {
    val g = new Graft(spark)
    val gid = "persist_h"
    clean(gid)
    g.query(gid, (0 until 10).map(i => s"(:n {val:$i})")
      .mkString("CREATE ", ", ", ""))
    g.query(gid,
      """MATCH (a:n), (b:n) WHERE b.val < a.val
        |CREATE (a)-[:connected]->(b)""".stripMargin)
    val del = g.sessionFor(gid).rows(g.query(gid,
      """MATCH (p) WHERE p.val = 0 OR p.val = 3 OR p.val = 7 OR p.val = 9
        |DELETE p""".stripMargin))
    assert(del.head("nodes_deleted") == 4L)
    val q = """MATCH (p)-[]->(q) RETURN p.val AS pv, q.val AS qv
              |ORDER BY p.val, q.val""".stripMargin
    val before = g.sessionFor(gid).rows(g.query(gid, q))
    val g2 = reload(g, gid)
    assert(g2.sessionFor(gid).rows(g2.query(gid, q)) == before)
  }

  test("03 property types round-trip: string, float, bool, array, point") {
    val g = new Graft(spark)
    val gid = "persist_props"
    clean(gid)
    val st = g.sessionFor(gid).rows(g.query(gid,
      """CREATE (:p {strval: 'str', numval: 5.5, boolval: true,
        |array: [1,2,3],
        |pointval: point({latitude: 5.5, longitude: 6})})""".stripMargin))
    assert(st.head("nodes_created") == 1L)
    assert(st.head("properties_set") == 5L)
    val q = """MATCH (p) RETURN p.boolval AS b, p.numval AS n,
              |p.strval AS s, p.array AS a""".stripMargin
    val before = g.sessionFor(gid).rows(g.query(gid, q))
    assert(before == Seq(Map("b" -> true, "n" -> 5.5,
      "s" -> "str", "a" -> Seq(1L, 2L, 3L))), before)
    val qp = """MATCH (p) RETURN p.pointval AS pt"""
    val ptBefore = g.sessionFor(gid).rows(g.query(gid, qp))
    val g2 = reload(g, gid)
    assert(g2.sessionFor(gid).rows(g2.query(gid, q)) == before)
    assert(g2.sessionFor(gid).rows(g2.query(gid, qp)) == ptBefore)
  }

  test("04 repeated edges between one (src, dest) pair survive reload") {
    val g = new Graft(spark)
    val gid = "persist_rep"
    clean(gid)
    g.query(gid, "CREATE (:p {name:'src'}), (:p {name:'dest'})")
    Seq(1, 2).foreach { v =>
      g.query(gid,
        s"""MATCH (a:p {name:'src'}), (b:p {name:'dest'})
           |CREATE (a)-[:e {val:$v}]->(b)""".stripMargin)
    }
    val q = """MATCH (a)-[e]->(b) RETURN e.val AS v, a.name AS an,
              |b.name AS bn ORDER BY e.val""".stripMargin
    val expected = Seq(
      Map("v" -> 1L, "an" -> "src", "bn" -> "dest"),
      Map("v" -> 2L, "an" -> "src", "bn" -> "dest"))
    assert(g.sessionFor(gid).rows(g.query(gid, q)) == expected)
    val g2 = reload(g, gid)
    assert(g2.sessionFor(gid).rows(g2.query(gid, q)) == expected)
  }
}
