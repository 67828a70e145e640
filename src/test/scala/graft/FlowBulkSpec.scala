package graft

import graft.cypher.CypherSession
import graft.graph.GraphCsv
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Port of `tests/flow/test_bulk_insertion.py` over the reference's social
  * bulk fixture (`demo/social/resources/bulk_formatted/`): load counts,
  * the full node/relation goldens (tests 01-03) and per-field property
  * typing over a heterogeneous column (test08). Entity IDs diverge by
  * design: the loader assigns sequential per-file ids, GraphCsv assigns
  * key-sorted ids in disjoint per-label ranges (scale contract — no
  * global counter), so the goldens here pin names/properties/topology,
  * and id assertions become disjointness/determinism checks. Tests 04-07
  * exercise loader-script internals (private identifiers, resumed
  * loaders, CLI failures) with no library analogue; test09's liveness
  * probe is a Redis-server concern.
  */
class FlowBulkSpec extends AnyFunSuite {
  import SparkTestSession._

  private val Res = "/root/reference/demo/social/resources/bulk_formatted"

  private lazy val g = {
    val pg = GraphCsv.fromCsv(spark,
      Seq(GraphCsv.NodeCsv(s"$Res/Person.csv", "Person", "name"),
        GraphCsv.NodeCsv(s"$Res/Country.csv", "Country", "name")),
      Seq(GraphCsv.EdgeCsv(s"$Res/KNOWS.csv", "KNOWS",
        "Person", "src", "Person", "dest"),
        GraphCsv.EdgeCsv(s"$Res/VISITED.csv", "VISITED",
          "Person", "src_person", "Country", "dest_country")))
    val s = new CypherSession(spark)
    s.setGraph(pg)
    s
  }

  test("01 load counts: 27 nodes, 56 relations") {
    assert(g.rows(g.run("MATCH (n) RETURN count(n) AS c")).head("c") == 27L)
    assert(g.rows(g.run("MATCH ()-[e]->() RETURN count(e) AS c"))
      .head("c") == 56L)
  }

  test("02 node labels, attributes, and population") {
    val people = g.rows(g.run(
      """MATCH (p:Person) RETURN p.name AS name, p.age AS age,
        |p.gender AS gender, p.status AS status ORDER BY p.name"""
        .stripMargin))
    assert(people.map(r => (r("name"), r("age"), r("gender"), r("status"))) ==
      Seq(("Ailon Velger", 32L, "male", "married"),
        ("Alon Fital", 32L, "male", "married"),
        ("Boaz Arad", 31L, "male", "married"),
        ("Gal Derriere", 26L, "male", "single"),
        ("Jane Chernomorin", 31L, "female", "married"),
        ("Lucy Yanfital", 30L, "female", "married"),
        ("Mor Yesharim", 31L, "female", "married"),
        ("Noam Nativ", 34L, "male", "single"),
        ("Omri Traub", 33L, "male", "single"),
        ("Ori Laslo", 32L, "male", "married"),
        ("Roi Lipman", 32L, "male", "married"),
        ("Shelly Laslo Rooz", 31L, "female", "married"),
        ("Tal Doron", 32L, "male", "single"),
        ("Valerie Abigail Arad", 31L, "female", "married")))
    val countries = g.rows(g.run(
      "MATCH (c:Country) RETURN c.name AS name ORDER BY c.name"))
    assert(countries.map(_("name")) == Seq("Andora", "Canada", "China",
      "Germany", "Greece", "Italy", "Japan", "Kazakhstan", "Netherlands",
      "Prague", "Russia", "Thailand", "USA"))
    // id contract: every id unique, Person and Country ranges disjoint
    val ids = g.rows(g.run("MATCH (n) RETURN id(n) AS i"))
      .map(_("i").asInstanceOf[Long])
    assert(ids.distinct.size == 27)
  }

  test("03 relation goldens: KNOWS and VISITED") {
    val knows = g.rows(g.run(
      """MATCH (a)-[e:KNOWS]->(b) RETURN a.name AS an, e.relation AS rel,
        |b.name AS bn ORDER BY e.relation, a.name, b.name""".stripMargin))
    assert(knows.map(r => (r("an"), r("rel"), r("bn"))) == Seq(
      ("Ailon Velger", "friend", "Noam Nativ"),
      ("Alon Fital", "friend", "Gal Derriere"),
      ("Alon Fital", "friend", "Mor Yesharim"),
      ("Boaz Arad", "friend", "Valerie Abigail Arad"),
      ("Roi Lipman", "friend", "Ailon Velger"),
      ("Roi Lipman", "friend", "Alon Fital"),
      ("Roi Lipman", "friend", "Boaz Arad"),
      ("Roi Lipman", "friend", "Omri Traub"),
      ("Roi Lipman", "friend", "Ori Laslo"),
      ("Roi Lipman", "friend", "Tal Doron"),
      ("Ailon Velger", "married", "Jane Chernomorin"),
      ("Alon Fital", "married", "Lucy Yanfital"),
      ("Ori Laslo", "married", "Shelly Laslo Rooz")))
    val visited = g.rows(g.run(
      """MATCH (a)-[e:VISITED]->(b) RETURN a.name AS an, e.purpose AS p,
        |b.name AS bn ORDER BY e.purpose, a.name, b.name""".stripMargin))
    assert(visited.length == 43)
    assert(visited.take(6).map(r => (r("an"), r("p"), r("bn"))) == Seq(
      ("Alon Fital", "business", "Prague"),
      ("Alon Fital", "business", "USA"),
      ("Boaz Arad", "business", "Netherlands"),
      ("Boaz Arad", "business", "USA"),
      ("Gal Derriere", "business", "Netherlands"),
      ("Jane Chernomorin", "business", "USA")))
    assert(visited.takeRight(3).map(r => (r("an"), r("p"), r("bn"))) == Seq(
      ("Tal Doron", "pleasure", "USA"),
      ("Valerie Abigail Arad", "pleasure", "Netherlands"),
      ("Valerie Abigail Arad", "pleasure", "Russia")))
  }

  test("08 per-field property typing over a heterogeneous column") {
    val d = Files.createTempDirectory("graftbulk")
    val nodes = d.resolve("nodes.csv")
    Files.writeString(nodes,
      "numeric,mixed,bool\n0,,true\n5,notnull,false\n7,,false")
    val rels = d.resolve("relations.csv")
    Files.writeString(rels,
      "src,dest,prop\n0,5,true\n5,7,3.5\n7,0,")
    val pg = GraphCsv.fromCsv(spark,
      Seq(GraphCsv.NodeCsv(nodes.toString, "N", "numeric")),
      Seq(GraphCsv.EdgeCsv(rels.toString, "E", "N", "src", "N", "dest")))
    val s = new CypherSession(spark)
    s.setGraph(pg)
    val rows = s.rows(s.run(
      """MATCH (a)-[e]->() RETURN a.numeric AS n, a.mixed AS m,
        |a.bool AS b, e.prop AS p ORDER BY a.numeric, e.prop"""
        .stripMargin))
    assert(rows.map(r => (r("n"), r("m"), r("b"), r("p"))) == Seq(
      (0L, null, true, true),
      (5L, "notnull", false, 3.5),
      (7L, null, false, null)), rows)
  }
}
