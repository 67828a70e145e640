package graft

import graft.cypher.CypherSession
import graft.graph.GraphCsv
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** CSV bulk ingestion (reference bulk-loader / demo-fixture shape:
  * FIXTURES.md §1 — actor/movie node CSVs + an act edge CSV keyed on
  * names/titles) ingested into a queryable property graph.
  */
class GraphCsvSpec extends AnyFunSuite {
  import SparkTestSession._

  private def write(name: String, lines: String*): String = {
    val d = Files.createTempDirectory("graftcsv")
    val f = d.resolve(name)
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("IMDB-shaped CSVs become a Cypher-queryable graph") {
    val actors = write("actors.csv",
      "name,birth_year",
      "Ada Actor,1980",
      "Bob Builder,1975",
      "Cee Star,1990")
    val movies = write("movies.csv",
      "title,genre,votes,rating,year",
      "Graph Wars,Action,1000,8.5,2020",
      "Spark of Life,Drama,500,7.0,2021")
    val act = write("act.csv",
      "actor,movie",
      "Ada Actor,Graph Wars",
      "Bob Builder,Graph Wars",
      "Bob Builder,Spark of Life")

    val g = GraphCsv.fromCsv(spark,
      Seq(GraphCsv.NodeCsv(actors, "actor", "name"),
        GraphCsv.NodeCsv(movies, "movie", "title")),
      Seq(GraphCsv.EdgeCsv(act, "act", "actor", "actor", "movie", "movie")))

    assert(g.nodes.count() == 5)
    assert(g.edges.count() == 3)

    val s = new CypherSession(spark)
    s.setGraph(g)
    // the imdb flagship query shape (SURVEY §7.2)
    val r = s.rows(s.run(
      """MATCH (a:actor)-[:act]->(m:movie {title: 'Graph Wars'})
        |RETURN a.name AS name ORDER BY name""".stripMargin))
    assert(r.map(_("name")) == Seq("Ada Actor", "Bob Builder"))
    // properties keep their CSV types (int year, double rating)
    val r2 = s.rows(s.run(
      """MATCH (m:movie) WHERE m.rating > 8 RETURN m.year AS y""".stripMargin))
    assert(r2 == Seq(Map("y" -> 2020L)))
    // per-actor out-degree through OPTIONAL MATCH
    val r3 = s.rows(s.run(
      """MATCH (a:actor) OPTIONAL MATCH (a)-[:act]->(m:movie)
        |RETURN a.name AS name, count(m) AS n ORDER BY name""".stripMargin))
    assert(r3.map(m => (m("name"), m("n"))) ==
      Seq(("Ada Actor", 1L), ("Bob Builder", 2L), ("Cee Star", 0L)))
  }

  test("integer-keyed endpoint resolution and edge properties") {
    val users = write("users.csv",
      "uid,name", "2,bee", "1,aye", "3,sea")
    val follows = write("follows.csv",
      "from,to,w", "1,2,10", "2,3,20", "3,1,30")
    val g = GraphCsv.fromCsv(spark,
      Seq(GraphCsv.NodeCsv(users, "user", "uid")),
      Seq(GraphCsv.EdgeCsv(follows, "follows", "user", "from", "user", "to")))
    val s = new CypherSession(spark)
    s.setGraph(g)
    val r = s.rows(s.run(
      """MATCH (a:user)-[f:follows]->(b:user)
        |RETURN a.name AS an, b.name AS bn, f.w AS w ORDER BY w""".stripMargin))
    assert(r.map(m => (m("an"), m("bn"), m("w"))) ==
      Seq(("aye", "bee", 10L), ("bee", "sea", 20L), ("sea", "aye", 30L)))
  }

  test("dangling endpoint refs and duplicate keys are load-time errors") {
    val users = write("u.csv", "uid,name", "1,aye", "2,bee")
    val bad = write("f.csv", "from,to", "1,99")
    val e1 = intercept[IllegalArgumentException] {
      GraphCsv.fromCsv(spark,
        Seq(GraphCsv.NodeCsv(users, "user", "uid")),
        Seq(GraphCsv.EdgeCsv(bad, "follows", "user", "from", "user", "to")))
    }
    assert(e1.getMessage.contains("missing"))
    val dup = write("d.csv", "uid,name", "1,aye", "1,bee")
    val e2 = intercept[IllegalArgumentException] {
      GraphCsv.fromCsv(spark,
        Seq(GraphCsv.NodeCsv(dup, "user", "uid")), Seq.empty)
    }
    assert(e2.getMessage.contains("duplicate"))
  }
}
