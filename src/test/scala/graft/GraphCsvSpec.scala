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
    // integer-keyed edge resolution: degree via the edge list
    val r3 = s.rows(s.run(
      """MATCH (a:actor) OPTIONAL MATCH (a)-[:act]->(m:movie)
        |RETURN a.name AS name, count(m) AS n ORDER BY name""".stripMargin))
    assert(r3.map(m => (m("name"), m("n"))) ==
      Seq(("Ada Actor", 1L), ("Bob Builder", 2L), ("Cee Star", 0L)))
  }
}
