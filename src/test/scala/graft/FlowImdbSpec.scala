package graft

import graft.cypher.{CypherSession, Graft}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `tests/flow/test_imdb.py` over the reference's IMDB fixture
  * (`demo/imdb/resources/` CSVs, loaded with Spark's CSV reader — titles
  * contain quoted commas). Ports the queries with pinned inline expected
  * results from `demo/imdb/imdb_queries.py`, both index-scan tests, and
  * the suite's reversed-pattern re-run invariant.
  *
  * The co-actor golden (8 rows INCLUDING Nicolas Cage himself) depends on
  * the reference's anonymous-relationship reachability semantics
  * (`docs/known_limitations.md` "Relationship uniqueness in patterns"):
  * Cage has ONE `act` edge, which the reference binds to both anonymous
  * `[:act]` slots. The engine's default is openCypher relationship
  * isomorphism (TCK-pinned, returns 7); this suite opts the imdb graph
  * into the reference scope via `edgeUniquenessScope = "named"`.
  */
class FlowImdbSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val g = new Graft(spark)
  private lazy val sess = new CypherSession(spark)
  private val gid = "imdb"

  private def esc(s: String): String = s.replace("\\", "\\\\")
    .replace("'", "\\'")

  private lazy val setup: Unit = {
    g.sessionFor(gid).edgeUniquenessScope = "named"
    val res = "/root/reference/demo/imdb/resources"
    val movies = spark.read.csv(s"$res/movies.csv").collect()
    // title, genre, votes, rating, year
    movies.grouped(200).foreach { batch =>
      g.query(gid, batch.map { r =>
        s"(:movie {title:'${esc(r.getString(0))}', " +
          s"genre:'${esc(r.getString(1))}', votes:${r.getString(2)}, " +
          s"rating:${r.getString(3)}, year:${r.getString(4)}})"
      }.mkString("CREATE ", ", ", ""))
    }
    val actors = spark.read.csv(s"$res/actors.csv").collect()
    // name, yearOfBirth, movie — ages fixed at year 2019 (imdb_utils.py)
    val byName = actors.groupBy(_.getString(0))
    byName.grouped(200).foreach { batch =>
      g.query(gid, batch.map { case (n, rs) =>
        s"(:actor {name:'${esc(n)}', age:${2019 - rs.head.getString(1).toInt}})"
      }.mkString("CREATE ", ", ", ""))
    }
    actors.grouped(500).foreach { batch =>
      val pairs = batch.toList.map(r =>
        Map("a" -> r.getString(0), "m" -> r.getString(2)))
      g.query(gid,
        """UNWIND $pairs AS p
          |MATCH (a:actor {name: p.a}), (m:movie {title: p.m})
          |CREATE (a)-[:act]->(m)""".stripMargin,
        Map("pairs" -> pairs))
    }
  }

  private def rows(q: String): Seq[Map[String, Any]] = {
    setup; sess.rows(g.query(gid, q))
  }

  /** The suite's reversed-pattern invariant: flipping every pattern's
    * arrow (and endpoint order) must not change the results.
    */
  private def reversedEq(q: String, reversed: String): Unit =
    assert(rows(q) == rows(reversed), s"reversed pattern diverged: $q")

  test("imdb: actor count and co-actor patterns match pinned results") {
    assert(rows("MATCH (n:actor) RETURN count(n) as actors_count") ==
      Seq(Map("actors_count" -> 1317L)))
    val cage =
      """MATCH (n:actor{name:"Nicolas Cage"})-[:act]->(m:movie)<-[:act]-(a:actor)
        |RETURN a.name AS name, m.title AS title ORDER BY a.name"""
        .stripMargin
    assert(rows(cage).map(r => (r("name"), r("title"))) == Seq(
      ("Cassi Thomson", "Left Behind"), ("Chad Michael Murray", "Left Behind"),
      ("Gary Grubbs", "Left Behind"), ("Jordin Sparks", "Left Behind"),
      ("Lea Thompson", "Left Behind"), ("Martin Klebba", "Left Behind"),
      ("Nicolas Cage", "Left Behind"), ("Quinton Aaron", "Left Behind")))
    reversedEq(cage,
      """MATCH (a:actor)-[:act]->(m:movie)<-[:act]-(n:actor{name:"Nicolas Cage"})
        |RETURN a.name AS name, m.title AS title ORDER BY a.name"""
        .stripMargin)
    assert(rows(
      """MATCH (nicolas:actor {name:"Nicolas Cage"})-[:act]->(m:movie)<-[:act]-(a:actor)
        |RETURN a.name AS name, m.title AS title
        |ORDER BY a.name, m.title LIMIT 3""".stripMargin)
      .map(_("name")) ==
      Seq("Cassi Thomson", "Chad Michael Murray", "Gary Grubbs"))
    assert(rows(
      """MATCH (a:actor)-[:act]->(m:movie {title:"Straight Outta Compton"})
        |RETURN a.name AS name ORDER BY a.name""".stripMargin)
      .map(_("name")) ==
      Seq("Aldis Hodge", "Corey Hawkins", "Neil Brown Jr.",
        "O'Shea Jackson Jr."))
    assert(rows(
      """MATCH (m:movie) WHERE LEFT(m.title, 8) = 'American'
        |RETURN m.title AS t ORDER BY m.title""".stripMargin)
      .map(_("t")) ==
      Seq("American Honey", "American Pastoral", "American Sniper"))
  }

  test("imdb: index scans over age and year match pinned results") {
    setup
    g.query(gid, "CREATE INDEX ON :actor(age)")
    val over85 =
      """MATCH (a:actor) WHERE a.age > 85
        |RETURN a.name AS n ORDER BY a.age, a.name""".stripMargin
    assert(g.explainOps(gid, over85).contains("Index Scan"))
    assert(rows(over85).map(_("n")).toSet == Set("Michael Caine",
      "Ellen Burstyn", "Robert Duvall", "Olympia Dukakis", "Lois Smith",
      "John Cullum", "Cloris Leachman", "George Kennedy", "Vincent Price"))
    g.query(gid, "DROP INDEX ON :actor(age)")
    g.query(gid, "CREATE INDEX ON :movie(year)")
    val eighties =
      """MATCH (m:movie) WHERE 1980 <= m.year AND m.year < 1990
        |RETURN m.title AS t, m.year AS y ORDER BY m.year""".stripMargin
    assert(g.explainOps(gid, eighties).contains("Index Scan"))
    assert(rows(eighties).map(r => (r("t"), r("y"))) ==
      Seq(("The Evil Dead", 1981L), ("Vincent", 1982L)))
    g.query(gid, "DROP INDEX ON :movie(year)")
  }
}
