package graft

import graft.cypher.CypherSession
import org.scalatest.funsuite.AnyFunSuite

/** Relationship-uniqueness (edge isomorphism) semantics: Cypher forbids one
  * relationship from binding twice within a single MATCH pattern
  * (reference: `docs/known_limitations.md` relationship-uniqueness rules).
  */
class EdgeUniqSpec extends AnyFunSuite {
  import SparkTestSession._

  test("a self-loop edge cannot be reused within one MATCH pattern") {
    val s = new CypherSession(spark)
    s.run("CREATE (a:L {n:'a'}) CREATE (a)-[:T]->(a)")
    def c(q: String) = s.rows(s.run(q)).head("c")
    assert(c("MATCH (x:L)-[:T]->(y) RETURN count(*) AS c") == 1L)
    // both fixed 2-hop and *2 var-len would need the single edge twice
    assert(c("MATCH (x:L)-[:T]->(y)-[:T]->(z) RETURN count(*) AS c") == 0L)
    assert(c("MATCH (x:L)-[:T*2]->(z) RETURN count(*) AS c") == 0L)
  }

  test("'named' scope exempts anonymous edges from uniqueness (ref compat)") {
    // the reference treats an unreferenced relationship as a reachability
    // test (docs/known_limitations.md "Relationship uniqueness in
    // patterns"), so the self-loop edge CAN bind both anonymous hops;
    // naming the edges restores the isomorphism check even in this scope
    val s = new CypherSession(spark)
    s.edgeUniquenessScope = "named"
    s.run("CREATE (a:L {n:'a'}) CREATE (a)-[:T]->(a)")
    def c(q: String) = s.rows(s.run(q)).head("c")
    assert(c("MATCH (x:L)-[:T]->(y)-[:T]->(z) RETURN count(*) AS c") == 1L)
    assert(c("MATCH (x:L)-[r1:T]->(y)-[r2:T]->(z) RETURN count(*) AS c") == 0L)
  }

  test("two parallel self-loop edges give both 2-hop orderings") {
    val s = new CypherSession(spark)
    s.run("CREATE (a:L {n:'a'}) " +
      "CREATE (a)-[:T {k:1}]->(a) CREATE (a)-[:T {k:2}]->(a)")
    def c(q: String) = s.rows(s.run(q)).head("c")
    assert(c("MATCH (x:L)-[:T]->(y) RETURN count(*) AS c") == 2L)
    assert(c("MATCH (x:L)-[:T]->(y)-[:T]->(z) RETURN count(*) AS c") == 2L)
  }
}
