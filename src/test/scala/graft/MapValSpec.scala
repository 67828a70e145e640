package graft

import graft.cypher.CypherSession
import org.scalatest.funsuite.AnyFunSuite

/** Map literals as first-class runtime values (typed struct encoding). */
class MapValSpec extends AnyFunSuite {
  import SparkTestSession._

  private def rows(q: String): Seq[Map[String, Any]] = {
    val s = new CypherSession(spark)
    s.rows(s.run(q))
  }

  test("map literal projection, nesting, access, and equality") {
    val r = rows(
      """RETURN {a: 1, b: 'foo'} AS m, {} AS e,
        |{o: {i: 2}} AS n, {o: {i: 2}}.o.i AS x,
        |{k: 1} = {k: 1} AS eq1, {k: 1} = {l: 1} AS eq2,
        |{k: null} = {k: null} AS eq3, {} = {k: null} AS eq4,
        |{a: 1} <> {a: 2} AS ne1""".stripMargin)
    assert(r == Seq(Map(
      "m" -> Map("a" -> 1L, "b" -> "foo"),
      "e" -> Map.empty,
      "n" -> Map("o" -> Map("i" -> 2L)),
      "x" -> 2L,
      "eq1" -> true, "eq2" -> false, "eq3" -> null, "eq4" -> false,
      "ne1" -> true)))
  }

  test("WITH-forwarded map; missing key is NULL; IS NULL on maps") {
    val r = rows(
      """WITH {name: 'Mats', sub: {x: 1}} AS map
        |RETURN map.name AS n, map.sub.x AS sx, map.missing AS miss,
        |map IS NOT NULL AS nn""".stripMargin)
    assert(r == Seq(Map("n" -> "Mats", "sx" -> 1L, "miss" -> null,
      "nn" -> true)))
  }
}
