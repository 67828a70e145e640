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

  test("map comparison is semantic: key count, then keys, then values") {
    // Map_Compare (map.c:208): numeric-aware value order — {a: 2} < {a: 10}
    // (JSON-lexicographic string order would say false)
    val r = rows(
      """WITH {a: 2} AS m1, {a: 10} AS m2, {a: 1} AS s1,
        |{a: 1, b: 2} AS big, {b: 2} AS kb
        |RETURN m1 < m2 AS lt, m1 > m2 AS gt,
        |s1 < big AS cnt, big < kb AS cnt2,
        |kb > s1 AS keyOrd""".stripMargin)
    assert(r == Seq(Map(
      "lt" -> true, "gt" -> false,
      // 1 key < 2 keys regardless of key/value content
      "cnt" -> true, "cnt2" -> false,
      // same count: key 'b' > key 'a' decides before values
      "keyOrd" -> true)))
  }

  test("ORDER BY on map column uses semantic value order") {
    val r = rows(
      """WITH [1, 2, 10] AS xs UNWIND xs AS x
        |WITH {a: x} AS m ORDER BY m DESC
        |RETURN m.a AS a""".stripMargin)
    assert(r.map(_("a")) == Seq(10L, 2L, 1L))
  }

  test("BOXED maps (via UNWIND) order by key count before key content") {
    // {z: 9} has 1 key < 2 keys of {a: 1, b: 2} — count decides first
    // (raw JSON string order would put {"a"... before {"z"...)
    val r = rows(
      """UNWIND [{a: 1, b: 2}, {z: 9}] AS m RETURN m ORDER BY m""")
    assert(r.map(_("m")) ==
      Seq(Map("z" -> 9L), Map("a" -> 1L, "b" -> 2L)))
  }

  test("same-count BOXED maps order values semantically, not as JSON") {
    // {x: 2} < {x: 10} numerically; canonical-JSON text order would say
    // "...10}" < "...2}". Map_Compare (map.c:208-246) recurses into
    // values — same keys, so the numeric values decide.
    val r = rows(
      """UNWIND [{x: 10}, {x: 2}] AS m RETURN m ORDER BY m""")
    assert(r.map(_("m")) == Seq(Map("x" -> 2L), Map("x" -> 10L)))
    // keys compare before values: {a: 99} < {b: 0} regardless of values
    val r2 = rows(
      """UNWIND [{b: 0}, {a: 99}] AS m RETURN m ORDER BY m""")
    assert(r2.map(_("m")) == Seq(Map("a" -> 99L), Map("b" -> 0L)))
    // mixed value types one level down: numeric ranks above string in
    // the reference enum order (string 11 < numeric 13 here)
    val r3 = rows(
      """UNWIND [{x: 1}, {x: 'z'}] AS m RETURN m ORDER BY m""")
    assert(r3.map(_("m")) == Seq(Map("x" -> "z"), Map("x" -> 1L)))
  }

  test("BOXED maps with NESTED composite values order semantically at depth 2") {
    // {a: {x: 2}} < {a: {x: 10}}: the depth-1 value is itself an object —
    // schema_of_variant returns the PARAMETERIZED "OBJECT<x: BIGINT>"
    // (never bare "OBJECT"), so an equality test on the schema left both
    // composite branches dead and the nested values fell through to the
    // numeric rank with raw-JSON tiebreak ("...10}" < "...2}")
    val r = rows(
      """UNWIND [{a: {x: 10}}, {a: {x: 2}}] AS m RETURN m ORDER BY m""")
    assert(r.map(_("m")) ==
      Seq(Map("a" -> Map("x" -> 2L)), Map("a" -> Map("x" -> 10L))))
    // rank order one level down: an object value sorts before a string
    // value (reference enum: map 0 < string 11)
    val r2 = rows(
      """UNWIND [{a: 's'}, {a: {m: 1}}] AS m RETURN m ORDER BY m""")
    assert(r2.map(_("m")) ==
      Seq(Map("a" -> Map("m" -> 1L)), Map("a" -> "s")))
    // nested-object key count decides before nested content
    val r3 = rows(
      """UNWIND [{a: {p: 1, q: 2}}, {a: {z: 9}}] AS m
        |RETURN m ORDER BY m""".stripMargin)
    assert(r3.map(_("m")) ==
      Seq(Map("a" -> Map("z" -> 9L)),
        Map("a" -> Map("p" -> 1L, "q" -> 2L))))
    // nested ARRAY values compare element-wise numerically: [2] < [10]
    // (raw JSON would say "[10]" < "[2]")
    val r4 = rows(
      """UNWIND [{a: [10]}, {a: [2]}] AS m RETURN m ORDER BY m""")
    assert(r4.map(_("m")) ==
      Seq(Map("a" -> List(2L)), Map("a" -> List(10L))))
  }

  test("toJSON of a map holding a typed list-of-maps renders the list") {
    val r = rows("""RETURN toJSON({a: [{b: 1}], s: 'x'}) AS j""")
    assert(r.head("j") == """{"a": [{"b": 1}], "s": "x"}""")
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
