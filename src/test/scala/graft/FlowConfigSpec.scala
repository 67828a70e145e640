package graft

import graft.cypher.Graft
import org.scalatest.funsuite.AnyFunSuite

/** Port of `tests/flow/test_config.py` (7 tests) onto the GRAPH.CONFIG
  * surface: full field table reads, GET *, single and MULTI set with the
  * reference's atomic dry-run validation, and the three error shapes
  * ("Unknown configuration field", "Field can not be re-configured",
  * "Failed to set config value") plus the unknown-subcommand message.
  */
class FlowConfigSpec extends AnyFunSuite {
  import SparkTestSession._

  private def fresh = new Graft(spark)

  private def msg(body: => Any): String =
    intercept[IllegalArgumentException](body).getMessage

  test("01 config get: fixed facts, defaults, and GET *") {
    val g = fresh
    assert(g.config("GET", "MAINTAIN_TRANSPOSED_MATRICES") ==
      Seq("MAINTAIN_TRANSPOSED_MATRICES" -> 1L))
    assert(g.config("GET", "QUERY_MEM_CAPACITY") ==
      Seq("QUERY_MEM_CAPACITY" -> 0L)) // QUERY_MEM_CAPACITY_UNLIMITED
    // at least 10 configurations reported (the full enum)
    assert(g.config("GET", "*").size >= 10)
  }

  test("02 config get: invalid name") {
    assert(msg(fresh.config("GET", "FAKE_CONFIG_NAME"))
      .contains("Unknown configuration field"))
  }

  test("03 config set: runtime fields update and read back") {
    val g = fresh
    g.config("SET", "RESULTSET_SIZE", "3")
    assert(g.config("GET", "RESULTSET_SIZE") == Seq("RESULTSET_SIZE" -> 3L))
    g.config("SET", "QUERY_MEM_CAPACITY", (1L << 20).toString)
    assert(g.config("GET", "QUERY_MEM_CAPACITY") ==
      Seq("QUERY_MEM_CAPACITY" -> (1L << 20)))
  }

  test("04 config set multi") {
    val g = fresh
    g.config("SET", "RESULTSET_SIZE", "3", "QUERY_MEM_CAPACITY", "100")
    assert(g.configGet("RESULTSET_SIZE") == 3L)
    assert(g.configGet("QUERY_MEM_CAPACITY") == 100L)
  }

  test("05 config set invalid multi is atomic (dry-run all, apply none)") {
    val g = fresh
    val before = g.configGetAll
    // known but not runtime-settable
    assert(msg(g.config("SET", "QUERY_MEM_CAPACITY", "150",
      "VKEY_MAX_ENTITY_COUNT", "40"))
      .contains("Field can not be re-configured"))
    // unknown field
    assert(msg(g.config("SET", "QUERY_MEM_CAPACITY", "150",
      "FAKE_CONFIG_NAME", "40"))
      .contains("Unknown configuration field"))
    // -1 is not a valid MAX_QUEUED_QUERIES value
    assert(msg(g.config("SET", "QUERY_MEM_CAPACITY", "150",
      "MAX_QUEUED_QUERIES", "-1"))
      .contains("Failed to set config value"))
    // nothing was modified by any of the failed multi-sets
    assert(g.configGetAll == before)
  }

  test("06 config set: invalid name") {
    assert(msg(fresh.config("SET", "FAKE_CONFIG_NAME", "5"))
      .contains("Unknown configuration field"))
  }

  test("07 invalid subcommand") {
    assert(msg(fresh.config("DREP", "RESULTSET_SIZE", "3"))
      .contains("Unknown subcommand for GRAPH.CONFIG"))
  }
}
