package graft

import graft.cypher.Graft
import org.scalatest.funsuite.AnyFunSuite

/** Port of `tests/flow/test_query_mem_limit.py`: QUERY_MEM_CAPACITY is a
  * per-query memory cap — the Spark analogue accounts each job-group
  * task's peak execution memory + spill + result bytes and cancels the
  * group past the cap, surfacing the reference's exact message
  * (`rmalloc.c:50`). Reads return lazy frames by design, so enforcement
  * applies where the engine itself executes (mutations, PROFILE,
  * the profiled read here standing in for the server-side read).
  */
class FlowMemLimitSpec extends AnyFunSuite {
  import SparkTestSession._

  private val Hungry =
    """UNWIND range(0, 400000) AS x
      |WITH x ORDER BY x DESC
      |RETURN collect(x) AS xs""".stripMargin
  private val Thrifty =
    """UNWIND range(0, 10) AS x
      |WITH x WHERE (x / 2) = 5
      |RETURN x, count(x) AS c""".stripMargin

  test("01 config: default 0 (unlimited), settable, readable") {
    val g = new Graft(spark)
    assert(g.config("GET", "QUERY_MEM_CAPACITY") ==
      Seq("QUERY_MEM_CAPACITY" -> 0L))
    g.config("SET", "QUERY_MEM_CAPACITY", (1L << 20).toString)
    assert(g.configGet("QUERY_MEM_CAPACITY") == (1L << 20))
  }

  test("02/03 no limit and loose limit: hungry queries complete") {
    val g = new Graft(spark)
    val gid = "mem_loose"
    g.configSet("QUERY_MEM_CAPACITY", 0L)
    assert(g.profile(gid, Hungry).contains("Results"))
    g.configSet("QUERY_MEM_CAPACITY", 1L << 30) // 1GB
    assert(g.profile(gid, Hungry).contains("Results"))
  }

  test("04 tight limit: hungry fails with the reference message, thrifty passes") {
    val g = new Graft(spark)
    val gid = "mem_tight"
    // the reference's tight cap is 1MB; Tungsten acquires execution
    // memory in 64MB pages, so the smallest meaningful cap here is a few
    // pages — 256MB separates the thrifty query (1-2 pages observed) from
    // the hungry sort+collect (4+ pages) with the same pass/fail shape
    g.configSet("QUERY_MEM_CAPACITY", 256L << 20)
    val e = intercept[Exception](g.profile(gid, Hungry))
    assert(e.getMessage.contains("Query's mem consumption exceeded capacity"),
      e.getMessage)
    assert(g.profile(gid, Thrifty).contains("Results"))
    g.configSet("QUERY_MEM_CAPACITY", 0L)
  }
}
