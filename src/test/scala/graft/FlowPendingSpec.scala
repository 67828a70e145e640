package graft

import graft.cypher.Graft
import org.scalatest.funsuite.AnyFunSuite

/** Port of `tests/flow/test_pending_queries_limit.py`: MAX_QUEUED_QUERIES
  * bounds the pending-query queue — the first THREAD_COUNT in-flight
  * queries hold execution slots, the overflow beyond the limit is
  * rejected with the reference's "Max pending queries exceeded".
  */
class FlowPendingSpec extends AnyFunSuite {
  import SparkTestSession._

  private val SlowQuery =
    "UNWIND range(0, 100000) AS x WITH x WHERE (x / 2) = 50 RETURN x"

  /** thread_count = THREAD_COUNT * 5 concurrent queries (the suite's
    * stress_server); returns how many were rejected.
    */
  private def stress(g: Graft): Int = {
    val threads = g.configGet("THREAD_COUNT").toInt * 5
    val rejected = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val other = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val fs = (1 to threads).map { _ =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try g.query("max_pending_queries", SlowQuery).collect()
          catch {
            case e: IllegalStateException
                if e.getMessage.contains("Max pending queries exceeded") =>
              rejected.incrementAndGet()
            case t: Throwable => other.add(t)
          }
      })
    }
    fs.foreach(_.get())
    pool.shutdown()
    assert(other.isEmpty, s"unexpected error: ${Option(other.peek())}")
    rejected.get()
  }

  test("01 query limit config: default UINT32_MAX, settable, readable") {
    val g = new Graft(spark)
    assert(g.config("GET", "MAX_QUEUED_QUERIES") ==
      Seq("MAX_QUEUED_QUERIES" -> 4294967295L))
    g.config("SET", "MAX_QUEUED_QUERIES", "10")
    assert(g.configGet("MAX_QUEUED_QUERIES") == 10L)
  }

  test("02 overflow with no limit: every query completes") {
    val g = new Graft(spark)
    g.configSet("MAX_QUEUED_QUERIES", 4294967295L)
    assert(stress(g) == 0)
  }

  test("03 overflow with limit 0: overflow beyond the slots is rejected") {
    val g = new Graft(spark)
    // the reference uses limit 1 against a real thread pool; here every
    // caller thread occupies its own "executor" immediately, so limit 0
    // makes any query beyond THREAD_COUNT concurrently-pending reject
    g.configSet("MAX_QUEUED_QUERIES", 0L)
    assert(stress(g) > 0)
  }
}
