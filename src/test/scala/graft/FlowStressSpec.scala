package graft

import graft.cypher.Graft
import org.scalatest.funsuite.AnyFunSuite

/** Port of `tests/flow/test_stress.py` test00 (concurrent CRUD quartets —
  * create / var-len read / update / var-len delete per client), scaled
  * from 100 clients × 10 iterations to 6 × 2 for the shared test JVM
  * (suites run in parallel; statements here are driver-side Spark jobs,
  * not sub-ms native ops);
  * the per-client query shapes are verbatim. The BGSAVE-under-load arm
  * maps to [[graft.graph.GraphStore]] saves and is covered by
  * FlowPersistencySpec + GraphStoreSpec's incremental saves.
  */
class FlowStressSpec extends AnyFunSuite {
  import SparkTestSession._

  test("00 concurrent CRUD quartets leave a consistent graph") {
    val g = new Graft(spark)
    val gid = "stress_g"
    val clients = 6
    val pool = java.util.concurrent.Executors.newFixedThreadPool(clients)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val fs = (0 until clients).map { id =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try {
            (1 to 2).foreach { _ =>
              g.query(gid,
                s"CREATE (n:node {v:'$id'}), (n)-[:have]->({value:'$id'}), " +
                  s"(n)-[:have]->({value:'$id'})")
              g.query(gid,
                s"MATCH (n0:node {v:'$id'})<-[:have]-(n:node)-[:have]->(n1:node) " +
                  "RETURN n1.v")
              g.query(gid, s"MATCH (n:node {v: '$id'}) SET n.x = '$id'")
              g.query(gid,
                s"MATCH (n:node {v: '$id'})-[:have*]->(n1) DELETE n, n1")
            }
          } catch { case t: Throwable => errors.add(t) }
      })
    }
    fs.foreach(_.get())
    pool.shutdown()
    assert(errors.isEmpty, s"stress CRUD failed: ${Option(errors.peek())}")
    // every client deleted its own subgraph on each iteration's tail —
    // nothing survives
    val sess = g.sessionFor(gid)
    assert(sess.rows(g.query(gid, "MATCH (n) RETURN count(n) AS c"))
      .head("c") == 0L)
  }
}
