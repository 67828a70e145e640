package graft

import graft.cypher.CypherSession
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-rotation vs in-flight readers (the r13 TCK transient:
  * `CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND` in `LocalCheckpointRDD.compute` —
  * a rotated block released while a concurrent scenario still read it).
  *
  * Reads are lock-free by design: a result frame handed out by `run`
  * references the graph snapshot of ITS statement. Later mutations rotate
  * the block store (bounded at ~2 generations), so without a read-pin a
  * result drained after two subsequent commits loses its blocks — a
  * recompute-impossible failure (local checkpoints have no lineage). The
  * session therefore keeps the last [[CypherSession.RecentReads]] read
  * results' referenced RDDs live through rotation.
  */
class CkptRotationSpec extends AnyFunSuite {
  import SparkTestSession._

  test("a result drained after later commits keeps its blocks") {
    val s = new CypherSession(spark)
    s.run("UNWIND range(1,1000) AS i CREATE (:RotN {v:i})")
    val df = s.run("MATCH (n:RotN) RETURN sum(n.v) AS t")
    // each mutation commits a snapshot and rotates; two rotations used to
    // release the first snapshot's blocks out from under `df`
    (1 to 4).foreach(i => s.run(s"CREATE (:RotM {k:$i})"))
    assert(s.rows(df).head("t") == 500500L)
  }

  test("concurrent readers survive a mutation burst (8-worker TCK shape)") {
    val s = new CypherSession(spark)
    s.run("UNWIND range(1,2000) AS i CREATE (:RotC {v:i})")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val readers = (1 to 6).map { _ =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try {
            (1 to 5).foreach { _ =>
              val df = s.run("MATCH (n:RotC) RETURN count(n.v) AS c")
              Thread.sleep(30) // let writers rotate under us
              assert(s.rows(df).head("c").asInstanceOf[Long] >= 2000L)
            }
          } catch { case t: Throwable => failures.add(t) }
      })
    }
    val writer = pool.submit(new Runnable {
      override def run(): Unit =
        try (1 to 12).foreach(i => s.run(s"CREATE (:RotW {k:$i})"))
        catch { case t: Throwable => failures.add(t) }
    })
    (readers :+ writer).foreach(_.get())
    pool.shutdown()
    assert(failures.isEmpty, s"concurrent read/rotate failed: ${
      Option(failures.peek()).map(_.toString).getOrElse("")}")
  }
}
