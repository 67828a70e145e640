package graft.tools

import org.apache.spark.sql.SparkSession

/** Sustained point-write probe: ≥100k SET statements against a cycling
  * working set, with the overlay byte bound forcing steady WAL spills.
  * Evidence target: flat driver memory (pending map bounded by bytes, WAL
  * on disk) with throughput held across the whole run — the 100 TB
  * write-path posture, measured rather than argued.
  *
  * Run: SPARK_GRAFT_OPS=100000 sbt "Test/runMain graft.tools.DiagSustained"
  */
object DiagSustained {
  def main(args: Array[String]): Unit = {
    val ops = sys.env.getOrElse("SPARK_GRAFT_OPS", "100000").toInt
    val keys = sys.env.getOrElse("SPARK_GRAFT_KEYS", "2000").toInt
    val bound = sys.env.getOrElse("SPARK_GRAFT_OVERLAY_BYTES", "65536")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("graft.pointwrite.maxOverlayBytes", bound)

    val s = new graft.cypher.CypherSession(spark)
    s.run(s"UNWIND range(1, $keys) AS i CREATE (:W {v: i})")
    val ids = s.rows(s.run("MATCH (w:W) RETURN id(w) AS i"))
      .map(_("i").asInstanceOf[Long]).toArray
    def heapMb(): Long = {
      System.gc(); Thread.sleep(100); System.gc()
      val r = Runtime.getRuntime
      (r.totalMemory() - r.freeMemory()) >> 20
    }
    // first touch of each key pays the point lookup (index seek analogue);
    // sustained steady state is the hot-working-set regime after it
    println(s"[sustained] warm: first-touch of $keys keys")
    val tw0 = System.nanoTime()
    ids.foreach(id => s.run(s"MATCH (n) WHERE id(n) = $id SET n.v = n.v + 1"))
    println(f"[sustained] first-touch: ${(System.nanoTime() - tw0) / 1e9}%.1f s")
    val h0 = heapMb()
    var maxPending = 0L
    var maxBytes = 0L
    val window = math.max(ops / 10, 1)
    // parameterized statement = one cached parse (the prepared-statement
    // client shape; inlined ids re-parse every op at ~300µs each)
    val upd = "MATCH (n) WHERE id(n) = $i SET n.v = n.v + 1"
    val t0 = System.nanoTime()
    var i = 0
    var tWin = t0
    while (i < ops) {
      val id = ids(i % keys)
      s.run(upd, Map("i" -> id))
      val (np, nb, _) = s.pointOverlayInfo
      if (np > maxPending) maxPending = np
      if (nb > maxBytes) maxBytes = nb
      i += 1
      if (i % window == 0) {
        val now = System.nanoTime()
        println(f"[sustained] ops=$i qps_window=${window * 1e9 / (now - tWin)}%.0f")
        tWin = now
      }
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val h1 = heapMb()
    val (_, _, segs) = s.pointOverlayInfo
    println(f"[sustained] ops=$ops keys=$keys bound=$bound sec=$sec%.1f " +
      f"qps=${ops / sec}%.0f wal_segments=$segs " +
      f"max_pending_rows=$maxPending max_pending_bytes=$maxBytes " +
      f"heap_before_mb=$h0 heap_after_mb=$h1")
    // the writes all landed (sum check over the final overlay view)
    val total = s.rows(s.run("MATCH (w:W) RETURN sum(w.v) AS s")).head("s")
    val expect = (1L to keys).sum + keys + ops
    println(s"[sustained] sum=$total expected=$expect " +
      (if (total == expect) "OK" else "MISMATCH"))
    spark.stop()
  }
}
