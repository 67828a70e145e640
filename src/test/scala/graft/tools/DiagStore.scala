package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: time the hot Cypher bench queries against the in-memory tpch
  * graph vs the bucketed+label-partitioned GraphStore at-rest form.
  */
object DiagStore {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mem = graft.graph.GraphBuilder.tpchStored(spark, sfDir)
    val t0 = System.nanoTime()
    graft.graph.GraphStore.save(mem, "diag_tpch", buckets = 32)
    println(f"[store] save: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val stored = graft.graph.GraphStore.load(spark, "diag_tpch")

    val queries = Seq(
      "q_expand" ->
        """MATCH (c:Customer)-[:PLACED]->(o:Order)
          |WHERE o.totalprice > 300000
          |RETURN c.custkey AS ck, o.orderkey AS ok,
          |       round(o.totalprice * 100) / 100 AS price""".stripMargin,
      "q_edge_props" ->
        """MATCH (o:Order)-[l:CONTAINS]->(p:Part)
          |WHERE l.quantity >= 49
          |RETURN o.orderkey AS ok, p.partkey AS pk,
          |       round(l.extendedprice * 100) / 100 AS price""".stripMargin,
      "q_agg" ->
        """MATCH (c:Customer)-[:IN_NATION]->(n:Nation)
          |RETURN n.name AS nation, count(*) AS n_cust,
          |       round(sum(c.acctbal) * 100) / 100 AS bal""".stripMargin,
      "q_rev_expand" ->
        """MATCH (o:Order)<-[:PLACED]-(c:Customer)
          |WHERE o.totalprice > 300000
          |RETURN count(c) AS n""".stripMargin)

    def bench(tag: String, g: graft.graph.PropertyGraph): Unit = {
      val sess = new graft.cypher.CypherSession(spark)
      sess.setGraph(g)
      sess.graph.labelCounts; sess.graph.reltypeCounts
      queries.foreach { case (n, q) =>
        // warm twice, then 3 timed runs of the cached plan
        (1 to 2).foreach(_ =>
          sess.run(q).write.format("noop").mode("overwrite").save())
        val ts = (1 to 3).map { _ =>
          val t = System.nanoTime()
          sess.run(q).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t) / 1e9
        }
        println(f"[store] $tag $n: ${ts.sorted.apply(1)}%.3f s " +
          f"(${ts.min}%.3f-${ts.max}%.3f) rows=${sess.run(q).count()}")
      }
    }
    bench("mem   ", mem)
    bench("stored", stored)
    graft.graph.GraphStore.drop(spark, "diag_tpch")
    spark.stop()
  }
}
