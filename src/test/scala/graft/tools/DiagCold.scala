package graft

import org.apache.spark.sql.SparkSession

/** Scratch cold-path phase split (not part of the driver contract): per
  * query, time (a) DataFrame build — Cypher translate + Catalyst analysis,
  * (b) optimization + physical planning, (c) execution through the noop
  * sink. Localizes whether a cold number is driver planning cost or data
  * work. Usage: Test/runMain graft.DiagCold [runs] [q1,q2,...]
  */
object DiagCold {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = args.headOption.flatMap(_.toIntOption).getOrElse(3)
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q_cypher_expand", "q_cypher_edge_props", "q_cypher_agg",
        "q_cypher_self_join", "q_cypher_varlen", "q_bm25", "q_knn_cosine")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_AQE_ADVISORY", "64m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.analyzer.singlePassResolver.enabledTentatively",
        sys.env.getOrElse("SPARK_GRAFT_SINGLE_PASS", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def isolate(): Unit = {
      SparkEntry.clearPlanCache(spark)
      // diag colds measure TRUE cold build cost, including table
      // resolution — the bench's timed colds are catalog-warm by design
      // (and say so in the artifact), but this tool's whole point is
      // attributing the cold path
      Tables.clearRelationCache(spark)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    try {
      val g = graft.graph.GraphBuilder.tpchStored(spark, sfDir)
      g.labelCounts; g.reltypeCounts
    } catch { case _: Throwable => () }
    // bench-like warmup (2 passes, plan caches cleared between)
    (1 to 2).foreach { _ =>
      SparkEntry.clearPlanCache(spark)
      names.foreach { n =>
        try SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[cold] warmup $n failed: ${e.getMessage}")
        }
      }
    }
    names.foreach { n =>
      (1 to runs).foreach { i =>
        isolate()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir) // translate + analyze
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // optimize + physical plan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save() // execute
        val t3 = System.nanoTime()
        println(f"[cold] $n run$i: build=${(t1 - t0) / 1e9}%.3f " +
          f"plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f " +
          f"total=${(t3 - t0) / 1e9}%.3f s")
      }
    }
    if (sys.env.get("DIAG_RULES").contains("1")) {
      // cumulative per-rule time across the whole run (analyzer + optimizer)
      println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent())
    }
    spark.stop()
  }
}
