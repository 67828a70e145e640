package graft

import org.apache.spark.sql.SparkSession

/** Scratch phase-timing diagnostic (not part of the driver contract). */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = args.toSeq match {
      case Nil => Seq("q_cypher_agg", "q_cypher_expand", "q_dedup_minhash")
      case xs => xs
    }

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag]   $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // pre-warm graph + JIT
    val g = graft.graph.GraphBuilder.tpchStored(spark, sfDir)
    g.labelCounts; g.reltypeCounts
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[diag] warm $n: $e") }
    }

    import org.apache.spark.sql.catalyst.rules.RuleExecutor
    def dumpTop(k: Int): Unit = {
      val lines = RuleExecutor.dumpTimeSpent().split("\n")
        .filter(_.contains("org.apache"))
        .take(k)
      lines.foreach(l => println(s"[diag]   $l"))
    }
    names.foreach { n =>
      println(s"[diag] === $n ===")
      (1 to 3).foreach { i =>
        SparkEntry.clearPlanCache(spark)
        spark.catalog.clearCache()
        val df = t(s"run$i build") { SparkEntry.queries(n)(spark, sfDir) }
        val qe = df.queryExecution
        t(s"run$i optimize")(qe.optimizedPlan)
        t(s"run$i execute")(df.write.format("noop").mode("overwrite").save())
      }
    }
    spark.stop()
  }
}
