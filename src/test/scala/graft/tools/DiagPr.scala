package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: isolated cold-run spread of q_graph_pagerank at a given SF
  * (the r9 bench saw a 5.0-16.5 s sf1 spread; localize whether the tail is
  * GraphX iteration lineage or environment).
  */
object DiagPr {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val runs = args.headOption.flatMap(a =>
      scala.util.Try(a.toInt).toOption).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_AQE_ADVISORY", "64m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mx = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMs(): Long = { var t = 0L; mx.forEach(b => t += b.getCollectionTime); t }
    // bench-like warmup
    (1 to 2).foreach { _ =>
      graft.SparkEntry.clearPlanCache(spark)
      graft.SparkEntry.queries("q_graph_pagerank")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    (1 to runs).foreach { i =>
      graft.SparkEntry.clearPlanCache(spark)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
      val g0 = gcMs()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q_graph_pagerank")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[pr] run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s  gc=${gcMs() - g0} ms")
    }
    spark.stop()
  }
}
