package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: GraphX staticPageRank vs the DataFrame power iteration, value
  * parity + isolated cold timings at a given SF.
  */
object DiagPrAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val runs = args.headOption.flatMap(a =>
      scala.util.Try(a.toInt).toOption).getOrElse(3)
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
    val g = graft.graph.PropertyGraph.eventChain(spark, sfDir)
    // value parity at 6 dp (the oracle's comparison grain)
    val a = graft.graph.GraphOps.pageRankDf(g, 0.15, 10)
      .select(col("id"), round(col("pagerank"), 6).as("r"))
    val b = graft.graph.GraphOps.pageRank(g, 0.15, 10)
      .select(col("id"), round(col("pagerank"), 6).as("r"))
    val diff = a.join(b, Seq("id")).filter(a("r") =!= b("r")).count()
    println(s"[prab] 6dp mismatches: $diff of ${a.count()}")
    def isolate(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    Seq("df" -> (() => graft.graph.GraphOps.pageRankDf(g, 0.15, 10)),
        "graphx" -> (() => graft.graph.GraphOps.pageRank(g, 0.15, 10)))
      .foreach { case (tag, f) =>
        f().write.format("noop").mode("overwrite").save() // warm
        (1 to runs).foreach { i =>
          isolate()
          val t0 = System.nanoTime()
          f().write.format("noop").mode("overwrite").save()
          println(f"[prab] $tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      }
    spark.stop()
  }
}
