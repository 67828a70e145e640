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
    sys.env.get("DIAG_PR_PARTS").foreach(v =>
      spark.conf.set("spark.graft.pagerank.parts", v))
    val g = graft.graph.PropertyGraph.eventChain(spark, sfDir)
    println("[prab] edge plan size est: " +
      g.edges.queryExecution.optimizedPlan.stats.sizeInBytes)
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
    // per-stage profile (DIAG_STAGES=1): stage wall + task time per stage
    if (sys.env.get("DIAG_STAGES").contains("1"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            val si = sc.stageInfo
            val wall = (for {
              a <- si.completionTime; b <- si.submissionTime
            } yield a - b).getOrElse(-1L)
            println(f"[prstage] id=${si.stageId}%3d tasks=${si.numTasks}%3d " +
              f"wall=${wall}%5d ms exec=${si.taskMetrics.executorRunTime}%5d " +
              f"ser=${si.taskMetrics.resultSerializationTime + si.taskMetrics.executorDeserializeTime}%4d " +
              f"name=${si.name.take(60)}")
          }
        })
    Seq("rdd" -> (() => graft.graph.GraphOps.pageRank(g, 0.15, 10)),
        "graphx" -> (() => graft.graph.GraphOps.pageRankGraphX(g, 0.15, 10)))
      .foreach { case (tag, f) =>
        f().write.format("noop").mode("overwrite").save() // warm
        (1 to runs).foreach { i =>
          isolate()
          val t0 = System.nanoTime()
          val df = f()
          val t1 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          val t2 = System.nanoTime()
          println(f"[prab] $tag run$i: build=${(t1 - t0) / 1e9}%.2f " +
            f"write=${(t2 - t1) / 1e9}%.2f total=${(t2 - t0) / 1e9}%.2f s")
        }
      }
    spark.stop()
  }
}
