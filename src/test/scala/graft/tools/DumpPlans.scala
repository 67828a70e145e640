package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for declared queries to files (not part of
  * the driver contract). Usage:
  *   Test/runMain graft.DumpPlans <outDir> <suffix> [q1,q2,...]
  * Writes <outDir>/<query><suffix>.txt per query (default: every declared
  * query). The optimization-round evidence files under plans/r15/ come from
  * here.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r15")
    val suffix = if (args.length > 1) args(1) else "_before"
    val only = if (args.length > 2) Some(args(2).split(",").toSet) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // graph store + stats are data-at-rest (same treatment as Bench)
    try {
      val g = graft.graph.GraphBuilder.tpchStored(spark, sfDir)
      g.labelCounts; g.reltypeCounts
    } catch { case _: Throwable => () }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/$n$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[dumpplans] wrote $outDir/$n$suffix.txt")
      } catch { case e: Throwable =>
        println(s"[dumpplans] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
