package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone entry point for [[graft.ScaleData]] (the bench invokes the
  * generator directly when `target/sf1`/`target/sf10` is absent; this
  * tool pre-generates them out-of-band).
  *
  * Run: sbt "Test/runMain graft.tools.MakeSf [copies] [outDir]"
  * (default 10 copies → target/sf1; e.g. `100 target/sf10` for the
  * 100× probe data).
  */
object MakeSf {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.flatMap(a =>
      scala.util.Try(a.toInt).toOption).getOrElse(10)
    val out = args.drop(1).headOption.getOrElse("target/sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ScaleData.ensure(spark, "/root/testdata/sf0.1", out, copies)
    spark.stop()
  }
}
