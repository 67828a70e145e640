package graft

import org.apache.spark.sql.SparkSession
import graft.cypher.CypherSession

/** Scratch TCK-shaped query runner (not part of the driver contract):
  * `runMain graft.DiagTck "<setup>" "<query>"` — prints decoded rows or the
  * failure, for fast triage of single scenarios without the TCK harness.
  */
object DiagTck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val session = new CypherSession(spark)
    val setup = args.lift(0).getOrElse("")
    val query = args.lift(1).getOrElse("RETURN 1")
    if (setup.nonEmpty) session.run(setup)
    try {
      val df = session.run(query)
      if (df.columns.contains("nodes_created")) df.show(false)
      else session.rows(df).foreach(r => println(r.toList.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString(" | ")))
    } catch {
      case e: Throwable =>
        println(s"[diagtck] FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
        e.printStackTrace()
    }
    session.release()
    spark.stop()
  }
}
