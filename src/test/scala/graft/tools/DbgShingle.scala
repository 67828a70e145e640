package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: locate divergence between graft_shingle_hashes and the legacy
  * composed pipeline. Run: sbt "Test/runMain graft.tools.DbgShingle"
  */
object DbgShingle {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.plans.GraftExtensions.ensureFunctions(spark)
    val edge = Seq((9000001L, ""), (9000002L, "   "),
      (9000003L, "\t leading tab"), (9000004L, "one"),
      (9000005L, "two words"), (9000006L, "exactly three tokens"),
      (9000007L, "ÅÄÖ Straße ΣΊΣΥΦΟΣ İstanbul"),
      (9000008L, "a  b\t\tc\n\nd   e"),
      (9000009L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).unionByName(edge)
    val k = args.headOption.map(_.toInt).getOrElse(1)
    val toks = graft.text.TextOps.tokens(col("text"))
    val grams = transform(
      sequence(lit(1), greatest(size(toks) - (k - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(k))))
    val legacy = corpus.select(col("doc_id"), explode(grams).as("g"))
      .select(col("doc_id"), col("g"),
        call_function("graft_polyhash", col("g")).as("sh"))
    val native = corpus.select(col("doc_id"), explode(
      call_function("graft_shingle_hashes", col("text"), lit(k))).as("sh"))
    val diff = legacy.select("doc_id", "sh").exceptAll(native)
    println("=== legacy-only rows by doc:")
    diff.groupBy("doc_id").count().orderBy("doc_id").show(10)
    val ids = diff.select("doc_id").distinct().as[Long].collect().take(2)
    if (ids.nonEmpty) {
      corpus.filter(col("doc_id").isin(ids.map(Long.box): _*)).show(2, 120)
      println("=== legacy grams for first diverging doc:")
      legacy.filter(col("doc_id") === ids.head).show(50, 60)
      println("=== native hashes:")
      native.filter(col("doc_id") === ids.head).show(50, 60)
    }
    spark.stop()
  }
}
