package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B for the simHashPairs signature materialization (not part
  * of the driver contract): times the shipped shape (capped signature
  * frame localCheckpointed once before the prefix self-join) against the
  * prior LAZY shape (self-join over the un-materialized pipeline, which
  * plans the dominant tokenize→hash→bit-sum pass as two independent
  * subtrees — the same defect measured at 2.3× on minhash at sf10).
  */
object DiagSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = args.flatMap(a => scala.util.Try(a.toInt).toOption)
      .headOption.getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.dedup.Dedup

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    // the pre-r13 lazy shape, reconstructed from the same public pieces
    def lazyPairs() = {
      val sig = Dedup.capBuckets(
        Dedup.simHash(docs).withColumn("prefix",
          shiftright(col("simhash"), Dedup.SimHashBits - 16)),
        Seq("prefix"), Dedup.resolveCapFor(Dedup.AutoBucketSize, docs))
      val l = sig.select(col("prefix"), col("doc_id").as("a"),
        col("simhash").as("sig_a"))
      val r = sig.select(col("prefix"), col("doc_id").as("b"),
        col("simhash").as("sig_b"))
      l.join(r, "prefix").filter(col("a") < col("b"))
        .withColumn("dist",
          Dedup.hamming(col("sig_a"), col("sig_b")).cast("int"))
        .filter(col("dist") <= 8).select("a", "b", "dist")
    }

    def isolate(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    def time(tag: String)(mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to runs).map { _ =>
        isolate()
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: median ${ts.sorted.apply(runs / 2)}%.2f s  " +
        ts.map(t => f"$t%.2f").mkString("[", ", ", "]"))
    }
    // interleave to keep JIT/page-cache conditions comparable
    time("lazy (two signature subtrees)")(() => lazyPairs())
    time("materialized (shipped)")(() => Dedup.simHashPairs(docs))
    time("lazy again")(() => lazyPairs())
    time("materialized again")(() => Dedup.simHashPairs(docs))
    spark.stop()
  }
}
