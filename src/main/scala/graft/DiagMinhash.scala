package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timing for the MinHash pipeline (not a driver contract). */
object DiagMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = Tables.documents(spark, sfDir)
    // warm JIT
    t("warmup full")(dedup.Dedup.minHashDedup(docs).count())

    (1 to 2).foreach { i =>
      spark.catalog.clearCache()
      val sh = dedup.Dedup.shingleHashes(docs).cache()
      t(s"run$i shingleHashes")(sh.count())
      val sig = dedup.Dedup.minHashSignatures(docs, 64, 3, Some(sh))
      t(s"run$i signatures")(sig.write.format("noop").mode("overwrite").save())
      val cands = dedup.Dedup
        .lshCandidates(dedup.Dedup.minHashSignatures(docs, 64, 3, Some(sh)))
        .cache()
      t(s"run$i lshCandidates")(cands.count())
      t(s"run$i jaccard")(
        dedup.Dedup.jaccard(docs, cands, 3, Some(sh))
          .filter(col("jaccard") >= 0.5)
          .write.format("noop").mode("overwrite").save())
      sh.unpersist(); cands.unpersist()
    }
    spark.catalog.clearCache()
    t("full minHashDedup (warm JIT, cold caches)")(
      dedup.Dedup.minHashDedup(docs).count())
    spark.catalog.clearCache()
    t("full minHashDedup again")(dedup.Dedup.minHashDedup(docs).count())
    spark.stop()
  }
}
