package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch minhash stage-timing diagnostic (not part of the driver contract). */
object DiagMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    import graft.dedup.Dedup
    val docs = Tables.documents(spark, sfDir)
    // JIT warm
    Dedup.minHashDedup(docs, 0.3).count()
    (1 to 2).foreach { i =>
      spark.catalog.clearCache()
      println(s"[diag] === round $i ===")
      val sigs = t("signatures (build)") {
        Dedup.minHashSignatures(docs)
      }
      t("signatures (exec)") { sigs.write.format("noop").mode("overwrite").save() }
      val sigsC = t("sigs cache+count") {
        val s2 = Dedup.minHashSignatures(docs).cache(); s2.count(); s2
      }
      val cands = t("cands count (cached sigs)") {
        val c = Dedup.lshCandidates(sigsC).cache()
        c.count(); c
      }
      val cands2 = t("cands count (uncached sigs)") {
        val c = Dedup.lshCandidates(Dedup.minHashSignatures(docs))
        c.count(); c
      }
      sigsC.unpersist()
      val r = t("jaccard verify") {
        Dedup.jaccard(docs, cands, 3).filter(col("jaccard") >= 0.3)
      }
      t("final count") { r.count() }
      cands.unpersist()
    }
    spark.stop()
  }
}
