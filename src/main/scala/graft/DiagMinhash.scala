package graft

import org.apache.spark.sql.SparkSession

/** Scratch cold-run stability diagnostic for q_dedup_minhash (not part of
  * the driver contract): N isolated cold runs with per-run phase timing to
  * localize the bistability the round-6/7 benches reported.
  */
object DiagMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = args.headOption.map(_.toInt).getOrElse(8)
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

    // same warm-up as Bench
    (1 to 2).foreach { _ =>
      SparkEntry.clearPlanCache(spark)
      SparkEntry.queries("q_dedup_minhash")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    def isolate(): Unit = {
      SparkEntry.clearPlanCache(spark)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    val mx = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMs(): Long = {
      var t = 0L
      mx.forEach(b => t += b.getCollectionTime)
      t
    }
    import org.apache.spark.sql.functions._
    import graft.dedup.Dedup
    // per-stage timing listener: stageId -> (name, duration ms, tasks,
    // max task ms, shuffle read rows)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val si = sc.stageInfo
          val dur = for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s
          stages.put(si.stageId,
            f"stage=${si.stageId} dur=${dur.getOrElse(-1L)}ms " +
              f"tasks=${si.numTasks} " +
              f"srRows=${si.taskMetrics.shuffleReadMetrics.recordsRead} " +
              f"swRows=${si.taskMetrics.shuffleWriteMetrics.recordsWritten} " +
              f"gc=${si.taskMetrics.jvmGCTime}ms " +
              f"exec=${si.taskMetrics.executorRunTime}ms " +
              si.name.takeWhile(_ != '('))
        }
      })
    // mode: "ckpt" (production shape), "nockpt" (skip localCheckpoint),
    // "noaqe" (checkpoint, AQE off for the verify job)
    val mode = args.drop(1).headOption.getOrElse("ckpt")
    (1 to runs).foreach { i =>
      isolate()
      val g0 = gcMs()
      val t0 = System.nanoTime()
      // phase-instrumented replica of Dedup.minHashDedup(docs, 0.3)
      val docs = graft.Tables.documents(spark, sfDir)
      val cands = Dedup.lshCandidates(
        Dedup.minHashSignatures(docs, 64, 3), 64, 16, Int.MaxValue).cache()
      val nc = cands.count()
      val t1 = System.nanoTime()
      val verified = Dedup.jaccard(docs, cands, 3)
        .filter(col("jaccard") >= 0.3)
      val result = mode match {
        case "nockpt" => verified
        case "noaqe" =>
          spark.conf.set("spark.sql.adaptive.enabled", "false")
          val r = verified.localCheckpoint(true)
          spark.conf.set("spark.sql.adaptive.enabled", "true")
          r
        case _ => verified.localCheckpoint(true)
      }
      cands.unpersist()
      val t2 = System.nanoTime()
      result.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"[minhash] run$i: total=${(t3 - t0) / 1e9}%.2f s  " +
        f"cands=${(t1 - t0) / 1e9}%.2f verify=${(t2 - t1) / 1e9}%.2f " +
        f"sink=${(t3 - t2) / 1e9}%.2f  n=$nc gc=${gcMs() - g0} ms")
      if ((t3 - t0) / 1e9 > 5.0) {
        import scala.jdk.CollectionConverters._
        stages.asScala.toSeq.sortBy(_._1).foreach { case (_, s) =>
          println(s"[minhash]   $s")
        }
      }
      stages.clear()
    }
    spark.stop()
  }
}
