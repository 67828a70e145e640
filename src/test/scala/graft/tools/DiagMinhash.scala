package graft

import org.apache.spark.sql.SparkSession

/** Scratch cold-run stability diagnostic for q_dedup_minhash (not part of
  * the driver contract): N isolated cold runs with per-run phase timing to
  * localize the bistability the round-6/7 benches reported.
  */
object DiagMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // tolerant args: any numeric arg = run count, any non-numeric = mode
    val runs = args.flatMap(a => scala.util.Try(a.toInt).toOption)
      .headOption.getOrElse(8)
    // composable flags: "benchlike" (full bench preamble) plus one of
    // ckpt/nockpt/noaqe/lazy for the checkpoint ablation
    val flags = args.filter(a => scala.util.Try(a.toInt).isFailure).toSet
    val mode = (flags - "benchlike").headOption.getOrElse("ckpt")
    val benchlike = flags.contains("benchlike")
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

    def isolate(): Unit = {
      SparkEntry.clearPlanCache(spark)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    if (benchlike) {
      // replicate the FULL bench preamble (graph store + 2 warmup passes +
      // cold/warm runs of every headline query preceding q_dedup_minhash):
      // the bistability only reproduces in this environment, never with a
      // minhash-only warmup
      try {
        val g = graft.graph.GraphBuilder.tpchStored(spark, sfDir)
        g.labelCounts; g.reltypeCounts
      } catch { case _: Throwable => () }
      val pre = Bench.headline.takeWhile(_ != "q_dedup_minhash")
      (1 to 2).foreach { _ =>
        SparkEntry.clearPlanCache(spark)
        (pre :+ "q_dedup_minhash").foreach { n =>
          try SparkEntry.queries(n)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
        }
      }
      pre.foreach { n =>
        (1 to 3).foreach { _ =>
          isolate()
          SparkEntry.queries(n)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
        (1 to 3).foreach { _ =>
          SparkEntry.queries(n)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
      }
      println("[minhash] benchlike preamble done")
    } else {
      // same warm-up as Bench
      (1 to 2).foreach { _ =>
        SparkEntry.clearPlanCache(spark)
        SparkEntry.queries("q_dedup_minhash")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
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
    // "noaqe" (checkpoint, AQE off for the verify job), "lazy"
    // (localCheckpoint(eager=false) — sink triggers it)
    // poor-man's profiler: sample executor-task stacks during each run;
    // slow runs then show WHERE the cycles went (compile vs interpret vs
    // shuffle vs lock-wait) instead of just which stage was slow
    val sampleCounts =
      new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
            if (t.getName.startsWith("Executor task launch") &&
                t.getState == Thread.State.RUNNABLE && st.nonEmpty) {
              // keep the deepest meaningful frame + its caller
              val key = st.take(6).map(f =>
                f.getClassName.split("\\.").last + "." + f.getMethodName)
                .mkString(" < ")
              sampleCounts.merge(key, 1, (a, b) => a + b)
            }
          }
        }
        Thread.sleep(137)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    var minTotal = Double.MaxValue
    (1 to runs).foreach { i =>
      isolate()
      sampleCounts.clear(); sampling = true
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
      // nockpt/lazy keep the cands cache live through the sink write so
      // the ablation isolates checkpoint cost, not cache loss (the verify
      // plan references cands in several subtrees)
      val (result, unpersistAfterSink) = mode match {
        case "nockpt" => (verified, true)
        case "lazy" => (verified.localCheckpoint(false), true)
        case "noaqe" =>
          spark.conf.set("spark.sql.adaptive.enabled", "false")
          val r = verified.localCheckpoint(true)
          spark.conf.set("spark.sql.adaptive.enabled", "true")
          (r, false)
        case _ => (verified.localCheckpoint(true), false)
      }
      if (!unpersistAfterSink) cands.unpersist()
      val t2 = System.nanoTime()
      result.write.format("noop").mode("overwrite").save()
      if (unpersistAfterSink) cands.unpersist()
      val t3 = System.nanoTime()
      println(f"[minhash] run$i: total=${(t3 - t0) / 1e9}%.2f s  " +
        f"cands=${(t1 - t0) / 1e9}%.2f verify=${(t2 - t1) / 1e9}%.2f " +
        f"sink=${(t3 - t2) / 1e9}%.2f  n=$nc gc=${gcMs() - g0} ms")
      minTotal = math.min(minTotal, (t3 - t0) / 1e9)
      // always dump the expensive stages — a slow run is only attributable
      // next to a fast run's profile of the same stages
      locally {
        import scala.jdk.CollectionConverters._
        stages.asScala.toSeq.sortBy(_._1)
          .filter(_._2.contains("ms")) // all
          .foreach { case (_, s) =>
            val dur = "dur=(\\d+)ms".r.findFirstMatchIn(s)
              .map(_.group(1).toLong).getOrElse(0L)
            if (dur > 400) println(s"[minhash]   $s")
          }
      }
      stages.clear()
      sampling = false
      if ((t3 - t0) / 1e9 > 1.45 * minTotal) {
        import scala.jdk.CollectionConverters._
        sampleCounts.asScala.toSeq.sortBy(-_._2).take(10).foreach {
          case (k, c) => println(s"[minhash]   samples=$c  $k")
        }
      }
    }
    spark.stop()
  }
}
