package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lineage-cut materialization for iterative and multi-consumer plans
  * (BFS frontiers, LSH bucket frames, streaming dedup stores), with a
  * cluster-resilience knob.
  *
  * Default: `localCheckpoint(eager)` — blocks live on the executors that
  * computed them, no filesystem round-trip. This is the right trade at
  * local[32] and on clusters where a retry of the whole query is
  * acceptable, but it is NON-RESILIENT by documented Spark behavior: the
  * truncated lineage cannot be recomputed, so losing ONE executor
  * mid-query kills the job. On a 1000-executor cluster running a
  * banded-bucket materialization (corpus × bands rows) that is the wrong
  * default failure domain.
  *
  * Knob: set `graft.checkpoint.reliable=true` (session conf) and point
  * `graft.checkpoint.dir` at a fault-tolerant path (HDFS/S3; any path the
  * cluster shares). Every materialization then writes a RELIABLE
  * checkpoint — executor loss recomputes downstream tasks from the
  * checkpoint files instead of failing the query. Cost: one
  * write+read-back of the materialized frame per cut (the standard
  * durability trade). Checkpoint files are reclaimed by
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` or die with
  * the checkpoint dir.
  */
object Checkpoints {

  /** The resilience knob (see object doc). */
  val ReliableConf = "graft.checkpoint.reliable"

  /** Fault-tolerant directory for reliable checkpoints; falls back to an
    * already-set `SparkContext.setCheckpointDir`.
    */
  val DirConf = "graft.checkpoint.dir"

  def reliable(spark: SparkSession): Boolean =
    spark.conf.getOption(ReliableConf).exists(_.toBoolean)

  /** Cut lineage and materialize `df` eagerly — localCheckpoint by
    * default, reliable checkpoint under the knob.
    */
  def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (!reliable(spark)) df.localCheckpoint(true)
    else {
      val sc = spark.sparkContext
      spark.conf.getOption(DirConf).foreach { d =>
        if (!sc.getCheckpointDir.contains(d)) sc.setCheckpointDir(d)
      }
      require(sc.getCheckpointDir.nonEmpty,
        s"$ReliableConf=true needs $DirConf (or SparkContext.setCheckpointDir)")
      df.checkpoint(eager = true)
    }
  }

  /** Release a superseded materialization's executor blocks (reliable
    * checkpoint files are left for the cleaner — in-flight consumers may
    * still read them).
    */
  def release(df: DataFrame): Unit =
    org.apache.spark.sql.GraftRdd.checkpointedRdd(df)
      .foreach(_.unpersist(blocking = false))
}
