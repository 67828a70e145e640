package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming extension (SURVEY.md §2.7 — the reference has no
  * streaming; this is the Spark-native capability a 100 TB ingest pipeline
  * needs).
  *
  * Transforms are written against plain DataFrames so the SAME function runs
  * in batch (oracle-checkable) and as a streaming query (`readStream` →
  * transform → `writeStream`); StreamingSpec drives the streaming path
  * through a memory sink.
  */
object StreamOps {

  /** events schema as stored (ts = timestamp[us], no timezone). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Normalize a raw events frame so `ts` is epoch-nanos long whatever the
    * storage type was — same contract as [[graft.Tables.events]], applied to
    * streaming reads (which bypass Tables).
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case TimestampType | TimestampNTZType =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df
    }

  /** epoch-ns long → timestamp (µs precision). */
  def tsCol: org.apache.spark.sql.Column =
    timestamp_micros((col("ts") / 1000).cast("long"))

  /** Hourly tumbling-window counts/sums per event type. In streaming mode
    * the watermark bounds state; in batch mode it's a no-op.
    */
  def windowedCounts(events: DataFrame): DataFrame = {
    val withTs = events.withColumn("event_ts", tsCol)
    val marked =
      if (withTs.isStreaming) withTs.withWatermark("event_ts", "1 hour")
      else withTs
    marked
      .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .select(
        unix_millis(col("window.start")).as("win_start_ms"),
        col("event_type"), col("n_events"), col("sum_value"))
  }

  /** Streaming exact dedup: keep the first document per content hash.
    * In streaming mode `dropDuplicates` holds one state row per distinct
    * hash, bounded by the event-time watermark (late duplicates beyond
    * `watermarkHours` may re-emit — the standard at-scale trade; exact
    * global dedup stays a batch job, [[graft.dedup.Dedup.exactDedup]]).
    * Batch mode: dropDuplicates directly ≡ one row per distinct text.
    */
  def streamingDedup(docs: DataFrame, tsField: String = "event_ts",
      watermarkHours: Int = 24): DataFrame = {
    val hashed = docs.withColumn("__h", md5(col("text")))
    val out =
      if (hashed.isStreaming)
        hashed.withWatermark(tsField, s"$watermarkHours hours")
          .dropDuplicates("__h")
      else hashed.dropDuplicates("__h")
    out.drop("__h")
  }

  /** Sessionization: gap-based session ids per user (new session when the
    * gap to the previous event exceeds `gapMinutes`). Batch form uses a
    * window; the streaming analogue is flatMapGroupsWithState — the batch
    * result is the oracle for both.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapNs = gapMinutes.toLong * 60L * 1000000000L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts") - col("prev_ts") > gapNs, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum("new_session").over(w.rowsBetween(Long.MinValue, 0)))
      .select(col("event_id"), col("user_id"), col("session_seq"))
  }

  /** Per-user session state carried across triggers. */
  final case class SessionState(lastTs: Long, seq: Long)
  /** minimal event projection for the stateful path (public: encoders
    * codegen against it). */
  final case class Ev(event_id: Long, ts: Long, user_id: Long)

  /** Stateful sessionization via `flatMapGroupsWithState` — the custom-state
    * streaming operator (KeyValueGroupedDataset). The SAME function runs in
    * batch (each group sees all its rows, state unused across calls — the
    * oracle path) and in streaming (state persists across micro-batches,
    * sessions continue where the last trigger left off).
    *
    * Scale: state is one (lastTs, seq) pair per active user; the shuffle is
    * on user_id, the stream's natural key.
    */
  def sessionizeStateful(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapNs = gapMinutes.toLong * 60L * 1000000000L
    events.select(col("event_id"), col("ts"), col("user_id")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid, it, state) =>
          // within a trigger, process this user's events in time order
          val sorted = it.toVector.sortBy(e => (e.ts, e.event_id))
          var (lastTs, seq) = state.getOption
            .map(s => (s.lastTs, s.seq)).getOrElse((Long.MinValue, 0L))
          val out = sorted.map { e =>
            if (lastTs == Long.MinValue || e.ts - lastTs > gapNs) seq += 1
            lastTs = e.ts
            (e.event_id, uid, seq)
          }
          state.update(SessionState(lastTs, seq))
          out.iterator
      }
      .toDF("event_id", "user_id", "session_seq")
  }

  /** Stream-stream interval join: each left row pairs with right rows of
    * the same `key` whose event time lies within ±`windowMinutes` of the
    * left row's. In streaming mode both sides carry watermarks and the
    * time-range join condition lets Spark bound BOTH sides' join state
    * (state older than watermark + range is evicted — the canonical
    * stream-stream join shape). Batch mode: the identical join condition,
    * which is the oracle for the streaming path.
    *
    * Inputs carry (`event_id`, key, `ts` epoch-ns). Output:
    * (event_id, key, right_ts_ms).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      windowMinutes: Int): DataFrame = {
    val l = left.select(col("event_id"), col(key), tsCol.as("l_ts"))
    val r = right.select(col(key).as("__rk"), tsCol.as("r_ts"))
    // watermark delay ≥ the join range so no in-range row is dropped
    val wm = s"${2 * windowMinutes} minutes"
    val (lw, rw) =
      if (l.isStreaming) (l.withWatermark("l_ts", wm),
        r.withWatermark("r_ts", wm))
      else (l, r)
    val range = expr(s"INTERVAL $windowMinutes MINUTES")
    lw.join(rw,
        col(key) === col("__rk") &&
          col("r_ts") >= col("l_ts") - range &&
          col("r_ts") <= col("l_ts") + range)
      .select(col("event_id"), col(key),
        unix_millis(col("r_ts")).as("right_ts_ms"))
  }

  /** Incremental near-dup detection over a document stream: per
    * micro-batch, MinHash signatures are computed for the batch's docs and
    * LSH band buckets are joined against the accumulated bucket store —
    * each arriving doc is checked against everything ingested before it
    * (and its own batch), then its buckets are appended to the store.
    *
    * This is the streaming shape of [[graft.dedup.Dedup.minHashDedup]]: the
    * expensive per-doc work (tokenize → shingle → hash → signature)
    * happens once per doc at ingest; the candidate check is a bucket
    * equi-join against the store, cost ∝ colliding buckets, never a
    * corpus-wide rescan. At scale the store is a bucketed Delta table; here
    * an in-memory accumulator keyed the same way.
    *
    * Returns the verified near-dup pairs (a = earlier doc id, b = newer)
    * discovered across all processed batches, with exact Jaccard ≥
    * `threshold` verified on the docs' shingle sets.
    */
  final class IncrementalDedup(threshold: Double = 0.5,
      numHashes: Int = 64, bands: Int = 16, k: Int = 3,
      maxBucketSize: Int = graft.dedup.Dedup.DefaultMaxBucketSize) {
    import graft.dedup.Dedup
    private var bucketStore: Option[DataFrame] = None
    private var shingleStore: Option[DataFrame] = None
    // verified pairs stay a checkpointed DataFrame like the bucket store:
    // on a duplicate-heavy corpus the pair set is O(corpus) and must not
    // accumulate on the driver (at scale: a Delta table append per batch)
    private var pairStore: Option[DataFrame] = None

    /** Release the RDD blocks behind a superseded materialization so
      * executor storage stays flat across batches (each batch's new store
      * re-checkpoints the union; the old checkpoint is then dead weight).
      * Materialization goes through [[graft.Checkpoints]] — stores rotate
      * via localCheckpoint by default, or reliable checkpoints under the
      * graft.checkpoint.reliable knob (executor-loss resilience).
      */
    private def release(df: DataFrame): Unit =
      df.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.foreach(_.unpersist(false))

    /** Process one micro-batch of (doc_id, text) rows. */
    def ingest(batch: DataFrame): Unit = {
      import graft.Checkpoints.materialize
      val spark = batch.sparkSession
      val sh = materialize(Dedup.shingleHashes(batch, k))
      val sigs = Dedup.minHashSignatures(batch, numHashes, k, pre = Some(sh))
      // same banding as the batch path (shared helper keeps the incremental
      // candidate set bit-identical to Dedup.lshCandidates)
      val (bucketRows, joinKeys) = Dedup.bandBuckets(sigs, numHashes, bands)
      val newBuckets = materialize(bucketRows)
      // candidates: new docs vs the store (cross-batch) ∪ within-batch
      val store = bucketStore.map(_.unionByName(newBuckets))
        .getOrElse(newBuckets)
      // the batch path's Σ bucket² skew guard, incremental form: once a
      // band bucket's STORE population exceeds the cap, this and later
      // batches stop pairing through it (earlier batches' verified pairs
      // stand — an append-only pair log cannot retroactively un-pair, so
      // the guard is monotone rather than global like Dedup.lshCandidates)
      val guarded = Dedup.capBuckets(store, joinKeys, maxBucketSize)
      // canonicalize (a=min, b=max): a stored doc may carry the LARGER id
      val cands = guarded.withColumnRenamed("doc_id", "a")
        .join(newBuckets.withColumnRenamed("doc_id", "b"), joinKeys)
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .distinct()
      val allShingles = shingleStore.map(_.unionByName(sh)).getOrElse(sh)
      val sets = allShingles.groupBy("doc_id")
        .agg(collect_set(col("sh")).as("shs"))
      val verified = cands
        .join(sets.select(col("doc_id").as("a"), col("shs").as("sh_a")), "a")
        .join(sets.select(col("doc_id").as("b"), col("shs").as("sh_b")), "b")
        .select(col("a"), col("b"),
          (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            (size(col("sh_a")) + size(col("sh_b")) -
              size(array_intersect(col("sh_a"), col("sh_b")))))
            .as("jaccard"))
        .filter(col("jaccard") >= threshold)
      val (oldB, oldS, oldP) = (bucketStore, shingleStore, pairStore)
      pairStore = Some(materialize(pairStore.map(_.unionByName(verified))
        .getOrElse(verified)))
      bucketStore = Some(materialize(store))
      shingleStore = Some(materialize(allShingles))
      oldB.foreach(release); oldS.foreach(release); oldP.foreach(release)
    }

    /** All near-dup pairs discovered so far, as a distributed frame
      * (a|b|jaccard) — the serving surface at scale.
      */
    def nearDupsDf: Option[DataFrame] = pairStore

    /** Driver-side view of [[nearDupsDf]] (tests / small result sets). */
    def nearDups: Seq[(Long, Long, Double)] =
      pairStore.map(_.collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2)))).getOrElse(Seq.empty)
  }

  /** Streaming graph ingestion (SURVEY §2.7 extension): a readStream of
    * events appended into a live [[graft.cypher.CypherSession]] graph via
    * `foreachBatch` — each micro-batch becomes node rows (one per event)
    * and next-event edges within the batch's users (window lead). At scale
    * the append is a Delta transaction per micro-batch; queries against the
    * session see each committed batch.
    */
  def graphIngest(spark: SparkSession, dir: String,
      session: graft.cypher.CypherSession): Unit = {
    import graft.cypher.Values
    val stream = normalizeTs(spark.readStream
      .schema(eventSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val nodes = batch.select(
          col("event_id").as("id"),
          col("event_type").as("label"),
          map(lit("value"), Values.vFloat(col("value")),
            lit("user"), Values.vInt(col("user_id"))).as("props"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val edges = batch
          .withColumn("next", lead(col("event_id"), 1).over(w))
          .filter(col("next").isNotNull)
          .select(col("event_id").as("id"),
            col("event_id").as("src"), col("next").as("dst"),
            lit("NEXT").as("reltype"),
            map().cast(Values.propsType).as("props"))
        session.append(nodes, edges)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Run `transform` over the events parquet as a real streaming query into
    * a named memory sink; returns the sink contents. Complete-mode (windowed
    * aggregation).
    */
  def runStreamOnce(spark: SparkSession, dir: String,
      transform: DataFrame => DataFrame, sinkName: String,
      outputMode: String = "complete"): DataFrame = {
    // FileStreamSource needs a directory; select the single file via glob
    val stream = normalizeTs(spark.readStream
      .schema(eventSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))
    val q = transform(stream).writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(sinkName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(sinkName)
  }
}
