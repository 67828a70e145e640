package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * Scale notes: each table is a plain parquet directory/file; at 100 TB these
  * would be partitioned/bucketed Delta-style tables. All loaders go through
  * `spark.read.parquet` so Catalyst owns predicate pushdown + column pruning —
  * callers must NOT `.cache()` here (the scan should re-prune per query).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any scale factor
    * (region=5, nation=25 rows always; supplier/part/customer grow with SF but
    * stay far below lineitem/orders — at 100 TB lineitem, nation/region are
    * still KB-sized).
    */
  val broadcastable: Set[String] = Set("region", "nation")

  /** Resolved-relation cache: one `spark.read.parquet` resolution per
    * (session, path, content version). Resolution is pure METADATA work —
    * file listing + parquet schema inference — but Spark re-runs it from
    * scratch on every `read.parquet` call, and a rule-timing profile
    * (DiagCold, r15) showed `ResolveDataSource` as the single largest
    * cold-query planning cost (~260 ms per table per query). A production
    * deployment reads table schemas from a catalog/metastore once — this
    * cache is that catalog. It holds ONLY the analyzed relation (schema +
    * file index): every execution still scans parquet, so no results or
    * data are reused across runs. Keyed by the path's lastModified so a
    * rewritten dataset (ScaleData regeneration, tests) resolves fresh;
    * weak-keyed per session so stopped sessions drop their entries.
    */
  private val relationCache = new java.util.WeakHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[(String, Long, Long), DataFrame]]()

  /** Drop the session's cached relations — Bench.isolate() calls this for
    * its catalog-cold probe, and tests that rewrite a dataset in-place can
    * force re-resolution without relying on mtime granularity.
    */
  def clearRelationCache(spark: SparkSession): Unit =
    relationCache.synchronized { relationCache.remove(spark) }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val f = new java.io.File(path)
    // mtime alone has 1 s granularity on some filesystems — a same-second
    // rewrite would serve a stale file index; length catches the common
    // regeneration case (and a missing path keys as (0, 0), re-probed on
    // every call until the file exists)
    val key = (path, f.lastModified, f.length)
    val m = relationCache.synchronized {
      // the cached DataFrame strongly references its session, which would
      // pin the weak key forever — purge stopped sessions' entries here so
      // a long-lived multi-session JVM (tests) doesn't leak them
      val it = relationCache.keySet.iterator
      while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
      var c = relationCache.get(spark)
      if (c == null) {
        c = scala.collection.concurrent.TrieMap.empty
        relationCache.put(spark, c)
      }
      c
    }
    m.getOrElseUpdate(key, spark.read.parquet(path))
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events` with `ts` normalized to epoch-nanos long regardless of how the
    * generator stored it (timestamp[ns] read as long via nanosAsLong, or
    * timestamp[us] read as TIMESTAMP_NTZ). All downstream event-time
    * arithmetic (session gaps, band buckets, interval joins) is integer
    * nanos — one conversion at the load boundary, pushed into the scan's
    * projection, keeps that code storage-agnostic.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{TimestampType, TimestampNTZType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case TimestampType | TimestampNTZType =>
        raw.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
