package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor escalation data generator: derives an sfN-equivalent
  * dataset (`copies` × the source SF) by replicating each fact table with
  * disjoint key spaces per copy. Used by the bench's scaling-ratio section
  * only — correctness always runs against the driver-provided
  * `/root/testdata`.
  *
  * Shapes preserved so per-query scaling ratios are meaningful:
  *   - dimension tables (region, nation) stay fixed — dims don't scale;
  *   - fact keys get per-copy offsets with foreign keys remapped
  *     consistently (joins stay 1:N with the same fan-out);
  *   - document text is deterministically word-permuted per copy so the
  *     copies are NOT near-duplicates of each other (a naive text copy
  *     would turn the dedup benchmarks into pair explosions — measuring a
  *     harder problem, not a bigger one);
  *   - embeddings get a per-copy deterministic perturbation, preserving
  *     approximate norms.
  *
  * Key offsets: `OffBig` must clear every edge-id range GraphBuilder
  * derives from orderkeys (`id = o_orderkey + 0` for PLACED, `id =
  * l_orderkey*8 + … + 400M` for CONTAINS) — at 100M a copy-1 orderkey
  * landed inside the IN_NATION edge-id range (100M..290M) and var-len
  * edge-uniqueness would silently drop paths. 1e9 keeps every per-copy
  * node/edge id space disjoint for up to ~10^8-key base tables.
  */
object ScaleData {

  val OffSmall = 10000000L // custkey/suppkey/partkey/user_id/vec_id space
  val OffBig = 1000000000L // orderkey/event_id/doc_id space

  /** Small-key offset valid for up to 100 copies: GraphBuilder's node-id
    * bases are 1e8 apart (`CUST_BASE=0`, `ORDER_BASE=1e8`, …), so per-copy
    * custkeys must stay below 1e8 — at the default `OffSmall` (1e7) copy
    * 10's custkeys would land inside the Order id range and the derived
    * graph would silently merge nodes. 1e6 keeps 100 copies × 15k-key base
    * tables disjoint AND below every base boundary.
    */
  val OffSmall100 = 1000000L

  def generate(spark: SparkSession, src: String, out: String,
      copies: Int): Unit =
    generate(spark, src, out, copies,
      if (copies > 10) OffSmall100 else OffSmall)

  /** Marker recording which (src, copies) produced an output dir. */
  private def marker(out: String) = new java.io.File(s"$out/_source_sf")

  /** Generate unless `out` already holds this exact (src, copies) — a
    * stale dir generated from a DIFFERENT bench SF would otherwise be
    * reused silently and every "100×" number would measure the wrong
    * scale (the r13 bench-at-sf0.01 run left such a dir behind).
    */
  def ensure(spark: SparkSession, src: String, out: String,
      copies: Int): Unit = {
    val want = s"$src x$copies"
    val m = marker(out)
    val have = if (m.exists())
      new String(java.nio.file.Files.readAllBytes(m.toPath)).trim else ""
    if (!new java.io.File(s"$out/lineitem.parquet").exists() ||
        have != want) {
      generate(spark, src, out, copies)
      java.nio.file.Files.write(m.toPath, want.getBytes)
    }
  }

  def generate(spark: SparkSession, src: String, out: String,
      copies: Int, offSmall: Long): Unit = {
    // loud guard instead of silent key collisions: per-copy small-key
    // spaces must stay below GraphBuilder's 1e8 id-base stride, and base
    // keys must fit inside one copy's offset window (driver testdata keys
    // are ≤20k; anything larger needs a bigger offSmall scheme)
    require(copies.toLong * offSmall <= 100000000L,
      s"copies ($copies) x offSmall ($offSmall) crosses the 1e8 " +
        "GraphBuilder id-base stride - replicated keys would collide")
    val maxBase = spark.read.parquet(s"$src/customer.parquet")
      .agg(max(col("c_custkey"))).head.getLong(0)
    require(maxBase < offSmall,
      s"base custkeys reach $maxBase >= offSmall $offSmall - copies " +
        "would overlap")

    def rep(t: String)(shift: (DataFrame, Long) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$t.parquet")
      val scaled = (0 until copies).map(c => shift(base, c.toLong))
        .reduce(_ unionByName _)
      val parts = math.max(spark.sparkContext.defaultParallelism,
        copies * base.rdd.getNumPartitions min 64)
      scaled.repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaledata] $t -> $out x$copies")
    }

    // dimensions: fixed
    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaledata] $t -> $out (unscaled dim)")
    }
    rep("customer")((df, c) => df
      .withColumn("c_custkey", col("c_custkey") + lit(c * offSmall)))
    rep("supplier")((df, c) => df
      .withColumn("s_suppkey", col("s_suppkey") + lit(c * offSmall)))
    rep("part")((df, c) => df
      .withColumn("p_partkey", col("p_partkey") + lit(c * offSmall)))
    rep("orders")((df, c) => df
      .withColumn("o_orderkey", col("o_orderkey") + lit(c * OffBig))
      .withColumn("o_custkey", col("o_custkey") + lit(c * offSmall)))
    rep("lineitem")((df, c) => df
      .withColumn("l_orderkey", col("l_orderkey") + lit(c * OffBig))
      .withColumn("l_partkey", col("l_partkey") + lit(c * offSmall))
      .withColumn("l_suppkey", col("l_suppkey") + lit(c * offSmall)))
    rep("events")((df, c) => df
      .withColumn("event_id", col("event_id") + lit(c * OffBig))
      .withColumn("user_id", col("user_id") + lit(c * offSmall)))
    rep("documents")((df, c) =>
      (if (c == 0L) df
       else df.withColumn("text",
         // deterministic per-copy word permutation: order-sensitive
         // shingles become disjoint between copies, so near-dup density
         // stays that of the base corpus
         array_join(
           array_sort(transform(split(col("text"), "\\s+"),
             w => struct(xxhash64(w, col("doc_id") + lit(c)).as("h"),
               w.as("w")))).getField("w"),
           " ")))
        .withColumn("doc_id", col("doc_id") + lit(c * OffBig))
        .withColumn("n_chars", length(col("text")).cast("long")))
    rep("embeddings")((df, c) =>
      (if (c == 0L) df
       else df.withColumn("embedding",
         transform(col("embedding"),
           (v, i) => v * (lit(1.0f) +
             (pmod(i + lit(c * 31), lit(13)) - lit(6)).cast("float") *
               lit(0.015f)))))
        .withColumn("vec_id", col("vec_id") + lit(c * offSmall)))
  }
}
