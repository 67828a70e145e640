package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, random-hyperplane LSH
  * bucketing and IVF cells as the scale paths (candidates ∝ bucket/cell
  * sizes, not n²).
  *
  * Dot products compile to the native codegen'd
  * [[graft.plans.DotProduct]] expression — no UDFs, deterministic
  * summation order, reproducible in the DuckDB oracle.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision — the codegen'd [[graft.plans.DotProduct]]
    * expression (requires [[graft.plans.GraftExtensions]] on the session;
    * same semantics and summation order as the HOF form
    * `aggregate(zip_with(a, b, _*_), 0d, _+_)` it replaces).
    */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a.cast("array<double>"), b.cast("array<double>"))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for the `queries` subset against the full corpus.
    * Norms are precomputed per side; ranking uses the similarity rounded to
    * 5 dp with the neighbor id as tiebreak, so the result is stable across
    * engines/summation orders.
    *
    * Scale: queries × corpus partition-parallel brute force — right answer
    * for small query batches; for query=corpus use [[lshBuckets]].
    *
    * API CONTRACT: `queries` must be a SMALL batch — it is broadcast
    * unconditionally (the 100 TB orientation: the corpus streams, the
    * query batch ships), so a caller passing a large frame gets a broadcast
    * failure/driver OOM instead of Catalyst's size-based fallback. Batches
    * up to Spark's broadcast comfort zone (tens of MB) are fine; anything
    * bigger belongs on [[annTopK]]/[[lshBuckets]].
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    graft.plans.GraftExtensions.ensureFunctions(corpus.sparkSession)
    // pre-cast each embedding to array<double> ONCE per row: the per-pair
    // dot otherwise re-casts (allocates + converts) both arrays for every
    // (query, corpus) pair — |q|·|c| array materializations instead of
    // |q|+|c| (float→double is exact, so results are bit-identical)
    val c = parallelized(corpus).select(col("vec_id").as("b"),
      col("embedding").cast("array<double>").as("emb_b"),
      norm(col("embedding")).as("norm_b"))
    val q = queries.select(col("vec_id").as("a"),
      col("embedding").cast("array<double>").as("emb_a"),
      norm(col("embedding")).as("norm_a"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("a").orderBy(col("sim").desc, col("b"))
    // corpus STREAMS, query batch broadcasts — the 100 TB orientation (a
    // corpus never broadcasts; a query batch is small by contract). The
    // previous shape let Catalyst broadcast the corpus and stream the
    // 50-row query side, which also serialized the whole dot-product pass
    // onto the query side's single input partition.
    c.join(broadcast(q), q("a") =!= c("b"))
      .select(col("a"), col("b"),
        round(dot(col("emb_a"), col("emb_b")) /
          (col("norm_a") * col("norm_b")), 5).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("a"), col("b"), col("sim"), col("rank").cast("int").as("rank"))
  }

  /** Spread a compute-heavy pass across the cluster when the source layout
    * under-supplies partitions (one small parquet file reads as ONE
    * partition — every dot product would run on one core). Same shape as
    * [[graft.dedup.Dedup.parallelized]]; well-partitioned inputs (the
    * 100 TB case) pass through untouched.
    */
  private def parallelized(vectors: DataFrame): DataFrame = {
    val cores = vectors.sparkSession.sparkContext.defaultParallelism.toLong
    // scale-adaptive spread count — see graft.dedup.Dedup.parallelized:
    // ~128 KB of estimated bytes per partition small, ~64 MB floored at
    // the cluster's cores large; results invariant to the count
    val bytes = vectors.queryExecution.optimizedPlan.stats.sizeInBytes
      .min(BigInt(Long.MaxValue)).toLong.max(1L)
    val want = math.max(2L,
      math.min(bytes >> 17, math.max(cores, bytes >> 26))).toInt
    if (vectors.queryExecution.toRdd.getNumPartitions >= math.max(want / 2, 2))
      vectors
    else vectors.repartition(want)
  }

  /** splitmix64-derived uniform in [-1, 1] — deterministic hyperplane
    * component (t, p, j), computed driver-side (a literal per plane; nothing
    * random ships to executors, reproducible cluster-wide — and inlineable
    * into the DuckDB oracle, which is what makes the LSH operators
    * hash-checkable end-to-end).
    */
  def planeCoef(t: Int, p: Int, j: Int): Double = {
    var z = (t.toLong << 42) + (p.toLong << 21) + j + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    z.toDouble / Long.MaxValue.toDouble
  }

  /** Random-hyperplane LSH: for each of `tables` hash tables, a `bits`-bit
    * signature (sign bits of projections onto deterministic pseudo-random
    * hyperplanes). Each plane is a *literal* coefficient array and the
    * projection is `aggregate(zip_with(plane, embedding, *), +)` — a loop in
    * the generated code, not dim unrolled terms (an unrolled variant blows
    * the JVM method-size limit at dim≥64 and falls back to interpreted
    * eval). Multiple tables are the recall knob:
    * P(candidate) = 1-(1-p^bits)^tables.
    *
    * Returns (vec_id, table, bucket) — one row per table.
    */
  def lshBuckets(vectors: DataFrame, bits: Int = 8,
      tables: Int = 8, dimHint: Int = -1): DataFrame = {
    graft.plans.GraftExtensions.ensureFunctions(vectors.sparkSession)
    // dim from the caller or a LIMIT-1 probe (plan-pruned single row) —
    // never a full-scan driver job per invocation
    val dim =
      if (dimHint > 0) dimHint
      else vectors.select(size(col("embedding"))).limit(1).head().getInt(0)
    // pre-cast the embedding to array<double> once per ROW: every one of
    // the bits×tables projections dots against it, and relying on the
    // per-projection implicit cast makes the row pay bits×tables array
    // conversions instead of one (float→double is exact — same buckets)
    val vecs = parallelized(vectors)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("__emb"))
    val tableCols = (0 until tables).map { t =>
      val planeBits = (0 until bits).map { p =>
        val plane = typedlit((0 until dim).map(j => planeCoef(t, p, j)))
        val proj = dot(plane, col("__emb"))
        when(proj >= 0, shiftleft(lit(1L), p)).otherwise(0L)
      }
      struct(lit(t).as("table"),
        planeBits.reduce((a, b) => a.bitwiseOR(b)).as("bucket"))
    }
    vecs.select(col("vec_id"),
      explode(array(tableCols: _*)).as("tb"))
      .select(col("vec_id"), col("tb.table"), col("tb.bucket"))
  }

  /** IVF (inverted-file) index: k-means cell assignment.
    *
    * Centroids: deterministic id-stride sample refined by `iters` Lloyd
    * steps — each step is one broadcast-join (vectors ⋈ centroids, k rows
    * broadcast) + one groupBy(cell) mean, both map-side combinable. At
    * 100 TB: the sample fits the driver, assignment is a broadcast argmin
    * over the full scan, the index is just a `cell` column (bucket/partition
    * key on write — queries then prune cells at the source).
    *
    * Returns (centroids: cell|centroid, assignments: vec_id|cell).
    */
  def ivfIndex(vectorsRaw: DataFrame, nlist: Int = 16, iters: Int = 2):
      (DataFrame, DataFrame) = {
    val spark = vectorsRaw.sparkSession
    // one cast per row, not one per (row × centroid) in the argmin below
    // (float→double is exact — identical assignments)
    val vectors = vectorsRaw.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val n = vectors.count()
    val stride = math.max(n / nlist, 1L)
    var centroids = vectors
      .filter(col("vec_id") % stride === 0)
      .orderBy("vec_id").limit(nlist) // deterministic seed subset
      .select((col("vec_id") / stride).cast("int").as("cell"),
        col("embedding").as("centroid"))
    def assign(cents: DataFrame): DataFrame = {
      // argmin_c ‖x−c‖² ≡ argmin_c (‖c‖² − 2x·c): the per-row ‖x‖² term is
      // rank-invariant, and both dots are codegen'd graft_dot loops.
      // min_by groupBy, not a row_number window: partial aggregation
      // collapses the n×nlist expansion to one candidate per vec_id
      // map-side (all nlist copies are co-partitioned by the broadcast
      // cross join), so only n rows shuffle per Lloyd step; (d2, cell)
      // ordering keeps the tie-break deterministic
      val scored = cents.withColumn("cn2",
        dot(col("centroid"), col("centroid")))
      val d2 = col("cn2") - lit(2.0) * dot(col("embedding"), col("centroid"))
      vectors.crossJoin(broadcast(scored))
        .select(col("vec_id"), col("embedding"), col("cell"), d2.as("d2"))
        .groupBy("vec_id")
        .agg(min_by(struct(col("cell"), col("embedding")),
          struct(col("d2"), col("cell"))).as("__w"))
        .select(col("vec_id"), col("__w.embedding").as("embedding"),
          col("__w.cell").as("cell"))
    }
    for (_ <- 0 until iters) {
      val assigned = assign(centroids)
      // per-dimension mean: explode(dim) → partial-aggregated avg per
      // (cell, pos) → re-assemble ordered array (collect_list is tiny here:
      // nlist × dim rows total)
      val byDim = assigned
        .select(col("cell"), posexplode(col("embedding")))
        .groupBy("cell", "pos")
        .agg(avg(col("col").cast("double")).as("m"))
      centroids = byDim.groupBy("cell")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"))
    }
    val finalAssign = assign(centroids).select("vec_id", "cell")
    (centroids, finalAssign)
  }

  /** IVF ANN top-k: each query probes its `nprobe` nearest cells; exact
    * cosine rank within the probed cells' vectors only (candidates ∝
    * nprobe/nlist of the corpus, never n²).
    */
  def ivfTopK(vectors: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 2): DataFrame = {
    graft.plans.GraftExtensions.ensureFunctions(vectors.sparkSession)
    val (centroids, assign) = ivfIndex(vectors, nlist, iters)
    val scoredCents = centroids.withColumn("cn2",
      dot(col("centroid"), col("centroid")))
    val qdist2 =
      col("cn2") - lit(2.0) * dot(col("embedding"), col("centroid"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("a").orderBy(col("d2"), col("cell"))
    val probes = queries.select(col("vec_id").as("a"),
        col("embedding").cast("array<double>").as("embedding"))
      .crossJoin(broadcast(scoredCents))
      .select(col("a"), col("cell"), qdist2.as("d2"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select("a", "cell")
    val cands = probes
      .join(assign.withColumnRenamed("vec_id", "b"), "cell")
      .filter(col("a") =!= col("b"))
      .select("a", "b").distinct()
    val va = queries.select(col("vec_id").as("a"),
      col("embedding").cast("array<double>").as("emb_a"),
      norm(col("embedding")).as("norm_a"))
    val vb = vectors.select(col("vec_id").as("b"),
      col("embedding").cast("array<double>").as("emb_b"),
      norm(col("embedding")).as("norm_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("a").orderBy(col("sim").desc, col("b"))
    cands.join(va, "a").join(vb, "b")
      .select(col("a"), col("b"),
        round(dot(col("emb_a"), col("emb_b")) /
          (col("norm_a") * col("norm_b")), 5).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("a"), col("b"), col("sim"), col("rank").cast("int").as("rank"))
  }

  /** ANN top-k: candidate pairs = docs sharing any (table, bucket), then
    * exact cosine rank within candidates. Recall measured against brute
    * force in PipelineSpec.
    */
  def annTopK(vectors: DataFrame, k: Int, bits: Int = 8,
      tables: Int = 8,
      maxBucketSize: Int = graft.dedup.Dedup.AutoBucketSize)
      : DataFrame = {
    graft.plans.GraftExtensions.ensureFunctions(vectors.sparkSession)
    // same Σ bucket² guard as every other LSH candidate join (a degenerate
    // bucket — e.g. zero vectors identical across tables — would make the
    // self-join quadratic); members keep their other tables' chances.
    // Cap derived from corpus size unless given explicitly (Dedup.autoCapFor)
    val buckets = graft.dedup.Dedup.capBuckets(
      lshBuckets(vectors, bits, tables), Seq("table", "bucket"),
      graft.dedup.Dedup.resolveCapFor(maxBucketSize, vectors))
    val l = buckets.select(col("table"), col("bucket"), col("vec_id").as("a"))
    val r = buckets.select(col("table"), col("bucket"), col("vec_id").as("b"))
    val cands = l.join(r, Seq("table", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
      // symmetric closure: rank from both endpoints
      .select(col("a"), col("b"))
    val sym = cands.unionByName(
      cands.select(col("b").as("a"), col("a").as("b")))
    // cast once per row, not per candidate pair in the verify join
    val v = vectors.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"),
      norm(col("embedding")).as("nrm"))
    val va = v.select(col("vec_id").as("a"), col("embedding").as("emb_a"),
      col("nrm").as("norm_a"))
    val vb = v.select(col("vec_id").as("b"), col("embedding").as("emb_b"),
      col("nrm").as("norm_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("a").orderBy(col("sim").desc, col("b"))
    sym.join(va, "a").join(vb, "b")
      .select(col("a"), col("b"),
        round(dot(col("emb_a"), col("emb_b")) /
          (col("norm_a") * col("norm_b")), 5).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("a", "b", "sim", "rank")
  }
}
