package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, random-hyperplane LSH
  * bucketing as the scale path (candidates ∝ bucket sizes, not n²).
  *
  * Dot products are pure Column expressions (`zip_with` + `aggregate`) in
  * double precision — no UDFs, reproducible in the DuckDB oracle.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

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
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("b"), col("embedding").as("emb_b"),
      norm(col("embedding")).as("norm_b"))
    val q = queries.select(col("vec_id").as("a"), col("embedding").as("emb_a"),
      norm(col("embedding")).as("norm_a"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("a").orderBy(col("sim").desc, col("b"))
    q.join(c, q("a") =!= c("b"))
      .select(col("a"), col("b"),
        round(dot(col("emb_a"), col("emb_b")) /
          (col("norm_a") * col("norm_b")), 5).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("a"), col("b"), col("sim"), col("rank").cast("int").as("rank"))
  }

  /** splitmix64-derived uniform in [-1, 1] — deterministic hyperplane
    * component (t, p, j), computed driver-side (a literal per plane; nothing
    * random ships to executors, reproducible cluster-wide).
    */
  private def planeCoef(t: Int, p: Int, j: Int): Double = {
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
      tables: Int = 8): DataFrame = {
    val dim = vectors.select(size(col("embedding"))).head().getInt(0)
    val tableCols = (0 until tables).map { t =>
      val planeBits = (0 until bits).map { p =>
        val plane = typedlit((0 until dim).map(j => planeCoef(t, p, j)))
        val proj = aggregate(
          zip_with(plane, col("embedding"), (c, x) => c * x.cast("double")),
          lit(0.0), (acc, x) => acc + x)
        when(proj >= 0, shiftleft(lit(1L), p)).otherwise(0L)
      }
      struct(lit(t).as("table"),
        planeBits.reduce((a, b) => a.bitwiseOR(b)).as("bucket"))
    }
    vectors.select(col("vec_id"),
      explode(array(tableCols: _*)).as("tb"))
      .select(col("vec_id"), col("tb.table"), col("tb.bucket"))
  }

  /** ANN top-k: candidate pairs = docs sharing any (table, bucket), then
    * exact cosine rank within candidates. Recall measured against brute
    * force in PipelineSpec.
    */
  def annTopK(vectors: DataFrame, k: Int, bits: Int = 8,
      tables: Int = 8): DataFrame = {
    val buckets = lshBuckets(vectors, bits, tables)
    val l = buckets.select(col("table"), col("bucket"), col("vec_id").as("a"))
    val r = buckets.select(col("table"), col("bucket"), col("vec_id").as("b"))
    val cands = l.join(r, Seq("table", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
      // symmetric closure: rank from both endpoints
      .select(col("a"), col("b"))
    val sym = cands.unionByName(
      cands.select(col("b").as("a"), col("a").as("b")))
    val v = vectors.select(col("vec_id"), col("embedding"),
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
