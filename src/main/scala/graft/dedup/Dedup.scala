package graft.dedup

import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness: exact (hash groupBy), n-gram Jaccard (exact similarity on
  * candidate pairs), MinHash+LSH (scalable near-dup candidate generation),
  * SimHash (bit-signature near-dup).
  *
  * Scale shape: exact dedup is one shuffle on the content hash. MinHash/LSH
  * is the 100 TB path — per-doc signatures (narrow shuffle on shingle
  * explode), then a band-bucket self-join that only pairs docs sharing a
  * bucket, never the full cross product.
  */
object Dedup {

  /** Spread a compute-heavy expansion input across the cluster when the
    * source layout under-supplies partitions (a single small parquet file
    * reads as ONE partition — tokenize/shingle/hash would run on one core).
    * The input shuffle moves raw doc bytes, trivial next to the expansion
    * work it parallelizes; already-well-partitioned inputs (the 100 TB
    * case: thousands of files) pass through untouched.
    */
  private def parallelized(docs: DataFrame): DataFrame = {
    val cores = docs.sparkSession.sparkContext.defaultParallelism.toLong
    // scale-adaptive spread count (guide §2), same derivation as the
    // pagerank loop: ~128 KB of estimated input bytes per partition for
    // small corpora (below that, per-task fixed costs — scheduling,
    // shuffle-block commit — dominate the expansion work being spread),
    // ~64 MB partitions floored at the cluster's cores for large ones.
    // Results are invariant to the count: every consumer aggregates per
    // doc_id with order-independent functions. A KB-scale corpus no longer
    // fans out to `cores` near-empty shuffle blocks per exchange (measured
    // r16: the spread's own exchange plus every downstream per-doc stage
    // carried 32 map tasks of ~18 KB each at sf0.1).
    val bytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
      .min(BigInt(Long.MaxValue)).toLong.max(1L)
    val want = math.max(2L,
      math.min(bytes >> 17, math.max(cores, bytes >> 26))).toInt
    // toRdd, not .rdd: reads the physical partitioning off the already-
    // planned query without building the extra row-deserializer plan
    if (docs.queryExecution.toRdd.getNumPartitions >= math.max(want / 2, 2))
      docs
    // HASH on doc_id, not round-robin: every consumer of this spread
    // aggregates per doc (MinHash signature mins, SimHash bit sums,
    // repetition counts, Jaccard shingle sets), so keying the one input
    // shuffle on doc_id lets those groupBys run exchange-free on the
    // exploded stream — the shuffle that otherwise moved the post-explode
    // partial-aggregate rows disappears (guide §2.4: operations keyed the
    // same way share one exchange). doc_id is unique, so the spread is
    // uniform; aggregate results are order-independent (min / sum /
    // count / set-intersection sizes), so values are unchanged.
    else docs.repartition(want, col("doc_id"))
  }

  /** Exact duplicate groups by content hash (md5 — portable to the oracle;
    * at scale use xxhash64 for speed, same shape).
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id"))

  /** Keep one representative per exact-duplicate group. */
  def exactDedup(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Distinct word-k-gram shingles per doc: (doc_id, shingle). */
  def shingles(docs: DataFrame, k: Int = 3): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val grams = transform(
      sequence(lit(1), greatest(size(toks) - (k - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(k))))
    docs.select(col("doc_id"), explode(grams).as("shingle")).distinct()
  }

  /** Distinct 62-bit-hashed shingles per doc: (doc_id, sh). Strings hash
    * once here via the engine-portable [[graft.plans.PolyHash]]
    * (`graft_polyhash`); every downstream pass (signatures, jaccard joins)
    * works on longs — smaller shuffles, no repeated string hashing, and the
    * DuckDB oracle reproduces the identical values. Collision odds
    * ~|shingles|²/2⁶² are negligible against any sampling error.
    */
  def shingleHashes(docs: DataFrame, k: Int = 3): DataFrame =
    // hash BEFORE the distinct: the dedup shuffle then moves 8-byte longs
    // instead of shingle strings (same result modulo the 2^-62 collision
    // odds already accepted for the hash domain)
    shingleHashesRaw(docs, k).distinct()

  /** [[shingleHashes]] WITHOUT the per-doc dedup — (doc_id, sh) with
    * repeats. Feeding idempotent consumers (min-aggregation in
    * [[minHashSignatures]]) from here skips the distinct's full shuffle of
    * the exploded shingle table: the groupBy's map-side partial min folds
    * duplicates in place, so the only shuffle moves one 65-long row per
    * (doc × map partition).
    */
  def shingleHashesRaw(docs: DataFrame, k: Int = 3): DataFrame = {
    graft.plans.GraftExtensions.ensureFunctions(docs.sparkSession)
    // one codegen'd expression for the whole tokenize→window→hash pass —
    // see [[graft.plans.ShingleHashes]] for why the composed
    // transform(...)/concat_ws/slice pipeline (value-identical) is not
    // used: higher-order functions are CodegenFallback and re-tokenized
    // per window position
    parallelized(docs).select(col("doc_id"),
      explode(call_function("graft_shingle_hashes", col("text"), lit(k)))
        .as("sh"))
  }

  /** splitmix64 — deterministic per-hash-function affine constants. */
  private def mix(i: Long): Long = {
    var z = i + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** MinHash modulus and the (a_i, b_i) affine constants — shared with the
    * SQL oracle generator so both engines compute identical signatures.
    */
  val MinHashP: Long = 2147483647L // 2^31 - 1 (prime)
  def minHashConstants(numHashes: Int): Seq[(Long, Long)] =
    (0 until numHashes).map { i =>
      ((mix(2L * i) & 0x7FFFFFFFL) | 1L, mix(2L * i + 1) & 0x7FFFFFFFL)
    }

  /** Exact n-gram Jaccard similarity for the given candidate pairs
    * (columns a, b). |A∩B| via hashed-shingle join, |A∪B| = |A|+|B|-|A∩B|.
    * Pass a precomputed (cached) [[shingleHashes]] frame via `pre` to share
    * the shingle pass with signature computation.
    */
  def jaccard(docs: DataFrame, pairs: DataFrame, k: Int = 3,
      pre: Option[DataFrame] = None,
      minJaccard: Option[Double] = None): DataFrame = {
    graft.plans.GraftExtensions.ensureFunctions(docs.sparkSession)
    // candidates touch few docs (LSH keeps Σ bucket² small): broadcast
    // semi-filter to candidate docs before any shingle work — the
    // tokenize/explode/collect pipeline processes
    // |candidate docs|·|shingles/doc| rows, not the whole corpus
    val docsInPairs = broadcast(
      pairs.select(col("a").as("doc_id"))
        .unionByName(pairs.select(col("b").as("doc_id"))).distinct())
    val sh = pre.map(_.join(docsInPairs, Seq("doc_id"), "left_semi"))
      .getOrElse(shingleHashesRaw(
        docs.join(docsInPairs, Seq("doc_id"), "left_semi"), k))
    // one shuffle: each candidate doc's distinct shingle-hash set as a
    // SORTED array (collect_set dedups in the partial aggregate; one
    // sort_array per DOC amortizes over every pair the doc appears in).
    // |A∩B| is then a per-pair graft_intersect_count — a native two-pointer
    // merge over primitive longs, no per-pair hash-set build or output
    // array the way size(array_intersect(...)) paid (the measured ~2/3 of
    // sf10 minhash time); counts are identical because the inputs are
    // sorted distinct sets
    val sets = sh.groupBy("doc_id")
      .agg(sort_array(collect_set(col("sh"))).as("shs"))
    val inter = call_function("graft_intersect_count",
      col("sh_a"), col("sh_b"))
    val joined = pairs
      .join(sets.select(col("doc_id").as("a"), col("shs").as("sh_a")), "a")
      .join(sets.select(col("doc_id").as("b"), col("shs").as("sh_b")), "b")
    // threshold pre-filter (callers that keep only jaccard ≥ t, e.g.
    // minHashDedup): J = |A∩B|/|A∪B| ≤ min(|A|,|B|)/max(|A|,|B|), so a
    // pair whose size ratio cannot reach the threshold is dropped BEFORE
    // paying the intersection. 1e-5 margin: the emitted value rounds to
    // 5 dp (HALF_UP adds ≤ 5e-6), so every pair that could round to ≥ t
    // survives the filter — result rows are bit-identical
    val prefiltered = minJaccard match {
      case Some(t) => joined.filter(
        least(size(col("sh_a")), size(col("sh_b"))).cast("double") >=
          lit(t - 1e-5) * greatest(size(col("sh_a")), size(col("sh_b"))))
      case None => joined
    }
    prefiltered
      .select(col("a"), col("b"),
        round(inter.cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - inter), 5).as("jaccard"))
  }

  /** MinHash signatures: h_i = min over the doc's shingle-hash set of the
    * affine family `(a_i·x + b_i) mod p`, p = 2³¹−1, constants from
    * splitmix64 — the string hashes once ([[shingleHashes]]); each of the
    * 64 functions is a few long ops inside one map-side-combined groupBy
    * (products < 2⁶², safe under ANSI arithmetic). No UDF, all codegen'd.
    */
  def minHashSignatures(docs: DataFrame, numHashes: Int = 64,
      k: Int = 3, pre: Option[DataFrame] = None): DataFrame = {
    // min is idempotent: duplicate shingles can't change any h_i, so the
    // raw (non-distinct) shingle stream gives bit-identical signatures
    // while the distinct's full shuffle of the exploded table collapses
    // into the groupBy's map-side partial-min combine
    val sh = pre.getOrElse(shingleHashesRaw(docs, k))
    // plain % (one mod), not pmod (two mods + branch): every operand is
    // provably non-negative — sh is the 62-bit PolyHash (two non-negative
    // halves), so sh % p ∈ [0, p), and x·a + b < 2⁶³ stays non-negative —
    // which makes % ≡ pmod bit-for-bit here. The SQL oracle has always
    // used plain % for the same reason; this drops 64 redundant mods +
    // branches per shingle row from the hottest aggregate update loop.
    val x = col("sh") % lit(MinHashP)
    val aggs = minHashConstants(numHashes).zipWithIndex.map {
      case ((a, b), i) =>
        min((x * lit(a) + lit(b)) % lit(MinHashP)).as(s"h$i")
    }
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: split the signature into `bands` bands of
    * `numHashes/bands` rows; docs sharing any band bucket become candidate
    * pairs. Returns distinct (a, b) with a < b.
    *
    * Band-bucket join is the scale win: cost ∝ Σ bucket².
    */
  /** Band-bucket rows for a signature frame: (doc_id, band, k0..k_{r-1})
    * with bucket key = the band's raw signature tuple (portable — no extra
    * hash layer to reproduce in the oracle; equality is what banding
    * needs). Shared by the batch and incremental paths so their candidate
    * sets stay bit-identical. Returns (rows, joinKeys).
    */
  def bandBuckets(signatures: DataFrame, numHashes: Int = 64,
      bands: Int = 16): (DataFrame, Seq[String]) = {
    val rowsPerBand = numHashes / bands
    val keyNames = (0 until rowsPerBand).map(r => s"k$r")
    val bandCols = (0 until bands).map { b =>
      val hs = (0 until rowsPerBand).map { r =>
        col(s"h${b * rowsPerBand + r}").as(s"k$r")
      }
      struct(lit(b).as("band") +: hs: _*)
    }
    val exploded = signatures
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id") +: (col("bb.band") +:
        keyNames.map(n => col(s"bb.$n"))): _*)
    (exploded, "band" +: keyNames)
  }

  /** Default Σ bucket² skew guard, ON out of the box: a 100 TB corpus with
    * mass boilerplate duplication WILL produce degenerate band buckets, and
    * an uncapped default turns the candidate self-join quadratic exactly
    * when the data is worst. 1000 members/bucket bounds any single bucket's
    * contribution to ≤ ~500k candidate pairs while sitting orders of
    * magnitude above organic bucket sizes (sf0.1 p100 is single digits);
    * members of a dropped bucket still meet in the (bands − 1) other bands
    * unless they are boilerplate-identical — which exact dedup upstream
    * removes more cheaply. Pass `maxBucketSize = Int.MaxValue` for the
    * explicit uncapped escape hatch.
    */
  val DefaultMaxBucketSize: Int = 1000

  /** Sentinel: derive the bucket cap from the corpus size at call time
    * (the default for the top-level dedup/ANN entry points — see
    * [[autoCapFor]]).
    */
  val AutoBucketSize: Int = -1

  /** Corpus-derived bucket cap: `max(1000, ⌈√n⌉)`. A bucket of size √n
    * contributes ≤ n/2 candidate pairs, so each degenerate bucket's work
    * stays LINEAR in the corpus instead of quadratic — the cap scales
    * with the data rather than being a constant someone tuned at one SF.
    * The 1000 floor keeps every corpus below 10⁶ docs on the historical
    * constant (and therefore bit-identical to the QUALIFY oracles, which
    * replicate the cap as a literal); past 10⁶ the cap grows as √n, so a
    * 10¹⁰-doc corpus caps buckets at 10⁵ — each bounded to ~5·10⁹ pairs
    * of work spread across the cluster, not a single hot quadratic key.
    */
  def autoCapFor(nDocs: Long): Int =
    math.max(DefaultMaxBucketSize,
      math.ceil(math.sqrt(math.max(nDocs, 0L).toDouble)).toInt)

  /** Resolve [[AutoBucketSize]] against a lazily-counted corpus size
    * (`count` only evaluates when the sentinel is passed — explicit caps
    * never pay the counting job). The count is metadata-cheap on a bare
    * parquet/Delta scan; callers feeding a DERIVED frame (filters, joins)
    * re-execute that upstream plan for the count and should pass an
    * explicit cap instead.
    */
  private[graft] def resolveCap(cap: Int, count: => Long): Int =
    if (cap == AutoBucketSize) autoCapFor(count) else cap

  /** Corpus size for cap derivation WITHOUT re-executing derived upstream
    * plans. The cap only needs one significant digit (`max(1000, ⌈√n⌉)`),
    * so: an exact `count()` only on scan-shaped plans (projection over a
    * relation — metadata-served by parquet/Delta, no row reads); any
    * derived plan (filters, joins, generators) uses Catalyst's propagated
    * size statistics instead — `sizeInBytes / row width`, the same
    * estimate Spark's own broadcast planning trusts. At 100 TB a filtered
    * dedup input would otherwise pay a FULL extra pass of the upstream
    * plan just to pick a cap. PipelineSpec asserts the derived path runs
    * zero jobs.
    */
  private[graft] def capCount(df: DataFrame): Long = {
    import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Project}
    val plan = df.queryExecution.optimizedPlan
    def scanOnly(p: LogicalPlan): Boolean = p match {
      case pr: Project => scanOnly(pr.child)
      case _: LeafNode => true
      case _ => false
    }
    plan.stats.rowCount.map(_.toLong).getOrElse {
      if (scanOnly(plan)) df.count()
      else {
        val width = math.max(plan.output.map(_.dataType.defaultSize).sum, 1)
        (plan.stats.sizeInBytes / width).toLong
      }
    }
  }

  /** [[resolveCap]] with the job-free [[capCount]] corpus size. */
  private[graft] def resolveCapFor(cap: Int, docs: DataFrame): Int =
    if (cap == AutoBucketSize) autoCapFor(capCount(docs)) else cap

  /** The Σ bucket² skew guard, shared by every LSH candidate join (batch
    * minhash, embedding LSH, the incremental streaming store): rows whose
    * bucket (the `keys` tuple) holds more than `cap` members are dropped
    * WHOLE — a degenerate bucket (mass boilerplate collapsing thousands of
    * docs onto one key) would otherwise turn the candidate join quadratic.
    * Dropped members are overwhelmingly exact/boilerplate duplicates that
    * exactDedup collapses upstream, and every pair keeps its other bands'
    * chances to collide. One shared implementation: the three call sites
    * must stay bit-identical to the SQL oracle's QUALIFY replication.
    */
  def capBuckets(rows: DataFrame, keys: Seq[String], cap: Int): DataFrame =
    if (cap == Int.MaxValue) rows
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col): _*)
      ensureCapListener(rows.sparkSession)
      rows.withColumn("__bn", count(lit(1)).over(w))
        // no silent caps: count what the guard drops, piggy-backed on the
        // consuming job (observe = zero extra jobs/scans), surfaced by the
        // session listener below and the cumulative counter
        .observe(s"graft_cap_buckets_${capSeq.incrementAndGet()}",
          sum(when(col("__bn") > cap, 1L).otherwise(0L)).as("dropped_rows"),
          count(lit(1)).as("total_rows"))
        .filter(col("__bn") <= cap).drop("__bn")
    }

  /** Cumulative rows dropped by [[capBuckets]] in this JVM. Updated
    * asynchronously (listener-bus delivery) after each consuming job. */
  val cappedRowsDropped = new java.util.concurrent.atomic.AtomicLong

  private val capSeq = new java.util.concurrent.atomic.AtomicLong
  // WEAK keys: a long-lived JVM cycling many sessions must not pin every
  // stopped SparkSession via the registration map
  private val capListenerSessions = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, Unit]())

  /** Once per session: surface every capBuckets drop count (the skew
    * guard's only lossy action) — a WARN log line per invocation that
    * dropped rows, plus the cumulative counter for programmatic checks.
    */
  private def ensureCapListener(
      spark: org.apache.spark.sql.SparkSession): Unit =
    capListenerSessions.computeIfAbsent(spark, { _ =>
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            qe.observedMetrics.foreach { case (name, row) =>
              if (name.startsWith("graft_cap_buckets")) {
                // a zero-row consuming job observes sum(...) = NULL — read
                // null-safe (a getLong would NPE inside the listener bus
                // and silently lose the metric)
                def longAt(field: String): Long = {
                  val i = row.fieldIndex(field)
                  if (row.isNullAt(i)) 0L else row.getLong(i)
                }
                val dropped = longAt("dropped_rows")
                if (dropped > 0) {
                  cappedRowsDropped.addAndGet(dropped)
                  val total = longAt("total_rows")
                  org.slf4j.LoggerFactory.getLogger(Dedup.getClass).warn(
                    s"capBuckets skew guard dropped $dropped of $total " +
                      "bucket rows (over-cap buckets; members keep their " +
                      "other bands' collision chances)")
                }
              }
            }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
      ()
    })

  /** Lazy form: the bucket self-join recomputes the signature pipeline on
    * BOTH sides (Catalyst plans a lazy self-join as two full subtrees).
    * [[minHashDedup]] avoids the double compute by materializing the
    * capped buckets once with an owned block lifecycle — callers composing
    * lshCandidates directly should do the same when the signature pass is
    * the dominant cost.
    */
  def lshCandidates(signatures: DataFrame, numHashes: Int = 64,
      bands: Int = 16, maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val (exploded, joinKeys) = bandBuckets(signatures, numHashes, bands)
    bucketSelfJoin(capBuckets(exploded, joinKeys, maxBucketSize), joinKeys)
  }

  /** Candidate pairs from a banded-bucket frame: `(a, b)` sharing any
    * bucket tuple, deduplicated.
    */
  private def bucketSelfJoin(buckets: DataFrame,
      joinKeys: Seq[String]): DataFrame = {
    val l = buckets.withColumnRenamed("doc_id", "a")
    val r = buckets.withColumnRenamed("doc_id", "b")
    l.join(r, joinKeys)
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** End-to-end MinHash near-dup detection: LSH candidates filtered by exact
    * Jaccard ≥ threshold. The hashed-shingle pass is computed once and
    * shared between signatures and the Jaccard verify.
    */
  def minHashDedup(docs: DataFrame, threshold: Double = 0.5,
      numHashes: Int = 64, bands: Int = 16, k: Int = 3,
      maxBucketSize: Int = AutoBucketSize): DataFrame = {
    // corpus-derived cap (≡ the historical 1000 below 10⁶ docs); exact
    // metadata count on scan-shaped inputs, Catalyst size estimate on
    // derived frames — never an extra pass of the upstream plan
    val cap = resolveCapFor(maxBucketSize, docs)
    // Two independent shingle passes beat one shared distinct table:
    // the signature pass feeds min-aggregation straight off the explode
    // (no distinct shuffle — duplicates fold in the map-side partial min),
    // and the verify pass re-shingles only the candidate docs (LSH keeps
    // that set small). The candidate set is materialized eagerly — it's
    // referenced by several subtrees of the verify job (doc semi-filter,
    // intersection join, final assembly). localCheckpoint (not
    // cache+count): the verify job then reads a STABLE LogicalRDD leaf —
    // no cache-lookup layer, no recomputable lineage, and AQE does not
    // re-plan the candidate subtree per consumer (one fewer moving part in
    // the cold path the r6–r9 benches measured as bistable). Blocks are
    // released after the (small) verified-pair result is checkpointed, so
    // executor storage stays flat across many invocations.
    // materialize the capped buckets ONCE before the self-join: a lazy
    // self-join plans the whole shingle→minhash→explode→cap pipeline as
    // two independent subtrees (measured: zero ReusedExchange — the heavy
    // signature pass ran twice). The banded frame is corpus×bands rows
    // (linear), far cheaper to hold briefly than to recompute the pass.
    // Materialization honors graft.Checkpoints' resilience knob: the
    // default localCheckpoint is non-resilient (executor loss kills the
    // query); clusters set graft.checkpoint.reliable=true.
    import graft.Checkpoints.{materialize, release}
    val (exploded, joinKeys) = bandBuckets(
      minHashSignatures(docs, numHashes, k), numHashes, bands)
    val buckets = materialize(capBuckets(exploded, joinKeys, cap))
    val cands = materialize(bucketSelfJoin(buckets, joinKeys))
    release(buckets) // the self-join is spent; candidates are the leaf
    val result = materialize(
      jaccard(docs, cands, k, minJaccard = Some(threshold))
        .filter(col("jaccard") >= threshold))
    release(cands)
    result
  }

  /** Benchmark-contamination check: for each corpus doc, the number of
    * distinct word-k-gram shingles it shares with a (small) probe set —
    * the standard eval-set decontamination pass before training. Shingles
    * hash once via `graft_polyhash` (longs, not strings, through the
    * shuffle); the probe side is tiny and broadcasts, so the whole check
    * is one scan of the corpus shingle stream.
    */
  def contamination(docs: DataFrame, probe: DataFrame,
      k: Int = 3): DataFrame = {
    val probeShingles = broadcast(
      shingleHashes(probe, k).select(col("sh")).distinct())
    shingleHashes(docs, k)
      .join(probeShingles, "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
  }

  /** Per-doc repetition signals (Gopher/C4-style quality filters): the
    * fraction of word-2-gram occurrences belonging to grams repeated within
    * the doc, and the share of the single most frequent gram. One explode +
    * two aggregations, all codegen'd — the shape that runs inside a corpus
    * scan at 100 TB.
    */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val grams = transform(
      sequence(lit(1), greatest(size(toks) - 1, lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(2))))
    val perGram = parallelized(docs)
      .select(col("doc_id"), explode(grams).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
    perGram.groupBy("doc_id").agg(
      round(sum(when(col("cnt") > 1, col("cnt")).otherwise(0L))
        .cast("double") / sum("cnt"), 5).as("dup_2gram_frac"),
      round(max("cnt").cast("double") / sum("cnt"), 5).as("top_2gram_frac"))
  }

  /** Near-duplicate CLUSTERS: transitive closure of the MinHash near-dup
    * pair relation, each clustered doc mapped to its cluster's canonical
    * (smallest) doc id. Near-duplication isn't transitive — A≈B and B≈C
    * don't imply A≈C — but dedup policy usually keeps one doc per chain,
    * which is exactly connected components over the verified pair graph
    * (GraphX; the pair graph is tiny next to the corpus, so the iterative
    * part touches only near-dup docs). Docs with no near-dup partner don't
    * appear (they are their own canonical).
    */
  def nearDupClusters(docs: DataFrame, threshold: Double = 0.5,
      numHashes: Int = 64, bands: Int = 16, k: Int = 3): DataFrame = {
    val pairs = minHashDedup(docs, threshold, numHashes, bands, k)
    graft.graph.GraphOps.componentsOfPairs(
        pairs.select(col("a").as("src"), col("b").as("dst")))
      .select(col("id").as("doc_id"), col("component").as("canonical_id"))
  }

  /** SimHash signature bit width: [[graft.plans.PolyHash]] yields 62
    * usable bits (two 31-bit polynomial halves).
    */
  val SimHashBits: Int = 62

  /** SimHash: 62-bit signature — per token-hash bit, sum +1/-1 across the
    * doc's tokens; bit set iff the sum is positive. Near-dups = signatures
    * within small hamming distance. Token hash is the engine-portable
    * `graft_polyhash`, so the signature is reproducible in the SQL oracle.
    */
  def simHash(docs: DataFrame): DataFrame = {
    graft.plans.GraftExtensions.ensureFunctions(docs.sparkSession)
    val tok = parallelized(docs).select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("token"))
      .withColumn("th", call_function("graft_polyhash", col("token")))
    val bitSums = (0 until SimHashBits).map { b =>
      sum(when(shiftright(col("th"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"s$b")
    }
    val sums = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until SimHashBits).map { b =>
      when(col(s"s$b") > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
    sums.select(col("doc_id"), sig.as("simhash"))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs within `maxDist` hamming distance, candidate
    * pairs bounded by a self-join on the top `prefixBits` bits (a cheap
    * 1-band LSH; identical high bits is a necessary-ish condition the spec
    * validates against brute force).
    *
    * The prefix self-join routes through the shared Σ bucket² skew guard
    * like every other LSH candidate join: a boilerplate-heavy corpus
    * (near-identical docs → identical signatures → identical prefixes)
    * would otherwise go quadratic on one prefix key. Unlike banded
    * MinHash a dropped prefix bucket has no "other bands" to recover in —
    * but its members are signature-identical boilerplate that exact dedup
    * upstream collapses more cheaply, and the QUALIFY oracle replicates
    * the cap bit-identically.
    */
  def simHashPairs(docs: DataFrame, maxDist: Int = 8,
      prefixBits: Int = 16, maxBucketSize: Int = AutoBucketSize,
      rotations: Int = 1): DataFrame = {
    import graft.Checkpoints.{materialize, release}
    require(rotations >= 1 && rotations <= SimHashBits,
      s"rotations must be in [1, $SimHashBits]")
    val cap = resolveCapFor(maxBucketSize, docs)
    // materialize the capped signature frame ONCE before the prefix
    // self-join: a lazy self-join plans the dominant tokenize→hash→
    // bit-sum signature pass as two independent subtrees (zero
    // ReusedExchange — the exact shape measured at 2.3× on minhash at
    // sf10 and fixed the same way in minHashDedup). The frame is
    // ≤ |corpus|×rotations rows — trivial to hold vs recomputing the
    // pass; released once the (small) pair result is checkpointed.
    val (sig, joinKeys) =
      if (rotations == 1)
        (materialize(capBuckets(
          simHash(docs).withColumn("prefix",
            shiftright(col("simhash"), SimHashBits - prefixBits)),
          Seq("prefix"), cap)), Seq("prefix"))
      else {
        // recall option: q bit-ROTATIONS of the signature as q bands —
        // a single high-bit prefix band misses near-dup pairs that
        // differ in the high bits; each rotation re-keys the join on a
        // different bit window (same capped join shape per band). A
        // pair surfaces if ANY band agrees; DedupSpec quantifies the
        // recall lift vs brute-force hamming at fixed maxDist.
        val step = SimHashBits / rotations
        val mask = (1L << SimHashBits) - 1
        def rotate(c: Column, k: Int): Column =
          if (k == 0) c
          else shiftleft(c, k).bitwiseOR(
            shiftrightunsigned(c, SimHashBits - k)).bitwiseAND(lit(mask))
        val banded = simHash(docs).select(col("doc_id"), col("simhash"),
          explode(array((0 until rotations).map { i =>
            struct(lit(i).as("band"),
              shiftright(rotate(col("simhash"), i * step),
                SimHashBits - prefixBits).as("prefix"))
          }: _*)).as("bp"))
          .select(col("doc_id"), col("simhash"),
            col("bp.band").as("band"), col("bp.prefix").as("prefix"))
        (materialize(capBuckets(banded, Seq("band", "prefix"), cap)),
          Seq("band", "prefix"))
      }
    val keyCols = joinKeys.map(col)
    val l = sig.select(keyCols :+ col("doc_id").as("a") :+
      col("simhash").as("sig_a"): _*)
    val r = sig.select(keyCols :+ col("doc_id").as("b") :+
      col("simhash").as("sig_b"): _*)
    val raw = l.join(r, joinKeys)
      .filter(col("a") < col("b"))
      .withColumn("dist", hamming(col("sig_a"), col("sig_b")).cast("int"))
      .filter(col("dist") <= maxDist)
      .select("a", "b", "dist")
    // multi-band: the same pair can surface from several rotations
    val pairs = materialize(if (rotations == 1) raw else raw.distinct())
    release(sig)
    pairs
  }

  /** Embedding-cosine near-duplicate pairs, exact: all (a < b) pairs with
    * cosine ≥ threshold. Correctness anchor — O(n²), bound the input
    * (the scale path is [[embeddingNearDups]]).
    */
  def embeddingNearDupsExact(vectors: DataFrame,
      threshold: Double): DataFrame = {
    graft.plans.GraftExtensions.ensureFunctions(vectors.sparkSession)
    import graft.similarity.Similarity._
    // cast once per row, not per pair in the n² join (float→double exact)
    val va = vectors.select(col("vec_id").as("a"),
      col("embedding").cast("array<double>").as("emb_a"),
      norm(col("embedding")).as("norm_a"))
    val vb = vectors.select(col("vec_id").as("b"),
      col("embedding").cast("array<double>").as("emb_b"),
      norm(col("embedding")).as("norm_b"))
    va.join(vb, col("a") < col("b"))
      .select(col("a"), col("b"),
        round(dot(col("emb_a"), col("emb_b")) /
          (col("norm_a") * col("norm_b")), 5).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Embedding-cosine near-dup, scale path: LSH-bucket candidate pairs
    * (never the n² cross product) verified by exact cosine ≥ threshold.
    * Recall vs the exact variant is measured in DedupSpec.
    */
  def embeddingNearDups(vectors: DataFrame, threshold: Double,
      bits: Int = 8, tables: Int = 8,
      maxBucketSize: Int = AutoBucketSize): DataFrame = {
    graft.plans.GraftExtensions.ensureFunctions(vectors.sparkSession)
    import graft.similarity.Similarity._
    val all = lshBuckets(vectors, bits, tables)
    // same Σ bucket² guard as lshCandidates: drop degenerate buckets
    // (e.g. zero vectors hashing identically across tables); cap derived
    // from the corpus size unless given explicitly
    val buckets = capBuckets(all, Seq("table", "bucket"),
      resolveCapFor(maxBucketSize, vectors))
    val cands = buckets.select(col("table"), col("bucket"),
        col("vec_id").as("a"))
      .join(buckets.select(col("table"), col("bucket"),
        col("vec_id").as("b")), Seq("table", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    // cast once per row, not per candidate pair in the verify join
    val va = vectors.select(col("vec_id").as("a"),
      col("embedding").cast("array<double>").as("emb_a"),
      norm(col("embedding")).as("norm_a"))
    val vb = vectors.select(col("vec_id").as("b"),
      col("embedding").cast("array<double>").as("emb_b"),
      norm(col("embedding")).as("norm_b"))
    cands.join(va, "a").join(vb, "b")
      .select(col("a"), col("b"),
        round(dot(col("emb_a"), col("emb_b")) /
          (col("norm_a") * col("norm_b")), 5).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
