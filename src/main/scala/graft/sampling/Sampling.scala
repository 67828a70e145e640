package graft.sampling

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic content-keyed sampling and dataset splits.
  *
  * Training pipelines need splits that are (a) reproducible run-to-run with
  * no stored assignment table, (b) stable under re-partitioning and
  * re-ingestion, and (c) computable as a pure projection inside the scan
  * (no shuffle, no join). Keying on a content hash gives all three: the
  * bucket is a function of the row's bytes, so exact duplicates land in the
  * SAME split (no train/test leakage from dup docs) and adding/removing
  * rows never reassigns others — properties `rand()`-based sampling lacks.
  *
  * The hash is the engine-portable `graft_polyhash` over `md5(text)`
  * (both reproducible in the DuckDB oracle bit-for-bit).
  */
object Sampling {

  /** Deterministic bucket in [0, buckets) keyed on the column's content. */
  def hashBucket(content: Column, buckets: Int = 100): Column =
    pmod(call_function("graft_polyhash", md5(content)), lit(buckets.toLong))

  /** Train/valid/test assignment from a [0,100) bucket. */
  def split(bucket: Column, trainPct: Int, validPct: Int): Column =
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + validPct, "valid")
      .otherwise("test")

  /** The DuckDB-SQL replication of [[hashBucket]] for an expression `e`:
    * graft_polyhash ≡ two polynomial folds (base 31 / 131, mod 1e9+7) over
    * the characters, packed as `hi * 2^31 + lo`.
    */
  def hashBucketSql(e: String, buckets: Int = 100): String =
    s"${graft.plans.PolyHash.sql(s"md5($e)")} % $buckets"
}
