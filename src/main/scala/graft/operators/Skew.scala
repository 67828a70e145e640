package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join/aggregation shapes for hot keys at scale.
  *
  * The reference never faces key skew (single-process, matrix kernels), but
  * any 100 TB shuffle does: one hot key (a boilerplate `event_type`, a null
  * foreign key, a viral user id) lands an entire join/agg partition on one
  * task. AQE's skew-join split handles sort-merge joins after the fact;
  * these operators encode the classic *proactive* rewrites, and both are
  * result-identical to their naive forms (oracle-checked).
  */
object Skew {

  /** Salted equi-join of a skewed fact side against a small dimension side.
    *
    * The fact side gets a uniform salt in [0, salts); the dimension side is
    * replicated once per salt value; the join key becomes (key, salt), so a
    * hot key's rows spread over `salts` shuffle partitions instead of one.
    * The salt derives from `monotonically_increasing_id` — any uniform
    * per-row value works because the salt never affects the result, only
    * the partitioning. Result ≡ `fact.join(dim, key)`.
    *
    * (When the dimension fits in memory Catalyst would broadcast and no
    * salting is needed; this is the shape for the mid-size dim — too big to
    * broadcast, joined on a skewed key.)
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    val f = fact.withColumn(
      "__salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val d = dim.withColumn(
      "__salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-safe `count(DISTINCT value)` per key: two-level aggregation.
    *
    * Phase 1 groups by (key, value) — the distinct pairs spread over the
    * full (key, value) hash space, so a hot key's values don't pile onto
    * one partition and each partial aggregate stays map-side combinable.
    * Phase 2 counts pairs per key. Result ≡
    * `df.groupBy(key).agg(countDistinct(value))`.
    */
  def twoPhaseCountDistinct(df: DataFrame, key: String,
      value: String): DataFrame = {
    // count(DISTINCT x) semantics: NULL is not a distinct value, but a key
    // whose values are all NULL still appears (with count 0)
    val counts = df.select(key, value).filter(col(value).isNotNull)
      .distinct()
      .groupBy(key).agg(count(lit(1)).as("__n"))
    df.select(key).distinct()
      .join(counts, Seq(key), "left_outer")
      .select(col(key), coalesce(col("__n"), lit(0L)).as("n_distinct"))
  }
}
