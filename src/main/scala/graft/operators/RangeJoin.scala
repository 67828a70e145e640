package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join: pair each left row with every right row of the same
  * key within `|left.ts − right.ts| ≤ band` — the interval join the
  * reference lacks (equi-joins only, SURVEY §2.3) but event correlation
  * needs.
  *
  * Spark-first shape: NOT a theta join (Catalyst would plan the per-key
  * cross product and post-filter — quadratic in the key group). Time is
  * bucketed at `band` width; the right side explodes to its bucket ± 1, the
  * join runs as a pure equi-join on (key, bucket) — candidate pairs are
  * complete (|ts diff| ≤ band ⇒ bucket diff ≤ 1) and each true pair arises
  * in exactly one exploded bucket, so no dedup pass — then the exact band
  * predicate filters. One shuffle each side, cost ∝ matches, not group².
  */
object RangeJoin {

  /** Left-outer banded join. Right columns arrive as `range_<p>`; its
    * timestamp as `range_ts` (null for left rows with no partner).
    */
  def bandJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      band: Long, payload: Seq[String] = Nil): DataFrame = {
    require(band > 0, s"band must be positive, got $band")
    val lb = left.withColumn("__bucket", floor(col(ts) / band))
    val r0 = payload.foldLeft(
      right.select((key +: ts +: payload).map(col): _*)
        .withColumnRenamed(ts, "range_ts")
        .withColumnRenamed(key, "__rkey")) { (df, p) =>
      df.withColumnRenamed(p, s"range_$p")
    }
    val rb = r0
      .withColumn("__b0", floor(col("range_ts") / band))
      .withColumn("__bucket",
        explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    lb.join(rb,
        lb(key) === rb("__rkey") && lb("__bucket") === rb("__bucket") &&
          abs(lb(ts) - rb("range_ts")) <= band,
        "left_outer")
      .drop("__bucket").drop("__rkey")
  }
}
