package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the most recent right row with
  * `right.ts <= left.ts` within the same key — the temporal join the
  * reference lacks (its only range op is the id-range seek,
  * `op_node_by_id_seek.c`) but any event/feature pipeline needs.
  *
  * Spark-first shape: NO range-condition join (a theta join would explode
  * to |key group|² before filtering). Instead union the two streams tagged,
  * sort once per key on (ts, side), and carry the right side's payload
  * forward with `last_value(ignoreNulls)` over rows-unbounded-preceding.
  * One shuffle on the key, linear in |left|+|right|, skew-bounded by the
  * largest single key group — the standard scalable as-of.
  *
  * Contract: `right` must be unique per (key, ts) — pre-aggregate if not —
  * so the pick is deterministic. Ties (left.ts == right.ts) see the right
  * row (ASOF `>=` semantics, matching DuckDB's ASOF JOIN used as oracle).
  */
object AsOfJoin {

  /** Left as-of join. `payload` columns of `right` are attached to each
    * left row as of its `ts`; left rows with no prior right row get nulls.
    */
  def leftAsOf(left: DataFrame, right: DataFrame, key: String,
      ts: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // tag sides; right sorts before left at equal ts (>= semantics)
    val l = left.withColumn("__side", lit(1))
    // carry the payload as ONE struct per right row (non-null even when
    // every payload field is NULL): per-column ignoreNulls carry-forward
    // would leak an OLDER row's value whenever the most recent right row
    // holds a NULL field — and could even mix fields from different rows
    val r = right.select((key +: ts +: payload).map(col): _*)
      .withColumn("__side", lit(0))
      .withColumn("__asof_row", struct(payload.map(col): _*))
      .drop(payload: _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__asof_row",
      last(col("__asof_row"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("__asof_row").getField(p).as(s"asof_$p")): _*)
  }
}
