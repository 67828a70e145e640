package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column-from-Expression factory. Spark 4
  * moved Column construction behind `classic.ExpressionUtils`; extensions
  * that build Catalyst expressions directly (constant-folded literals,
  * custom expressions) need this one-liner shim in the sql package.
  */
object GraftColumn {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

/** Bridge to the `private[sql]` LogicalRDD node: a (local)checkpointed
  * Dataset's plan is a LogicalRDD wrapping the persisted RDD. Extracting it
  * is what lets the engine UNPERSIST superseded checkpoints (old graph
  * snapshots, per-hop traversal frontiers, row-id pins) instead of leaking
  * their blocks for the life of the SparkContext.
  */
object GraftRdd {
  def checkpointedRdd(df: Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
      case _ => None
    }

  /** Every LogicalRDD leaf anywhere in the plan — a lazily-overlaid or
    * derived frame references its backing snapshots deep in the tree, not
    * at the root.
    */
  def referencedRdds(df: Dataset[_]): Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.logical.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
}
