package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the constructors
  * `private[sql]`; a library shipping custom Catalyst expressions
  * needs this one-file shim inside the sql namespace (standard
  * extension-library pattern — no Spark internals are modified). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Free the block-manager storage behind a `localCheckpoint`ed
    * frame. `df.unpersist()` only reaches CacheManager entries; a
    * local checkpoint's blocks belong to the materialized RDD inside
    * the plan's LogicalRDD leaf and otherwise live until driver GC +
    * ContextCleaner get around to them — which is how an iterative
    * fixpoint loop (one checkpoint per round) accumulates O(rounds)
    * scratch instead of O(1). Safe ONLY once nothing will read the
    * frame again: a local checkpoint has no lineage to rebuild from.
    * No-op for plans without a LogicalRDD leaf. */
  def unpersistLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ =>
    }
}
