package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into Spark's `private[sql]` Column <-> catalyst Expression
 * converters, needed to expose custom codegen'd expressions (e.g.
 * [[graft.functions.WordShingles]]) through the public Column API. Living
 * under `org.apache.spark.sql` for access is the established pattern for
 * Spark-native extension libraries; no Spark internals are modified.
 */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Drain the `private[spark]` listener bus so task metrics collected by
    * a test SparkListener are complete before assertions (the skew-stress
    * specs measure per-task shuffle volume through one). */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
