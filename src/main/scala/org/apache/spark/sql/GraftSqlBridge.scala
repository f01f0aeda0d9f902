package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Column↔Expression conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils` is private[sql] in
  * Spark 4.x). This is the standard extension-library pattern for
  * exposing custom Catalyst expressions through the public Column API —
  * the only file that lives inside Spark's namespace, and it contains
  * no logic. */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame (`queryExecution` lives on the
    * classic Dataset in 4.x). */
  def logicalPlan(df: Dataset[_]): catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Wrap a logical plan (e.g. a custom node) back into a DataFrame —
    * `Dataset.ofRows` is private[sql]. */
  def dataset(spark: SparkSession,
              plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Whether the frame's canonical plan already has a CacheManager
    * entry (its own persist, or a cached twin from another query) —
    * the pre-persist check that stops double-persisting a plan the
    * cache already serves. */
  def isCached(df: Dataset[_]): Boolean = {
    val cds = df.asInstanceOf[classic.Dataset[_]]
    cds.sparkSession.sharedState.cacheManager.lookupCachedData(cds).isDefined
  }

  /** Re-flag a batch DataFrame as STREAMING (isStreaming=true) for a
    * v1 `Source.getBatch` return — the engine asserts the flag, and
    * `internalCreateDataFrame` is private[sql]. The plan stays lazy:
    * `toRdd` is the physical RDD graph, executed only when the
    * micro-batch runs. */
  def streamingFrame(df: Dataset[_]): DataFrame = {
    val cds = df.asInstanceOf[classic.Dataset[_]]
    cds.sparkSession.internalCreateDataFrame(
      cds.queryExecution.toRdd, cds.schema, isStreaming = true)
  }
}
