package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Package bridge (same pattern as [[GraftColumnBridge]]): the
  * constructors needed to hand a custom [[LogicalPlan]] node to the
  * session are `private[sql]` in Spark 4. `ofRows` wraps a plan as a
  * DataFrame (running the normal analyze→optimize→plan pipeline);
  * `ensureStrategy` registers the planner strategy that knows how to
  * turn the custom node into a physical operator, idempotently, on
  * whatever session the caller holds — so the operator works without
  * requiring `spark.sql.extensions` to be configured.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def ensureStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(s))
      exp.extraStrategies = exp.extraStrategies :+ s
  }
}
