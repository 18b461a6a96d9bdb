package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal accessor for the package-private `classic.Dataset.ofRows` —
  * the only sanctioned way to wrap a hand-built `LogicalPlan` (here: the
  * graft.plans custom nodes) into a DataFrame. Lives in the
  * org.apache.spark.sql package solely to satisfy `private[sql]`; no
  * Spark behavior is altered or re-implemented.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
