package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` Dataset constructor in Spark 4's classic
  * API, so engine audit tooling can evaluate a SUBTREE of an analyzed plan
  * (e.g. the input of one aggregate) as its own DataFrame. Same placement
  * rationale as [[ColumnShim]]: no logic, only access.
  */
object DatasetShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
