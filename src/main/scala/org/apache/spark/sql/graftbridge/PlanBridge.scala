package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway graft needs: turn a hand-built
  * [[LogicalPlan]] into a DataFrame. Spark exposes no public API for
  * this (custom logical operators are expected to come from SQL parser
  * extensions), so — like every library that adds whole-plan operators —
  * we host a two-line bridge inside the `org.apache.spark.sql`
  * namespace. Nothing else in graft lives outside `graft.*`.
  */
object PlanBridge {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)
}
