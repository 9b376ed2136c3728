package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}

/** One-method bridge into `classic.Dataset.ofRows` (qualified
  * `private[sql]`, so only reachable from inside the
  * `org.apache.spark.sql` namespace): turns graft's custom logical
  * nodes (plans/CosineTopK) into DataFrames. The standard pattern for
  * libraries that add whole operators — the alternative, reflection,
  * trades a compile-time check for a runtime one. Nothing else may
  * live in this package. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
