package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the package-private Dataset factory so a library can wrap a
  * custom LogicalPlan in a DataFrame — the standard extension pattern used
  * by public Spark libraries (cf. SNIPPETS.md [1]/[3]: Qbeast's
  * `org.apache.spark.sql.DatasetFactory`, ColumnDataset's `ofColumns`).
  * Only used by graft.sql.Match; everything else stays on the public API.
  */
object GraftDatasetFactory {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
