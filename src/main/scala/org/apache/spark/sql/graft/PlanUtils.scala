// Lives in the Spark namespace for access to Dataset.ofRows (private[sql]),
// like the sibling expression files.
package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Repartition, RepartitionByExpression}

object PlanUtils {

  /** `df` with any TOP-LEVEL caller-added repartition layers peeled off —
    * for row-COUNT jobs only, which are partitioning-invariant. The
    * auto-sizing counts (SRP plane count, IVF cell count, PQ codeword
    * count) take the caller's corpus frame, and [[graft.Tables]] hands
    * the CPU-dense tables out pre-spread (`repartition(parallelism)` for
    * degenerate single-row-group files); counting THROUGH that exchange
    * shuffles the whole table to produce a number the un-shuffled scan
    * yields for free — at bench scale an extra stage per query, at
    * corpus scale a full shuffle for a metadata-answerable count. Only
    * top-level repartitions are peeled (anything below a filter/project
    * changes nothing about their row count either, but peeling deeper
    * shapes is not needed by any caller here).
    */
  def withoutTopLevelRepartition(df: DataFrame): DataFrame = {
    def peel(p: LogicalPlan): LogicalPlan = p match {
      case r: Repartition => peel(r.child)
      case r: RepartitionByExpression => peel(r.child)
      case other => other
    }
    val logical = df.queryExecution.logical
    val peeled = peel(logical)
    if (peeled eq logical) df
    else org.apache.spark.sql.classic.Dataset.ofRows(
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession], peeled)
  }
}
