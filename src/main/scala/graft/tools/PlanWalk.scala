package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}

/** Post-execution plan metric extraction that sees through AQE: a
  * materialized adaptive plan turns each executed stage into a
  * `QueryStageExec` LEAF, so a naive collect/collectLeaves never
  * reaches the scans or exchanges inside. Used by the profiling tools
  * and the layout/join specs.
  */
object PlanWalk {

  /** Every node, descending through adaptive wrappers and stages. */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
    case q: QueryStageExec => q +: allNodes(q.plan)
    case r: ReusedExchangeExec => r +: allNodes(r.child)
    case other => other +: other.children.flatMap(allNodes)
  }

  private def executed(df: DataFrame): Seq[SparkPlan] =
    allNodes(df.queryExecution.executedPlan)

  /** Sum of `numOutputRows` over the TRUE leaves (scans) of the
    * executed plan — call after an action; measures rows surviving
    * parquet row-group skipping.
    */
  def scanOutputRows(df: DataFrame): Long =
    executed(df)
      .filter(p => p.children.isEmpty &&
        !p.isInstanceOf[QueryStageExec] &&
        !p.isInstanceOf[AdaptiveSparkPlanExec])
      .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum

  /** (records, bytes) written across every shuffle exchange of the
    * executed plan — call after an action.
    */
  def shuffleWritten(df: DataFrame): (Long, Long) = {
    val ex = executed(df).collect { case e: ShuffleExchangeExec => e }
    (ex.flatMap(_.metrics.get("shuffleRecordsWritten").map(_.value)).sum,
      ex.flatMap(_.metrics.get("shuffleBytesWritten").map(_.value)).sum)
  }
}
