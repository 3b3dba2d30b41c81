package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/**
 * Quantitative shuffle accounting for a just-executed DataFrame: how many
 * bytes and rows actually crossed each exchange.
 *
 * PlanShapeSpec pins plan STRUCTURE ("the banding subtree carries no
 * embedding column"); this reads the runtime metrics behind the same
 * claim, so a regression that keeps the plan shape but widens the shuffled
 * payload (a struct that quietly grows a text field, a projection pushed
 * below the exchange) fails a NUMERIC assertion. At 100 TB, shuffled
 * bytes per input row is THE scalability number for every banded/bucketed
 * operator in this library — this makes it testable at fixture scale.
 *
 * Usage: run the frame first (`df.collect()` / write), then read
 * [[ShuffleAudit.shuffledBytes]] — metrics are populated by execution.
 * AQE wraps stages, so traversal descends through [[AdaptiveSparkPlanExec]]
 * and materialized [[QueryStageExec]] nodes.
 */
object ShuffleAudit {

  /** All shuffle exchanges in the executed plan (AQE-aware traversal). */
  private def exchanges(plan: SparkPlan): Seq[ShuffleExchangeLike] = {
    val out = scala.collection.mutable.ArrayBuffer[ShuffleExchangeLike]()
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case s: ShuffleExchangeLike => out += s; s.children.foreach(walk)
        case other => other.children.foreach(walk)
      }
      p.subqueries.foreach(walk)
    }
    walk(plan)
    out.toSeq
  }

  /** Total bytes written across every shuffle exchange of the LAST
   * execution of `df` (0 when the plan has no exchange, e.g. map-only). */
  def shuffledBytes(df: DataFrame): Long =
    exchanges(df.queryExecution.executedPlan)
      .map(e => e.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)).sum

  /** Total rows that crossed shuffle exchanges in the last execution. */
  def shuffledRows(df: DataFrame): Long =
    exchanges(df.queryExecution.executedPlan)
      .map(e => e.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)).sum
}
