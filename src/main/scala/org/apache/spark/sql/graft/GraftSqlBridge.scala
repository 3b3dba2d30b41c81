package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{Column, SparkSession}

/**
 * Minimal bridge into `private[sql]` Spark API. Spark 4 removed
 * `new Column(Expression)` from the public surface (Column is
 * expression-tree-free in spark-sql-api); the supported conversion lives in
 * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]`.
 *
 * This is the narrowest possible analogue of the reference's
 * `EncapsulationViolator` (reference:
 * alchemy/src/main/scala/org/apache/spark/sql/EncapsulationViolator.scala:8-49)
 * — only Column↔Expression and the session FunctionRegistry, nothing else.
 */
object GraftSqlBridge {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def functionRegistry(spark: SparkSession): FunctionRegistry =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionState.functionRegistry

  /** Interpreted total ordering for a data type (TypeUtils is
   * `private[sql]`) — structs compare field by field, the ordering
   * [[graft.operators.TopKStructsAgg]] ranks under. */
  def orderingFor(dt: org.apache.spark.sql.types.DataType): Ordering[Any] =
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(dt)
      .asInstanceOf[Ordering[Any]]

  /** The MATERIALIZED cache RDD id behind `df`, if the frame is registered
   * in the session's cache manager AND its columnar buffers have actually
   * been built (a lazy `persist` registers the plan but creates no RDD
   * until the first materializing action). The id is a plain Int handle —
   * it references neither the session nor the plan — so a memo can retain
   * it after every strong/soft reference to the frame is gone and still
   * release the cached blocks via `SparkContext.getPersistentRDDs`
   * (see [[graft.dedup.Dedup]]'s prepared-plan store). */
  def materializedCacheRddId(df: org.apache.spark.sql.DataFrame): Option[Int] = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    ds.sparkSession.sharedState.cacheManager.lookupCachedData(ds).flatMap { cd =>
      val b = cd.cachedRepresentation.cacheBuilder
      if (b.isCachedColumnBuffersLoaded) Some(b.cachedColumnBuffers.id) else None
    }
  }

  /** True iff every LogicalRDD leaf of `df`'s analyzed plan still has its
   * blocks registered (storage level != NONE). A localCheckpoint'd frame
   * has TRUNCATED lineage: if some external actor unpersists its block
   * RDD (e.g. a harness resetting cache state between passes), the frame
   * is unrecoverable — serving it from a memo would fail with
   * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. This check detects that case so
   * the memo can recompute instead. (Executor loss drops blocks WITHOUT
   * resetting the level — that failure mode stays, exactly as it does for
   * any checkpoint reuse inside a single query.) */
  def logicalRddsServable(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.collectLeaves().forall {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE
      case _ => true
    }

  /** Re-root a logical plan onto another session of the same SparkContext
   * (`Dataset.ofRows` is `private[sql]`). The cache manager lives in
   * sharedState, so persisted subtrees still substitute — this exists so
   * an iterative operator can run its tiny per-round queries on a child
   * session with driver-latency-heavy features (AQE stage-jobs) tuned
   * off, without mutating the caller's session conf. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
