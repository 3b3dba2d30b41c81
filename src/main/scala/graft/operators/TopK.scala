package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.GraftSqlBridge

/**
 * Bounded top-k as an AGGREGATE — the scale-path alternative to the
 * `row_number() OVER (PARTITION BY …) <= k` window for per-group top-k:
 * the window shuffles EVERY row to its group and sorts whole groups;
 * this aggregates partially, so each task forwards at most k elements
 * per group into the exchange and no group is ever fully sorted — the
 * shuffle is |groups|·k elements regardless of row count, the same
 * contract as the sketch families (pinned in TopKSpec).
 *
 * Determinism: pass a STRUCT whose field order encodes the total order
 * (ties broken by a unique id field), with descending keys negated —
 * then `sort_array` over the result is a stable, engine-exact ranking.
 * [[topKStructs]] returns the k minimal structs under that order (see
 * [[TopKStructsAgg]]).
 */
object TopK {

  def topKStructs(ord: Column, k: Int): Column = {
    require(k > 0, s"k must be positive, got $k")
    GraftSqlBridge.column(
      TopKStructsAgg(GraftSqlBridge.expression(ord), k).toAggregateExpression())
  }
}
