package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The histogram-window family's bounded-universe contract, enforced.
 *
 * Several audit operators (rank-AUC, padding audit, vocabulary coverage)
 * collapse row volume into a per-value histogram and then run ONE
 * unpartitioned cumulative window over the |distinct values| histogram
 * rows. That is the right 100-TB shape exactly while the value universe
 * is bounded (integer-granularity scores, token lengths): the window's
 * single task holds |buckets| slim rows, not data. A genuinely
 * continuous LONG score would break the contract silently — the window
 * task would absorb the whole histogram. Until round 17 that contract
 * lived only in scaladoc; this guard makes the operators FAIL LOUDLY
 * past the bound instead (the Resample family's domain-guard
 * discipline, per the r16 verdict).
 */
private[graft] object HistogramWindow {

  /** Hard ceiling on the |distinct buckets| a single-partition
   * cumulative histogram window may pull onto one task. 2²⁴ rows of a
   * slim (value, count, cumulative) histogram are a few hundred MB on
   * the one window task — the last size this side of a two-phase
   * partitioned-prefix-sum scheme, and far past any integer-granularity
   * score or token-length universe (a 16M-bucket histogram means the
   * caller's score is effectively continuous and should be coarsened,
   * e.g. to e6 units). */
  val MaxBuckets: Long = 1L << 24

  /** Cumulative bucket count `sum(cnt) over (order by `order` rows
   * unbounded preceding..current)`, guarded: if the histogram holds
   * more than `maxBuckets` rows every output row raises instead. Both
   * frames ride ONE window spec (same global ordering, same single
   * exchange), so the guard adds no job and no shuffle — the count
   * frame is evaluated by the same Window operator. `maxBuckets` is a
   * test seam (red-then-green specs shrink it); production callers use
   * the default. */
  def cumCountGuarded(cnt: Column, order: Column, op: String,
      what: String, maxBuckets: Long = MaxBuckets): Column = {
    val cum = Window.orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    when(count(lit(1)).over(all) > maxBuckets,
      raise_error(lit(s"$op: more than $maxBuckets distinct $what — " +
        "the single-partition cumulative histogram window would hold " +
        "the whole universe on one task; coarsen the value granularity " +
        s"(e.g. quantize the score) so |distinct $what| stays bounded")))
      .otherwise(sum(cnt).over(cum))
  }
}
