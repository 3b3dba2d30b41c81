package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Range join without an equi-key: pair every left row with the right rows
 * whose timestamp falls inside the left row's forward window
 * `[l_ts, l_ts + window)` — the ops-correlation shape ("purchases within
 * 5 minutes after any error"), where no shared key exists for the planner
 * to hash on.
 *
 * Why not `left.join(right, r.ts >= l.ts && r.ts < l.ts + w)`: a pure
 * range predicate gives Catalyst nothing to partition on, so it plans
 * BroadcastNestedLoopJoin (or a cartesian) — O(|L|·|R|) comparisons and a
 * broadcast of a whole side, the classic scale-killer.
 *
 * The banded plan: quantize time into `window`-sized bands. A right row
 * lives in exactly one band; a left row's window can only overlap bands
 * `floor(l/w)` and `floor(l/w)+1`, so the left side fans out to exactly
 * those two band keys and the join becomes a hash EQUI-join on the band,
 * re-filtered by the precise range. Each qualifying pair is emitted
 * exactly once (the right row's single band matches exactly one of the
 * left's two), no dedup stage needed. Shuffle is 2|L| + |R| rows on a
 * key whose cardinality grows with the time span — dense, well spread,
 * and AQE-splittable if one band is hot.
 */
object RangeJoin {

  /** Pairs (left, right) with `right.tsCol` in `[left.tsCol, left.tsCol +
   * windowSeconds)`. Column name collisions are avoided by aliasing both
   * sides' payloads before the call; `leftTs`/`rightTs` name the epoch
   * columns (TimestampType). */
  def joinWithin(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String, windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, s"window must be positive, got $windowSeconds")
    val lUs = unix_micros(col(leftTs))
    val rUs = unix_micros(col(rightTs))
    val w = windowSeconds * 1000000L
    val lBanded = left
      .withColumn("__rj_band", explode(array(
        expr(s"unix_micros($leftTs) div ${w}L"),
        expr(s"unix_micros($leftTs) div ${w}L + 1L"))))
    val rBanded = right.withColumn("__rj_band", expr(s"unix_micros($rightTs) div ${w}L"))
    lBanded.join(rBanded, Seq("__rj_band"))
      .filter(rUs >= lUs && rUs < lUs + lit(w))
      .drop("__rj_band")
  }
}
