package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Behavioral feature engineering over event logs — the derived columns a
 * ranking/recommendation training set carries next to its labels.
 *
 * Everything here is integer-exact: decay curves are power-of-two
 * half-lives (a bit shift, not a float `pow`), so features reproduce
 * bit-for-bit on any engine and never drift between the training dump
 * and the serving recomputation.
 */
object Features {

  /**
   * Recency-weighted engagement with a ONE-WEEK HALF-LIFE: each event
   * contributes `2^(maxWeeks − age_weeks)` to its key's score, where
   * `age_weeks = (horizon − ts) div 7 days` and events older than
   * `maxWeeks` weeks contribute nothing — the classic
   * exponential-decay engagement feature, except the decay base is 2
   * and ages quantize to weeks, so every weight is an exact bit shift:
   * this week's event is worth 2^maxWeeks, one aged `maxWeeks` weeks is
   * worth exactly 1, and the sum is an integer both engines compute
   * identically (a float `exp(-λ·age)` reproduces on neither). The
   * horizon is the corpus max timestamp (broadcast single row — the
   * q179 pattern), so the feature is a pure function of the data.
   *
   * Scale contract: ONE pass — per-row weight is a projection, the
   * per-key sums partially aggregate map-side, and the shuffle carries
   * |keys| rows. Headroom: score < n_events_per_key · 2^maxWeeks, so
   * the default maxWeeks = 26 leaves room for ~10^11 events per key in
   * a long.
   *
   * @return one row per key: (key, n_events_in_horizon, score)
   */
  def halfLifeEngagement(events: DataFrame, keyCol: Column, tsCol: Column,
      maxWeeks: Int = 26): DataFrame = {
    require(maxWeeks >= 0 && maxWeeks <= 60,
      s"maxWeeks must be in [0, 60] (bit-shift headroom), got $maxWeeks")
    val weekUs = 7L * 24L * 3600L * 1000000L
    val horizon = events.agg(max(unix_micros(tsCol)).as("h_us"))
    events
      .select(keyCol.as("key"), unix_micros(tsCol).as("us"))
      .crossJoin(broadcast(horizon))
      .select(col("key"),
        expr(s"(h_us - us) div ${weekUs}L").as("w"))
      .groupBy(col("key"))
      .agg(
        sum(when(col("w") <= maxWeeks, 1L).otherwise(0L))
          .as("n_events_in_horizon"),
        sum(when(col("w") <= maxWeeks,
          expr(s"shiftleft(1L, cast($maxWeeks - w as int))"))
          .otherwise(0L)).as("score"))
  }
}
