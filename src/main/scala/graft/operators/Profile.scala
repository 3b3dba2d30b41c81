package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Relational column profiling — the "what is in this table" pass every
 * ingest runs before heavier pipeline stages: per column, row/null/distinct
 * counts, lexicographic min/max, and total value length, all from ONE scan
 * of the input.
 *
 * Shape: the caller supplies `(profile-name -> normalized string column)`
 * pairs; the operator stacks them into (col_name, value) rows and
 * aggregates twice:
 *
 *  1. `groupBy(col_name, value) -> cnt` — the duplicate-collapsing level.
 *     Partial aggregation collapses repeats map-side, so the only full
 *     shuffle carries one row per DISTINCT (column, value), not one per
 *     cell. This is deliberately NOT `countDistinct` alongside the other
 *     aggregates: that plan rewrites through an Expand (k× the scan rows
 *     through the exchange for k aggregates); two cascaded hash
 *     aggregates keep the exchange proportional to the distinct count.
 *  2. `groupBy(col_name)` — folds the per-value counts into the profile
 *     row; every metric (n_rows, n_null, n_distinct, min, max,
 *     total_len) is derivable from (value, cnt) exactly.
 *
 * The caller normalizes values to strings (quantize doubles, cast ints)
 * so the profile is engine-portable: every metric, including min/max, is
 * defined on the normalized string domain. At 100 TB swap stage 1's exact
 * distinct for the HLL sketches in [[graft.hll.functions]] when estimates
 * suffice — same stacked layout, one aggregate level instead of two.
 */
object Profile {

  def profile(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val stacked = df.select(stack(
      lit(cols.size) +: cols.flatMap { case (n, c) =>
        Seq(lit(n), c.cast("string"))
      }: _*).as(Seq("col_name", "value")))
    val perValue = stacked
      .groupBy(col("col_name"), col("value"))
      .agg(count(lit(1)).as("cnt"))
    perValue.groupBy(col("col_name")).agg(
      sum(col("cnt")).as("n_rows"),
      sum(when(col("value").isNull, col("cnt")).otherwise(0L)).as("n_null"),
      count(when(col("value").isNotNull, 1)).as("n_distinct"),
      min(col("value")).as("min_value"),
      max(col("value")).as("max_value"),
      sum(when(col("value").isNotNull, col("cnt") * length(col("value")))
        .otherwise(0L)).as("total_len"))
  }
}
