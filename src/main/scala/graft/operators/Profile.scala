package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Relational column profiling — the "what is in this table" pass every
 * ingest runs before heavier pipeline stages: per column, row/null/distinct
 * counts, lexicographic min/max, and total value length.
 *
 * Shape: one branch per column — a parquet scan PRUNED to that column
 * alone, grouped on the NATIVE value (the duplicate-collapsing level),
 * then one string cast per DISTINCT value feeding the shared metrics
 * fold:
 *
 *  1. `groupBy(native value) -> cnt` per column. Partial aggregation
 *     collapses repeats map-side, so each branch's only full shuffle
 *     carries one row per DISTINCT value, not one per cell. Branches
 *     union into ONE job and their stages run concurrently; each scan
 *     reads exactly its own column, so total I/O equals the former
 *     single 5-column scan.
 *  2. `cast(value as string)` AT THE DISTINCT LEVEL, then
 *     `groupBy(col_name)` folds the per-value counts into the profile
 *     row; every metric (n_rows, n_null, n_distinct, min, max,
 *     total_len) is derivable from (value, cnt) exactly, and min/max
 *     are defined on the normalized string domain — identical output
 *     to casting before the collapse, minus |rows|·|cols| cast work.
 *
 * Two rejected shapes, both MEASURED at sf0.1 (lineitem, 600k rows,
 * round 12): a single `stack` of all columns to (col_name, string)
 * before the collapse — the round-9..11 formulation — costs 1.8 s
 * (the stack fans the scan |cols|×, every cell pays its string cast,
 * and one exchange carries all columns' distincts); a single-scan
 * multi-`countDistinct` costs 10 s (Catalyst's Expand rewrite ships
 * |cols|× rows through a wide grouping). This shape: 1.0 s, of which
 * ~0.6 s is concurrent stage wall — the exact-distinct floor (the
 * l_orderkey-style high-cardinality branch dominates). At 100 TB swap
 * a branch's exact distinct for the HLL sketches in
 * [[graft.hll.functions]] when estimates suffice — same branch layout,
 * one aggregate level instead of two.
 */
object Profile {

  def profile(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val perValue = cols.map { case (n, c) =>
      df.select(c.as("v"))
        .groupBy(col("v"))
        .agg(count(lit(1)).as("cnt"))
        .select(lit(n).as("col_name"), col("v").cast("string").as("value"),
          col("cnt"))
    }.reduce(_ unionAll _)
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
