package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-balance diagnostics: is the training mix dominated by a few
 * keys? A mix audit wants ONE number to threshold on, not a histogram
 * to eyeball — the Gini coefficient of the per-key weight distribution
 * is that number (0 = perfectly even, →1 = one key holds everything),
 * the same statistic data-mixing papers report for source skew.
 */
object Balance {

  /**
   * Gini coefficient of total `weight` per `key`, INTEGER-EXACT: with
   * the n per-key totals x₁ ≤ … ≤ xₙ (ties broken by key, which cannot
   * change the sums below) and W = Σx,
   *
   *   G = (2·Σ i·xᵢ − (n+1)·W) / (n·W)
   *
   * shipped as the exact rational (gini_num, gini_den) — no float
   * crosses an engine boundary, so a SQL oracle re-derives it
   * bit-for-bit. G = 0 ⟺ num = 0; the empty/zero-weight corpus yields
   * den = 0 with num = 0 (no distribution to price).
   *
   * Scale contract: row volume dies in the FIRST aggregation (per-key
   * totals combine map-side); the rank window and the final reduction
   * run over |keys| rows — a corpus of any size prices its balance
   * through a |keys|-sized tail.
   *
   * @return one row: (n_keys, total, gini_num, gini_den)
   */
  def gini(df: DataFrame, key: Column, weight: Column): DataFrame = {
    val perKey = df.select(key.as("k"), weight.cast("long").as("w"))
      .groupBy(col("k")).agg(sum(col("w")).as("x"))
    val ranked = perKey.select(col("x"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("x").asc, col("k").asc)).cast("long").as("i"))
    ranked.agg(count(lit(1)).as("n_keys"),
        coalesce(sum(col("x")), lit(0L)).as("total"),
        coalesce(sum(col("i") * col("x")), lit(0L)).as("iw"))
      .select(col("n_keys"), col("total"),
        (lit(2L) * col("iw") - (col("n_keys") + 1L) * col("total"))
          .as("gini_num"),
        (col("n_keys") * col("total")).as("gini_den"))
  }
}
