package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Label-agreement statistics for annotation quality control — the check a
 * labeling pipeline runs between two annotators, or between a model's
 * predictions and gold labels, before trusting either: raw accuracy
 * overstates agreement whenever the label distribution is skewed (two
 * labelers who both answer the majority class "agree" constantly by
 * chance). Cohen's kappa corrects for exactly that chance agreement.
 */
object Agreement {

  /**
   * Cohen's kappa between two label columns, INTEGER-EXACT: with N rows,
   * A = agreeing rows, and S = Σ over labels of (row-marginal ×
   * column-marginal),
   *
   *   κ = (p_o − p_e) / (1 − p_e) = (N·A − S) / (N² − S)
   *
   * The result ships as the exact rational (kappa_num, kappa_den) —
   * κ can be negative (worse-than-chance) and floor- vs
   * truncate-division of negatives is an engine-portability trap, so no
   * division happens in-engine; consumers (and the oracle) compare the
   * integer pair. κ = 1 ⟺ num = den; den = 0 only in the degenerate
   * both-sides-constant-and-equal case (then num = 0 too).
   *
   * Scale contract: ONE pass builds the |A-labels|×|B-labels| confusion
   * matrix (the shuffle carries label pairs + counts); marginals, N, A,
   * and S all derive from that label-cardinality-bounded table —
   * nothing after the first aggregation touches row volume. Headroom:
   * N² must fit a long ⇒ N < ~3.0e9 rows per audit (partition larger
   * corpora by source/day, which is how agreement is read anyway).
   *
   * @return one row: (n, n_agree, chance_cross, kappa_num, kappa_den)
   *   with chance_cross = S
   */
  def cohenKappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    // PERSISTED: four consumers (marginals ×2, N, agreement) read the
    // confusion matrix, and without the cache each would re-derive it
    // from its own corpus scan. |A-labels|·|B-labels| rows — the same
    // bounded-intermediate contract as marginMinedPairs' avgs cache.
    val conf = df.select(a.as("la"), b.as("lb"))
      .groupBy(col("la"), col("lb")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ra = conf.groupBy(col("la")).agg(sum(col("c")).as("r"))
    val cb = conf.groupBy(col("lb")).agg(sum(col("c")).as("cc"))
    val n = conf.agg(coalesce(sum(col("c")), lit(0L)).as("n"))
    val agree = conf.filter(col("la") === col("lb"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("n_agree"))
    val s = ra.join(cb, col("la") === col("lb"))
      .agg(coalesce(sum(col("r") * col("cc")), lit(0L)).as("chance_cross"))
    n.crossJoin(agree).crossJoin(s)
      .select(col("n"), col("n_agree"), col("chance_cross"),
        (col("n") * col("n_agree") - col("chance_cross")).as("kappa_num"),
        (col("n") * col("n") - col("chance_cross")).as("kappa_den"))
  }
}
