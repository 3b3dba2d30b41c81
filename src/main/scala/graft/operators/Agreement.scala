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

  /**
   * Fleiss' kappa over LONG-format ratings (one row per rating:
   * item, label) — the ≥3-rater generalization of [[cohenKappa]]: do R
   * raters (or R independent quality heuristics) agree on their
   * per-item labels beyond chance? INTEGER-EXACT like Cohen: with n
   * items, r ratings per item, T = Σ_items Σ_labels n_il² and
   * E = Σ_labels (column total)²,
   *
   *   κ = (n·r·(T − n·r) − E·(r−1)) / ((n²·r² − E)·(r−1))
   *
   * (Fleiss 1971 rearranged over the common denominator n²r²(r−1)) —
   * shipped as the exact rational (kappa_num, kappa_den), no division
   * in-engine (negative κ + floor-vs-truncate is the same portability
   * trap Cohen dodges).
   *
   * Fleiss REQUIRES a constant rating count per item. The operator
   * verifies it instead of assuming it: the result row carries
   * (r_min, r_max), and the kappa columns are NULL when r_min ≠ r_max
   * or r < 2 — a violated precondition is visible in the output, never
   * silently mispriced.
   *
   * Scale contract: one pass builds the (item, label) count table —
   * the shuffle carries item-label coordinates — then everything
   * reduces through item- and label-bounded aggregates. Headroom:
   * n²·r²·(r−1) must fit a long ⇒ n·r ≲ 2.1e9/√(r−1) ratings per audit
   * (partition larger corpora, as with Cohen).
   *
   * @return one row: (n_items, r_min, r_max, sum_sq, cat_sq,
   *   kappa_num, kappa_den) with sum_sq = T, cat_sq = E
   */
  def fleissKappa(ratings: DataFrame, item: Column, label: Column): DataFrame = {
    // ONE linear chain, no fan-out: every reduction the statistic needs
    // is either item-decomposable (n, r_min, r_max, T = Σc² — from the
    // per-item grouping) or label-decomposable (E = Σ(column total)² —
    // from the per-label grouping), so the count table flows through a
    // 2-set GROUPING SETS pass (Expand ×2 of the already-reduced table,
    // NOT of the ratings) and one conditional final aggregate. A
    // persist + four separate consumer jobs was measured as ~0.5 s of
    // pure barrier latency on small inputs; this shape is a single job.
    // grouping_id over (it, lb): 1 = per-item set (lb aggregated away),
    // 2 = per-label set — disambiguates genuine null keys.
    val cnt = ratings.select(item.as("it"), label.as("lb"))
      .groupBy(col("it"), col("lb")).agg(count(lit(1)).as("c"))
    val sets = cnt
      .groupingSets(Seq(Seq(col("it")), Seq(col("lb"))), col("it"), col("lb"))
      .agg(sum(col("c")).as("s1"), sum(col("c") * col("c")).as("s2"),
        grouping_id().as("gid"))
    val perItem = col("gid") === 1
    val perLabel = col("gid") === 2
    val shapeTE = sets.agg(
      coalesce(sum(when(perItem, 1L)), lit(0L)).as("n_items"),
      coalesce(min(when(perItem, col("s1"))), lit(0L)).as("r_min"),
      coalesce(max(when(perItem, col("s1"))), lit(0L)).as("r_max"),
      coalesce(sum(when(perItem, col("s2"))), lit(0L)).as("sum_sq"),
      coalesce(sum(when(perLabel, col("s1") * col("s1"))), lit(0L))
        .as("cat_sq"))
    val ok = col("r_min") === col("r_max") && col("r_min") >= 2L
    val n = col("n_items"); val r = col("r_min")
    shapeTE
      .select(col("n_items"), col("r_min"), col("r_max"),
        col("sum_sq"), col("cat_sq"),
        when(ok, n * r * (col("sum_sq") - n * r)
          - col("cat_sq") * (r - 1L)).as("kappa_num"),
        when(ok, (n * n * r * r - col("cat_sq")) * (r - 1L)).as("kappa_den"))
  }
}
