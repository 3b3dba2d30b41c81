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

  /**
   * Krippendorff's alpha (nominal data) over LONG-format ratings —
   * the agreement statistic for the regime [[fleissKappa]] REJECTS:
   * raters may abstain, so units carry VARYING rating counts m_u
   * (units with m_u < 2 are unpairable and excluded, per Krippendorff
   * 1970/2004). INTEGER-EXACT despite the per-unit denominators: with
   * a_u = m_u² − Σ_c n_uc² (disagreeing ordered pairs within unit u),
   * n = Σ m_u over pairable units, N_c = label totals over pairable
   * units, and E = n² − Σ_c N_c²,
   *
   *   α = 1 − (n−1)·Σ_u a_u/(m_u−1) / E
   *
   * Every m_u − 1 divides L = lcm(1 .. maxRaters−1), so the rational
   * sum Σ a_u/(m_u−1) ships exactly as D = Σ a_u·(L div (m_u−1)) over
   * denominator L, and α = (L·E − (n−1)·D) / (L·E) — one integer pair,
   * no float anywhere, any engine re-derives it bit-for-bit.
   *
   * `maxRaters` is the caller's promise, VERIFIED in-result: the row
   * carries (m_min, m_max) and the alpha columns are NULL when
   * m_max > maxRaters (the lcm would no longer clear the denominators),
   * n < 2, or E = 0 (all pairable ratings share one label — α is
   * undefined, not 1). Headroom: L·n² must fit a long; L = lcm(1..r−1)
   * grows fast (r = 8 → 420), so n ≲ 3e9/√L ratings per audit —
   * partition larger corpora by source/day as with the kappas.
   *
   * Scale contract: one pass builds the (item, label) count table; a
   * per-item window on that COORDINATE table (never the ratings)
   * attaches m_u for the pairable filter and the label totals; then the
   * same 2-set GROUPING SETS fold as Fleiss — single linear job.
   *
   * @return one row: (n_pairable, n_units, m_min, m_max, lcm_r,
   *   d_o_lcm, e_pairs, alpha_num, alpha_den)
   */
  def krippendorffAlpha(ratings: DataFrame, item: Column, label: Column,
      maxRaters: Int): DataFrame = {
    require(maxRaters >= 2 && maxRaters <= 43,
      s"maxRaters must be in [2, 43] (lcm(1..43) overflows Long), got $maxRaters")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcmR = (1L to (maxRaters - 1).toLong).reduce((a, b) => a / gcd(a, b) * b)
    val cnt = ratings.select(item.as("it"), label.as("lb"))
      .groupBy(col("it"), col("lb")).agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("it"))
    val pair = cnt.withColumn("m", sum(col("c")).over(w))
      .filter(col("m") >= 2L)
    val sets = pair
      .groupingSets(Seq(Seq(col("it")), Seq(col("lb"))), col("it"), col("lb"))
      .agg(sum(col("c")).as("s1"), sum(col("c") * col("c")).as("s2"),
        grouping_id().as("gid"))
    val perItem = col("gid") === 1
    val perLabel = col("gid") === 2
    // Per-item rows: s1 = m_u, s2 = Σ n_uc²; per-label rows: s1 = N_c.
    val aggd = sets.agg(
      coalesce(sum(when(perItem, col("s1"))), lit(0L)).as("n_pairable"),
      coalesce(sum(when(perItem, 1L)), lit(0L)).as("n_units"),
      coalesce(min(when(perItem, col("s1"))), lit(0L)).as("m_min"),
      coalesce(max(when(perItem, col("s1"))), lit(0L)).as("m_max"),
      coalesce(sum(when(perItem, (col("s1") * col("s1") - col("s2"))
        * expr(s"${lcmR}L div (s1 - 1L)"))), lit(0L)).as("d_o_lcm"),
      coalesce(sum(when(perLabel, col("s1") * col("s1"))), lit(0L))
        .as("cat_sq"))
    val n = col("n_pairable")
    val e = n * n - col("cat_sq")
    val ok = col("m_max") <= lit(maxRaters.toLong) && n >= 2L && e > 0L
    aggd.select(n, col("n_units"), col("m_min"), col("m_max"),
      lit(lcmR).as("lcm_r"), col("d_o_lcm"), e.as("e_pairs"),
      when(ok, lit(lcmR) * e - (n - 1L) * col("d_o_lcm")).as("alpha_num"),
      when(ok, lit(lcmR) * e).as("alpha_den"))
  }

  /**
   * Quadratic-weighted kappa (Cohen 1968) for ORDINAL labels — the
   * agreement read [[cohenKappa]] misprices on graded scales: nominal
   * kappa charges a 1-vs-2 disagreement exactly like 1-vs-5, while a
   * quality-tier or Likert audit needs near-misses to cost (i−j)². With
   * observed counts O_ij, marginals r_i / c_j, and N pairs,
   *
   *   κ_w = 1 − N·Σ(i−j)²O_ij / Σ(i−j)²r_i·c_j = (W − N·D_o) / W
   *
   * over the common denominator W = Σ_ij (i−j)²·r_i·c_j — shipped as
   * the exact integer rational (kappa_num, kappa_den), no division
   * in-engine. Labels must already be integer ordinal codes; rows with
   * a null code on either side are excluded (both raters must speak).
   *
   * Scale contract: row volume dies in the confusion-matrix count (the
   * shuffle carries label-pair coordinates); D_o folds off the matrix
   * and W off the broadcast cross of the two marginal VECTORS —
   * |A-labels|·|B-labels| coordinate rows, the chi-square margin-cross
   * shape. Headroom: W ≤ span²·N² must fit a long ⇒ N ≲ 3e9/span pairs
   * per audit window (span = max|i−j|); partition larger corpora, as
   * with Cohen/Fleiss.
   *
   * @return one row: (n, d_obs, kappa_num, kappa_den)
   */
  def weightedKappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val conf = df.select(a.cast("long").as("la"), b.cast("long").as("lb"))
      .filter(col("la").isNotNull && col("lb").isNotNull)
      .groupBy(col("la"), col("lb")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dObs = conf.agg(coalesce(sum(
      (col("la") - col("lb")) * (col("la") - col("lb")) * col("c")),
      lit(0L)).as("d_obs"),
      coalesce(sum(col("c")), lit(0L)).as("n"))
    val ra = conf.groupBy(col("la")).agg(sum(col("c")).as("r"))
    val cb = conf.groupBy(col("lb")).agg(sum(col("c")).as("cc"))
    val w = ra.crossJoin(broadcast(cb))
      .agg(coalesce(sum(
        (col("la") - col("lb")) * (col("la") - col("lb")) *
          col("r") * col("cc")), lit(0L)).as("w_cross"))
    dObs.crossJoin(broadcast(w))
      .select(col("n"), col("d_obs"),
        (col("w_cross") - col("n") * col("d_obs")).as("kappa_num"),
        col("w_cross").as("kappa_den"))
  }
}
