package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Classifier-quality evaluation over integer scores — the checks a
 * curation pipeline runs on its heuristic scorers (quality signals,
 * language evidence, perceptron outputs) before trusting them to gate
 * data. Everything ships as exact integer rationals: thresholds and
 * dashboards can divide, the engine never does.
 */
object Eval {

  /**
   * Exact ROC-AUC of an integer score against a boolean label, by the
   * rank-sum (Mann–Whitney) identity with midrank tie handling:
   *
   *   AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻)
   *
   * where R⁺ sums the (ascending-score) midranks of the positives.
   * Shipped as (auc_num, auc_den) = (2R⁺ − n⁺(n⁺+1), 2·n⁺·n⁻) — doubled
   * so tie midranks (halves) stay integer, no float anywhere, any
   * engine re-derives it bit-for-bit. Degenerate single-class inputs
   * yield den = 0 (no ranking to price).
   *
   * Scale contract: ranks come from the SCORE HISTOGRAM, not a per-row
   * window — a tie group ending at cumulative count c with cnt members
   * contributes midrank·2 = 2c − cnt + 1 — so row volume dies in the
   * first (score)-keyed aggregation and the cumulative window runs
   * over |distinct scores| rows (the histogramMedian pattern). The
   * bounded-universe half of that contract is ENFORCED: past
   * [[HistogramWindow.MaxBuckets]] distinct scores the query raises
   * (an effectively continuous score must be quantized) instead of
   * silently single-tasking the universe. Rows with null score or
   * null label are excluded (they have no rank).
   *
   * @return one row: (n_pos, n_neg, rank_sum_x2, auc_num, auc_den)
   */
  def rankAuc(df: DataFrame, score: Column, positive: Column): DataFrame =
    rankAucBounded(df, score, positive, HistogramWindow.MaxBuckets)

  /** [[rankAuc]] with the bucket bound as a test seam (red-then-green
   * guard specs shrink it; production uses the default above). */
  private[operators] def rankAucBounded(df: DataFrame, score: Column,
      positive: Column, maxBuckets: Long): DataFrame = {
    val base = df.select(score.cast("long").as("s"),
        positive.cast("boolean").as("p"))
      .filter(col("s").isNotNull && col("p").isNotNull)
    val hist = base.groupBy(col("s"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("p"), 1L).otherwise(0L)).as("cp"))
    hist
      .select(col("cnt"), col("cp"),
        HistogramWindow.cumCountGuarded(col("cnt"), col("s"),
          "rankAuc", "score buckets", maxBuckets).as("c"))
      .agg(coalesce(sum(col("cp")), lit(0L)).as("n_pos"),
        coalesce(sum(col("cnt") - col("cp")), lit(0L)).as("n_neg"),
        coalesce(sum(col("cp") * (lit(2L) * col("c") - col("cnt") + 1L)),
          lit(0L)).as("rank_sum_x2"))
      .select(col("n_pos"), col("n_neg"), col("rank_sum_x2"),
        (col("rank_sum_x2") - col("n_pos") * (col("n_pos") + 1L))
          .as("auc_num"),
        (lit(2L) * col("n_pos") * col("n_neg")).as("auc_den"))
  }

  /**
   * Selection-rate disparity across groups: after any keep/drop
   * decision, which group is selected MOST and which LEAST, and the
   * exact gap between their rates — the curation-bias audit
   * (a length filter that quietly drops one source's documents twice
   * as often is a dataset-composition decision someone should see).
   *
   * Group ordering uses the e6-truncated rate with the group key as
   * tiebreak — deterministic and engine-identical (rates equal through
   * e6 count as tied; the key decides). The GAP itself is exact:
   * gap = max_kept/max_n − min_kept/min_n shipped as the rational
   * (max_kept·min_n − min_kept·max_n, max_n·min_n).
   *
   * Scale contract: row volume dies in the per-group counting
   * aggregation; the argmax/argmin ride min/max over |groups| structs.
   *
   * @return one row: (n_groups, max_group, max_kept, max_n, min_group,
   *   min_kept, min_n, gap_num, gap_den)
   */
  def keepRateDisparity(df: DataFrame, group: Column,
      keep: Column): DataFrame = {
    val per = df.groupBy(group.cast("string").as("k"))
      .agg(count(lit(1)).as("n"),
        sum(when(keep, 1L).otherwise(0L)).as("kept"))
    val rateE6 = expr("kept * 1000000L div n")
    per
      .select(struct(rateE6.as("r"), col("k"), col("kept"), col("n")).as("st"))
      .agg(count(lit(1)).as("n_groups"),
        max(col("st")).as("mx"), min(col("st")).as("mn"))
      .select(col("n_groups"),
        col("mx.k").as("max_group"), col("mx.kept").as("max_kept"),
        col("mx.n").as("max_n"),
        col("mn.k").as("min_group"), col("mn.kept").as("min_kept"),
        col("mn.n").as("min_n"),
        (col("mx.kept") * col("mn.n") - col("mn.kept") * col("mx.n"))
          .as("gap_num"),
        (col("mx.n") * col("mn.n")).as("gap_den"))
  }

  /**
   * Scorer calibration audit: the reliability diagram plus exact
   * expected calibration error for a confidence in [0, 1e6] against a
   * boolean outcome — the check a pipeline runs before gating on a
   * scorer's VALUE (auto-labeling, confidence-weighted sampling) rather
   * than just its ranking (that is [[rankAuc]]'s job).
   *
   * Confidences bucket into `bins` equal-width bins (`conf_e6 div
   * (1e6/bins)`, the top edge clamped into the last bin). Per bin the
   * diagram needs only integers: `n_docs`, `n_pos`, `conf_sum_e6` — and
   * the bin's ECE contribution is `dev_e6 = |1e6·n_pos − conf_sum_e6|`,
   * because (n_b/N)·|acc_b − conf̄_b| over a common denominator 1e6·N
   * has exactly that numerator. The appended total row (bin = null)
   * sums the diagram, so ECE = total.dev_e6 / (1e6·total.n_docs) — one
   * exact rational, never a float in-engine.
   *
   * Scale shape: row volume dies in the per-bin aggregation; the total
   * row folds ≤ `bins` rows. Rows with null confidence or outcome are
   * excluded; empty bins are absent (any engine groups identically).
   *
   * @param confE6 integer confidence scaled by 1e6 (already truncated —
   *               hand the SAME integer expression to the oracle)
   * @return (bin, n_docs, n_pos, conf_sum_e6, dev_e6) per non-empty bin
   *         plus the total row with bin = null
   */
  def calibrationAudit(df: DataFrame, confE6: Column, positive: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && 1000000 % bins == 0,
      s"bins must be >= 2 and divide 1e6, got $bins")
    val width = 1000000L / bins
    val binned = df
      .select(confE6.cast("long").as("conf_e6"),
        positive.cast("boolean").as("p"))
      .filter(col("conf_e6").isNotNull && col("p").isNotNull)
      .select(least(expr(s"conf_e6 div $width"), lit(bins - 1L))
        .cast("int").as("bin"), col("p"), col("conf_e6"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("p"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("conf_e6")).as("conf_sum_e6"))
      .withColumn("dev_e6",
        abs(lit(1000000L) * col("n_pos") - col("conf_sum_e6")))
    val total = binned
      .agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
        coalesce(sum(col("n_pos")), lit(0L)).as("n_pos"),
        coalesce(sum(col("conf_sum_e6")), lit(0L)).as("conf_sum_e6"),
        coalesce(sum(col("dev_e6")), lit(0L)).as("dev_e6"))
      .select(lit(null).cast("int").as("bin"), col("n_docs"),
        col("n_pos"), col("conf_sum_e6"), col("dev_e6"))
    binned.unionByName(total).orderBy(col("bin").asc_nulls_last)
  }

  /**
   * McNemar's paired-rule test, EXACT: for two keep/drop rules applied
   * to the same rows, the 2×2 disagreement table and the statistic
   *
   *   χ²_McNemar = (b − c)² / (b + c)
   *
   * where b = rows rule A keeps but B drops, c = the reverse — the
   * "did swapping filters actually change WHICH rows survive, or only
   * how many" check a pipeline runs before declaring two curation
   * rules interchangeable (their keep RATES can match while they keep
   * disjoint halves of the corpus; the concordant cells a and d never
   * enter the statistic, only the disagreement does). Integer
   * numerator/denominator; b + c = 0 (perfect agreement) ships den = 0.
   *
   * Scale shape: ONE counting aggregation — row volume dies map-side
   * into four counters. Rows where either rule is null are excluded
   * (they have no pair).
   *
   * @return one row: (n_both, n_a_only, n_b_only, n_neither,
   *         mcnemar_num, mcnemar_den)
   */
  def mcnemar(df: DataFrame, keepA: Column, keepB: Column): DataFrame = {
    df.select(keepA.cast("boolean").as("a"), keepB.cast("boolean").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .agg(
        coalesce(sum(when(col("a") && col("b"), 1L).otherwise(0L)), lit(0L))
          .as("n_both"),
        coalesce(sum(when(col("a") && !col("b"), 1L).otherwise(0L)), lit(0L))
          .as("n_a_only"),
        coalesce(sum(when(!col("a") && col("b"), 1L).otherwise(0L)), lit(0L))
          .as("n_b_only"),
        coalesce(sum(when(!col("a") && !col("b"), 1L).otherwise(0L)), lit(0L))
          .as("n_neither"))
      .select(col("n_both"), col("n_a_only"), col("n_b_only"),
        col("n_neither"),
        ((col("n_a_only") - col("n_b_only")) *
          (col("n_a_only") - col("n_b_only"))).as("mcnemar_num"),
        (col("n_a_only") + col("n_b_only")).as("mcnemar_den"))
  }

  /**
   * K-sample rank test pieces (Kruskal–Wallis), EXACT: do the k groups
   * draw `score` from the same distribution? The one-way nonparametric
   * ANOVA generalizing [[rankAuc]]'s two-class rank-sum — the "do my
   * sources differ in length/quality profile at all" gate before
   * per-source remediation.
   *
   * Ships the integer pieces any engine re-derives bit-for-bit: per
   * group (g, n, rank_sum_x2) with doubled midranks (ties stay
   * integer), plus a g = null total row carrying N, Σ2·ranks = N(N+1)
   * (the built-in sanity identity), and the tie term Σ(t³−t). The
   * consumer folds H = [3/(N(N+1))]·Σ rank_sum_x2²/(4n_g) − 3(N+1),
   * tie-corrected by 1 − Σ(t³−t)/(N³−N) — a ≤|groups|-row client-side
   * fold over shipped integers (varying n_g denominators make the
   * fully-reduced rational the consumer's job, the MAP@k convention).
   *
   * Scale contract: the (score, group) count table kills row volume;
   * global midranks come from the SCORE HISTOGRAM (the [[rankAuc]]
   * pattern — the one window runs over |distinct scores| rows, never
   * per row); the per-group reduction is |scores|×|groups|
   * coordinates. Null scores/groups are excluded.
   *
   * @return (g, n, rank_sum_x2, tie_t3) per group (tie_t3 null), plus
   *         the total row (g = null), ordered by g nulls-last
   */
  def kruskalWallis(df: DataFrame, score: Column,
      group: Column): DataFrame = {
    val base = df.select(score.cast("long").as("s"),
        group.cast("string").as("g"))
      .filter(col("s").isNotNull && col("g").isNotNull)
    val histG = base.groupBy(col("s"), col("g"))
      .agg(count(lit(1)).as("cg"))
    val hist = histG.groupBy(col("s")).agg(sum(col("cg")).as("cnt"))
    val cum = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mids = hist
      .select(col("s"), col("cnt"), sum(col("cnt")).over(cum).as("c"))
      .select(col("s"), col("cnt"),
        (lit(2L) * col("c") - col("cnt") + 1L).as("mid2"))
    val perG = histG
      .join(mids.select(col("s"), col("mid2")), Seq("s"))
      .groupBy(col("g"))
      .agg(sum(col("cg")).as("n"),
        sum(col("cg") * col("mid2")).as("rank_sum_x2"))
      .select(col("g"), col("n"), col("rank_sum_x2"),
        lit(null).cast("long").as("tie_t3"))
    val total = mids
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("n"),
        coalesce(sum(col("cnt") * col("mid2")), lit(0L)).as("rank_sum_x2"),
        coalesce(sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")),
          lit(0L)).as("tie_t3"))
      .select(lit(null).cast("string").as("g"), col("n"),
        col("rank_sum_x2"), col("tie_t3"))
    perG.unionByName(total).orderBy(col("g").asc_nulls_last)
  }
}
