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

  /**
   * Categorical independence audit (Pearson's chi-square), EXACT: for
   * the contingency table of `rowKey` × `colKey`, each cell's χ²
   * contribution (O − E)²/E with E = R·C/N rewrites as the integer
   * rational
   *
   *   (N·O − R·C)² / (N·R·C)
   *
   * — shipped per cell as (chi_num, chi_den) STRINGS (the FIXTURES.md
   * output-type contract: the square exceeds a Long at corpus scale —
   * N·O ~ 10¹¹ already overflows when squared — and wide
   * decimal/HUGEINT columns diverge in representation across engine
   * boundaries; arithmetic is exact DECIMAL(38,0) internally, which
   * holds N up to ~10⁹ rows). Absent
   * (O = 0) cells of the observed-margin cross product are INCLUDED —
   * the statistic's definition prices them at (R·C)²/(N·R·C) — so any
   * engine derives the identical row set. χ² itself and Cramér's V are
   * the consumer's fold over the shipped rationals (varying
   * denominators — never a float in-engine); dof = (rows−1)(cols−1)
   * falls out of the margins.
   *
   * The mix-dependence question this answers: is `colKey` distributed
   * the same way within every `rowKey` (χ² ≈ 0), or does the corpus
   * confound them (e.g. one source supplying nearly all of one
   * language — the hidden-correlation check a mixing plan runs before
   * treating source and language quotas as independent knobs)?
   *
   * Scale contract: row volume dies in the (rowKey, colKey) count
   * aggregation; margins reduce that cell table, and the final cross
   * join is |rows| × |cols| BROADCAST coordinates.
   *
   * @return one row per margin-cross cell: (rk, ck, o, r_tot, c_tot,
   *         n, chi_num, chi_den), ordered by (rk, ck)
   */
  def chiSquareIndependence(df: DataFrame, rowKey: Column,
      colKey: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df
      .select(rowKey.cast("string").as("rk"), colKey.cast("string").as("ck"))
      .filter(col("rk").isNotNull && col("ck").isNotNull)
      .groupBy(col("rk"), col("ck")).agg(count(lit(1)).as("o"))
    val rowMargin = cells.groupBy(col("rk")).agg(sum(col("o")).as("r_tot"))
    val colMargin = cells.groupBy(col("ck")).agg(sum(col("o")).as("c_tot"))
    val n = cells.agg(sum(col("o")).as("n"))
    rowMargin.crossJoin(broadcast(colMargin)).crossJoin(broadcast(n))
      .join(cells, Seq("rk", "ck"), "left")
      .select(col("rk"), col("ck"), coalesce(col("o"), lit(0L)).as("o"),
        col("r_tot"), col("c_tot"), col("n"))
      .select(col("rk"), col("ck"), col("o"), col("r_tot"), col("c_tot"),
        col("n"),
        expr(s"cast(n as $dec) * cast(o as $dec) - " +
          s"cast(r_tot as $dec) * cast(c_tot as $dec)").as("d"))
      .select(col("rk"), col("ck"), col("o"), col("r_tot"), col("c_tot"),
        col("n"),
        expr(s"cast(d * d as $dec)").cast("string").as("chi_num"),
        expr(s"cast(cast(n as $dec) * cast(r_tot as $dec) * " +
          s"cast(c_tot as $dec) as $dec)").cast("string").as("chi_den"))
      .orderBy(col("rk"), col("ck"))
  }

  /**
   * Categorical mix shift between two corpus releases (total variation
   * distance), EXACT: with per-key counts c (previous, total P) and
   * d (current, total C),
   *
   *   TV = ½ Σ_k |c_k/P − d_k/C| = Σ_k |c_k·C − d_k·P| / (2·P·C)
   *
   * — the one-number bounded drift read ([0, 1]: 0 = identical mix,
   * 1 = disjoint) a release gate thresholds on before retraining
   * mixing weights. Ships the per-key deviation table (the drift's
   * WHERE) plus a key = null total row; TV itself is the consumer's
   * one division, total.dev / (2·total.n_prev·total.n_cur). Keys
   * present in only one release contribute their full share, as the
   * metric requires (full outer join of the count tables). Long-exact
   * while count·total < 2⁶³ (~10⁹ rows per release).
   *
   * Scale shape: row volume dies in the two per-key counting
   * aggregations; everything after runs over |keys| rows with the
   * totals broadcast.
   *
   * @return (k, n_prev, n_cur, dev) per key, plus the total row
   *         (k = null, P, C, Σdev), ordered by k nulls-last
   */
  def mixShift(prev: DataFrame, cur: DataFrame, key: Column): DataFrame = {
    val p = prev.select(key.cast("string").as("k"))
      .filter(col("k").isNotNull)
      .groupBy(col("k")).agg(count(lit(1)).as("n_prev"))
    val c = cur.select(key.cast("string").as("k"))
      .filter(col("k").isNotNull)
      .groupBy(col("k")).agg(count(lit(1)).as("n_cur"))
    val joined = p.join(c, Seq("k"), "full_outer")
      .select(col("k"), coalesce(col("n_prev"), lit(0L)).as("n_prev"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = joined.agg(
      coalesce(sum(col("n_prev")), lit(0L)).as("tp"),
      coalesce(sum(col("n_cur")), lit(0L)).as("tc"))
    val per = joined.crossJoin(broadcast(tot))
      .select(col("k"), col("n_prev"), col("n_cur"),
        abs(col("n_prev") * col("tc") - col("n_cur") * col("tp")).as("dev"))
    val totalRow = per
      .agg(coalesce(sum(col("dev")), lit(0L)).as("dev"))
      .crossJoin(broadcast(tot))
      .select(lit(null).cast("string").as("k"), col("tp").as("n_prev"),
        col("tc").as("n_cur"), col("dev"))
    per.unionByName(totalRow).orderBy(col("k").asc_nulls_last)
  }
}
