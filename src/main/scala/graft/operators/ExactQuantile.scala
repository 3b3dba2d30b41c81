package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * EXACT per-group quantiles without a global sort — the scale-path
 * complement of the KLL sketches in [[graft.kll]]: KLL answers "p99 ±ε
 * in one pass"; this answers "p99, exactly" for the audits that demand
 * the true value (SLA attestation, billing cutoffs), at the cost of a
 * second, sliver-sized pass.
 *
 * Two-phase histogram prune (the classic distributed selection scheme):
 *
 *  1. One scan → per-(group, bucket) counts, bucket = value >> shift.
 *     The only full-data shuffle carries one row per OCCUPIED bucket per
 *     group (map-side partials collapse duplicates), never the values.
 *     A cumulative window over each group's bucket histogram locates the
 *     bucket holding the k-th element and the remaining offset into it.
 *  2. Rows of the target buckets only — expected fraction ~bucketWidth /
 *     valueRange of the input — semi-join back, sort WITHIN each tiny
 *     (group, bucket) sliver, and pick the offset element.
 *
 * k is the 1-indexed "lower" rank k = (N−1)·num/den + 1 in integer
 * arithmetic, so any engine restates the result as "the k-th smallest"
 * definitionally (the DuckDB oracle does, via row_number) — no
 * interpolation, no floats.
 *
 * `shift` trades pass-2 sliver size against histogram width: buckets per
 * group ≤ valueRange >> shift, sliver rows per group ≈ N·2^shift /
 * valueRange on flat data. Heavily-skewed single buckets degrade pass 2
 * toward a per-group sort of that bucket — pick a finer shift (or
 * re-apply the scheme inside the bucket) when a group's values pile onto
 * one point.
 *
 * Input values must be non-negative longs (quantize upstream — the
 * library's integer-units rule makes that the norm already).
 */
object ExactQuantile {

  /** One row per (group, quantile): (groupCols…, q_num, q_den, k, value).
   * `quantiles` are (num, den) rationals in [0, 1]. */
  def exactQuantilesByKey(df: DataFrame, groupCol: Column, valCol: Column,
      quantiles: Seq[(Int, Int)], shift: Int = 8): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    quantiles.foreach { case (n, d) =>
      require(d > 0 && n >= 0 && n <= d, s"quantile must be in [0,1], got $n/$d")
    }
    require(shift >= 0 && shift <= 40, s"shift in [0,40], got $shift")

    val base = df.select(groupCol.as("g"), valCol.cast("long").as("v"))
    val hist = base
      .select(col("g"), shiftright(col("v"), shift).as("bkt"))
      .groupBy("g", "bkt").agg(count(lit(1)).as("c"))

    // Per group: N, then per quantile the rank k and its target bucket —
    // the bucket where the running count first reaches k. The window runs
    // over each group's OCCUPIED buckets (bounded by valueRange >> shift),
    // not over rows.
    val cum = hist.withColumn("cum",
        sum(col("c")).over(Window.partitionBy("g").orderBy("bkt")))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("g")))
    val qdf = quantiles.map { case (num, den) =>
        lit(num).as("q_num") :: lit(den).as("q_den") :: Nil
      }.map(cs => struct(cs: _*))
    val targets = cum
      .select(col("g"), col("bkt"), col("cum"), col("c"), col("n"),
        explode(array(qdf: _*)).as("q"))
      .select(col("g"), col("bkt"), col("cum"), col("c"), col("n"),
        col("q.q_num").as("q_num"), col("q.q_den").as("q_den"))
      // Integer `div`, not `/`: Spark's `/` on longs is double division,
      // which can round up across an integer for large N (the q60 rule).
      .withColumn("k", expr("(n - 1) * q_num div q_den + 1").cast("long"))
      .filter(col("cum") >= col("k") && col("cum") - col("c") < col("k"))
      .select(col("g"), col("q_num"), col("q_den"), col("k"), col("bkt"),
        (col("k") - (col("cum") - col("c"))).as("off")) // 1-indexed offset in bucket

    // Pass 2: only the target buckets' rows come back; sort each sliver.
    val slivers = base
      .select(col("g"), col("v"), shiftright(col("v"), shift).as("bkt"))
      .join(targets.select(col("g"), col("bkt")).distinct(), Seq("g", "bkt"))
      .groupBy("g", "bkt")
      .agg(sort_array(collect_list(col("v"))).as("vs"))
    targets.join(slivers, Seq("g", "bkt"))
      .select(col("g"), col("q_num"), col("q_den"), col("k"),
        element_at(col("vs"), col("off").cast("int")).as("value"))
  }

  /**
   * Robust per-group outlier detection via median / MAD — the
   * outlier-FLAGGING counterpart of the winsorize clip (q134): a value is
   * an outlier when |v − median| · kDen > MAD · kNum, with MAD the exact
   * median of absolute deviations. Median/MAD resist the very outliers
   * they hunt, which mean/stddev famously do not (one corrupt
   * billion-token document drags a mean threshold past itself).
   *
   * Integer-exact end to end: both medians come from
   * [[exactQuantilesByKey]]'s lower-rank definition and the threshold is
   * a cross-multiplied rational — no 1.4826 consistency constant in the
   * engine (fold it into k: the default 3/1 on raw MAD ≈ 4.45 scaled
   * MADs, a conservative flag). Degenerate groups where MAD = 0 (over
   * half the group identical) flag every deviating value, the honest
   * reading of "the robust spread is zero".
   *
   * Scale: two chained median derivations + one counting pass, all over
   * (group, value) coordinates — the exactness price, same family floor
   * as winsorize; the per-group (median, MAD) tables broadcast back.
   * Median strategy: `viaHistogram = true` (the default) takes each
   * median from the per-group value HISTOGRAM's cumulative counts — one
   * aggregation plus a per-group window over |distinct values| rows,
   * ~2.6× faster than the sliver machinery when the value domain is
   * bounded (lengths, scores in fixed units: the usual case). A domain
   * that is NOT bounded (raw hashes, micros) would turn that window
   * into a per-group sort — pass `viaHistogram = false` to route both
   * medians through [[exactQuantilesByKey]]'s bucket-sliver two-phase
   * instead. Both paths produce identical lower-rank medians.
   *
   * @return one row per group: (g, n, med, mad, n_outliers, max_dev)
   */
  def madOutliers(df: DataFrame, groupCol: Column, valCol: Column,
      kNum: Long = 3, kDen: Long = 1, shift: Int = 8,
      viaHistogram: Boolean = true): DataFrame = {
    require(kNum >= 0 && kDen > 0, s"k must be a non-negative rational, got $kNum/$kDen")
    def median(in: DataFrame, out: String): DataFrame =
      if (viaHistogram) histogramMedian(in, out)
      else exactQuantilesByKey(in, col("g"), col("v"), Seq((1, 2)), shift)
        .select(col("g"), col("value").as(out))
    // Nulls are excluded up front (ADVICE r12): the histogram path's
    // ascending cumulative window would otherwise rank nulls FIRST while
    // the sliver path and a SQL oracle (NULLS LAST, NULL comparisons
    // excluded) place them differently — dropping them is the one
    // semantics all three agree on ("median ignores NULLs").
    val base = df.select(groupCol.as("g"), valCol.cast("long").as("v"))
      .filter(col("v").isNotNull)
    val med = median(base, "med")
    val dev = base.join(broadcast(med), "g")
      .select(col("g"), col("med"), abs(col("v") - col("med")).as("d"))
    val mad = median(dev.select(col("g"), col("d").as("v")), "mad")
    dev.join(broadcast(mad), "g")
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("d") * kDen > col("mad") * kNum, 1L).otherwise(0L))
          .as("n_outliers"),
        max(col("d")).as("max_dev"))
  }

  /** Lower-rank median from the per-group value histogram: rank
   * (n−1) div 2 + 1 falls in the value whose cumulative count first
   * reaches it. One aggregation + a per-group cumulative window over
   * |distinct values| rows. */
  private def histogramMedian(in: DataFrame, out: String): DataFrame = {
    val hist = in.groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wg = Window.partitionBy("g")
    hist
      .select(col("g"), col("v"), col("cnt"),
        sum(col("cnt")).over(w).as("c"), sum(col("cnt")).over(wg).as("n"))
      .filter(col("c") >= expr("(n - 1) div 2 + 1") &&
        col("c") - col("cnt") < expr("(n - 1) div 2 + 1"))
      .select(col("g"), col("v").as(out))
  }
}
