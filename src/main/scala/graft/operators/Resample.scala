package graft.operators

import graft.operators.Sampling.md5Hash64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact resampling-based significance tests — the "is this shift real
 * or noise?" layer a curation pipeline needs on top of its drift
 * statistics (chi-square [[Balance.chiSquareIndependence]], KS, TV
 * [[Balance.mixShift]]). Classical p-values for those need continuous
 * CDFs (floats, engine-divergent); a RANDOMIZATION test needs only
 * counting: re-split the corpus B times with a deterministic hash coin,
 * recompute the statistic per pseudo-split, and report how many splits
 * produce a shift at least as large as the observed one. Every number
 * shipped is an integer or an exact integer rational, and because the
 * coin is md5 over (seed, replicate, key) — the [[Sampling]] membership
 * recipe — any engine re-derives the identical B splits bit-for-bit.
 *
 * p-values use the add-one convention p = (1 + #exceed)/(1 + B)
 * (Phipson & Smyth 2010: never zero, valid under the randomization
 * null).
 *
 * Scale contract: the corpus is scanned ONCE per test family; the
 * B-fold (or B·|groups|-fold) expansion happens per input row inside
 * the pre-aggregation pipeline (a generator directly under a partial
 * hash aggregate), so the exchange carries B (or B·|groups|) summary
 * rows per task, never expanded data. Compute cost is B md5 evaluations
 * per row — callers size B like an audit window (64-256), not like a
 * Monte Carlo run; the cost model is the same one the freq/theta sketch
 * families document.
 */
object Resample {

  private val dec = "decimal(38,0)"

  /** The hash coin's group-A indicator for pseudo-replicate `b` of row
   * `key`: the low bit of md5_hash64(seed:b:key) — uniform, independent
   * across b, identical on any engine (`('0x' || substr(md5(x), 1,
   * 16))::UBIGINT & 1` re-derives it in DuckDB). */
  private def coinBit(seed: String, b: Column, key: Column): Column =
    md5Hash64(concat(lit(seed), lit(":"), b.cast("string"), lit(":"),
      key.cast("string"))).bitwiseAND(lit(1L))

  /**
   * Two-sample randomization test for a mean shift in an integer value:
   * is mean(value | inA) − mean(value | !inA) larger than chance would
   * produce under random re-splits of the same corpus?
   *
   * The statistic is |mean_A − mean_B| as the exact cross-multiplied
   * rational: with group-A count/sum (a, sa) against total (n, s),
   * num = |sa·n − s·a| and den = a·(n−a). A pseudo-replicate exceeds
   * the observed statistic iff num_b·den_obs ≥ num_obs·den_b (38-digit
   * decimals; exact while sum·n < 10^19 and the cross products stay
   * under 10^38 — an audit-window bound, stated like the collocation
   * family's). Degenerate replicates that land everything in one group
   * (den_b = 0, probability 2^{1-n}) count as exceeding — the
   * conservative direction.
   *
   * The pseudo-splits are FAIR COINS (p = 1/2), so the test answers
   * "is the observed labeling more separated than a random balanced
   * relabeling?" — the binomial randomization test. Rows with a null
   * key, value, or label are excluded before anything is counted.
   *
   * Scale contract: one pass over the corpus; the B-fold expansion is
   * a generator directly under the partial aggregate, so B summary rows
   * per task cross the exchange and the final fold runs over B rows.
   *
   * @return one row: (n, n_in, sum_total, sum_in, stat_num, stat_den,
   *         n_perms, n_exceed, p_num, p_den)
   */
  def randomizationTest(df: DataFrame, key: Column, value: Column,
      inA: Column, perms: Int, seed: String): DataFrame = {
    require(perms > 0, s"perms must be positive, got $perms")
    val base = df.select(key.cast("string").as("k"),
        value.cast("long").as("v"), inA.cast("boolean").as("a"))
      .filter(col("k").isNotNull && col("v").isNotNull && col("a").isNotNull)
    val obs = base.agg(count(lit(1)).as("n"),
      coalesce(sum(col("v")), lit(0L)).as("s"),
      coalesce(sum(when(col("a"), 1L).otherwise(0L)), lit(0L)).as("na"),
      coalesce(sum(when(col("a"), col("v")).otherwise(0L)), lit(0L)).as("sa"))
    val perPerm = base
      .select(col("k"), col("v"),
        explode(sequence(lit(1), lit(perms))).as("b"))
      .select(col("v"), col("b"),
        coinBit(seed, col("b"), col("k")).as("bit"))
      .groupBy(col("b"))
      .agg(sum(col("bit")).as("pa"),
        coalesce(sum(when(col("bit") === 1L, col("v")).otherwise(0L)),
          lit(0L)).as("psa"))
    val withObs = perPerm.crossJoin(broadcast(obs))
      .select(col("b"),
        expr(s"abs(cast(psa as $dec) * cast(n as $dec) - " +
          s"cast(s as $dec) * cast(pa as $dec))").as("pnum"),
        expr(s"cast(pa as $dec) * (cast(n as $dec) - cast(pa as $dec))")
          .as("pden"),
        expr(s"abs(cast(sa as $dec) * cast(n as $dec) - " +
          s"cast(s as $dec) * cast(na as $dec))").as("onum"),
        expr(s"cast(na as $dec) * (cast(n as $dec) - cast(na as $dec))")
          .as("oden"))
    val exceed = withObs
      .agg(coalesce(sum(when(col("pden") === 0 ||
          expr("pnum * oden >= onum * pden"), 1L).otherwise(0L)), lit(0L))
        .as("n_exceed"))
    broadcast(obs).crossJoin(broadcast(exceed))
      .select(col("n"), col("na").as("n_in"), col("s").as("sum_total"),
        col("sa").as("sum_in"),
        expr(s"abs(cast(sa as $dec) * cast(n as $dec) - " +
          s"cast(s as $dec) * cast(na as $dec))").as("stat_num"),
        expr(s"cast(na as $dec) * (cast(n as $dec) - cast(na as $dec))")
          .as("stat_den"),
        lit(perms.toLong).as("n_perms"), col("n_exceed"),
        (col("n_exceed") + 1L).as("p_num"),
        lit(perms.toLong + 1L).as("p_den"))
  }

  /**
   * Multiple-testing-controlled drift sweep: for EVERY group g, a
   * randomization test of "does g's mean value differ from the rest of
   * the corpus?", then Benjamini–Hochberg step-up over the exact
   * p-values at FDR level fdrNum/fdrDen — the "which sources actually
   * moved?" audit run after a crawl refresh, with the false-discovery
   * rate controlled instead of m uncorrected tests silently inflating
   * hits.
   *
   * Per group the null must respect the group's SIZE (a 1% source's
   * mean wanders more than a 50% one), so replicate b's pseudo-members
   * of g are rows with md5_hash64(seed:g:b:key) >>> 1 below
   * floor(n_g·2⁶³/n) — the [[Sampling]] threshold rule with the
   * OBSERVED group share as the rate, computed in-plan from the
   * counting pass (no driver round-trip). Pseudo-group sizes are then
   * binomial around n_g, the standard binomial randomization null.
   *
   * Statistic and exceedance comparisons are the exact cross-multiplied
   * rationals of [[randomizationTest]]. BH runs over |groups| rows:
   * rank p-values ascending (n_exceed, then group key — same add-one
   * p denominator everywhere, so n_exceed IS the p-order), find the
   * largest rank r with p_(r)·m ≤ r·q as the integer comparison
   * (n_exceed+1)·m·fdrDen ≤ r·(perms+1)·fdrNum, and reject ranks ≤ r.
   *
   * Scale contract: one counting pass (row volume dies per group), one
   * corpus pass with the |groups|·B expansion under the partial
   * aggregate (the exchange carries |groups|·B summary rows per task),
   * and a |groups|-row BH window. |groups|·B is the audit-window knob:
   * sources × 64 replicates, not users × anything.
   *
   * @return one row per group, ordered by group: (g, n_g, sum_g,
   *         stat_num, stat_den, n_exceed, p_num, p_den, bh_rank,
   *         rejected)
   */
  def fdrDriftSweep(df: DataFrame, key: Column, value: Column,
      group: Column, perms: Int, seed: String,
      fdrNum: Long, fdrDen: Long): DataFrame = {
    require(perms > 0, s"perms must be positive, got $perms")
    require(fdrNum > 0 && fdrDen > 0 && fdrNum <= fdrDen,
      s"bad FDR level $fdrNum/$fdrDen")
    val base = df.select(key.cast("string").as("k"),
        value.cast("long").as("v"), group.cast("string").as("g"))
      .filter(col("k").isNotNull && col("v").isNotNull && col("g").isNotNull)
    val tot = base.agg(count(lit(1)).as("n"),
      coalesce(sum(col("v")), lit(0L)).as("s"))
    val perGroup = base.groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(col("v")).as("sg"))
    // 2^63 as a 38-digit decimal literal: the Sampling threshold rule
    // floor(ng * 2^63 / n), computed in-plan (ng * 2^63 ~ 10^28 << 10^38).
    val twoPow63 = "9223372036854775808"
    val groupsWithThreshold = perGroup.crossJoin(broadcast(tot))
      .select(col("g"), col("ng"), col("sg"), col("n"), col("s"),
        expr(s"cast(ng as $dec) * cast($twoPow63 as $dec) div cast(n as $dec)")
          .as("thr"))
    val swept = base
      .crossJoin(broadcast(groupsWithThreshold.select(col("g").as("tg"),
        col("thr"))))
      .select(col("k"), col("v"), col("tg"), col("thr"),
        explode(sequence(lit(1), lit(perms))).as("b"))
      .select(col("v"), col("tg"), col("b"),
        (shiftrightunsigned(md5Hash64(concat(lit(seed), lit(":"), col("tg"),
          lit(":"), col("b").cast("string"), lit(":"), col("k"))), 1)
          .cast(dec) < col("thr")).as("inp"))
    swept.groupBy(col("tg"), col("b"))
      .agg(coalesce(sum(when(col("inp"), 1L).otherwise(0L)), lit(0L)).as("pa"),
        coalesce(sum(when(col("inp"), col("v")).otherwise(0L)), lit(0L))
          .as("psa"))
      .join(groupsWithThreshold.withColumnRenamed("g", "tg"), Seq("tg"))
      .select(col("tg"), col("ng"), col("sg"), col("n"), col("s"),
        expr(s"abs(cast(psa as $dec) * cast(n as $dec) - " +
          s"cast(s as $dec) * cast(pa as $dec))").as("pnum"),
        expr(s"cast(pa as $dec) * (cast(n as $dec) - cast(pa as $dec))")
          .as("pden"),
        expr(s"abs(cast(sg as $dec) * cast(n as $dec) - " +
          s"cast(s as $dec) * cast(ng as $dec))").as("onum"),
        expr(s"cast(ng as $dec) * (cast(n as $dec) - cast(ng as $dec))")
          .as("oden"))
      .groupBy(col("tg"))
      .agg(max(col("ng")).as("n_g"), max(col("sg")).as("sum_g"),
        max(col("onum")).as("stat_num"), max(col("oden")).as("stat_den"),
        coalesce(sum(when(col("pden") === 0 ||
          expr("pnum * oden >= onum * pden"), 1L).otherwise(0L)), lit(0L))
          .as("n_exceed"))
      .transform(bhStepUp(perms, fdrNum, fdrDen))
  }

  /** BH step-up over the per-group exceedance counts (|groups| rows). */
  private def bhStepUp(perms: Int, fdrNum: Long, fdrDen: Long)
      (perG: DataFrame): DataFrame = {
    val m = Window.orderBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = perG
      .withColumn("bh_rank", row_number().over(
        Window.orderBy(col("n_exceed").asc, col("tg").asc)).cast("long"))
      .withColumn("m_tests", count(lit(1)).over(m))
    ranked
      .withColumn("ok",
        (col("n_exceed") + 1L) * col("m_tests") * lit(fdrDen) <=
          col("bh_rank") * lit(perms.toLong + 1L) * lit(fdrNum))
      .withColumn("cutoff", max(when(col("ok"), col("bh_rank"))).over(m))
      .select(col("tg").as("g"), col("n_g"), col("sum_g"),
        col("stat_num"), col("stat_den"), col("n_exceed"),
        (col("n_exceed") + 1L).as("p_num"),
        lit(perms.toLong + 1L).as("p_den"),
        col("bh_rank"),
        (col("bh_rank") <= coalesce(col("cutoff"), lit(0L))).as("rejected"))
      .orderBy(col("g"))
  }
}
