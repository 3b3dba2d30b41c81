package graft.operators

import graft.dedup.SimHash64
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[Resample]] family — randomization test, FDR sweep, and
 * the bootstrap CIs (row / cluster / grouped / paired-diff) — against
 * plain-Scala BigInt references that replay the identical md5 coins and
 * Poisson thresholds (the thresholds RE-DERIVED from the CDF, not
 * copied) — the family's whole value is that pseudo-splits, weights,
 * and order statistics are engine-exact, so the references must agree
 * to the last replicate, not statistically. */
class ResampleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-resample-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def md5Low(s: String): Long =
    SimHash64.md5Hash64(UTF8String.fromString(s))

  /** The operator's fair-coin rule, replayed in plain Scala. */
  private def coin(seed: String, b: Int, key: String): Boolean =
    (md5Low(s"$seed:$b:$key") & 1L) == 1L

  /** Plain-Scala reference for the two-sample randomization test. */
  private def referenceTest(rows: Seq[(String, Long, Boolean)], perms: Int,
      seed: String): (Long, Long, BigInt, BigInt, Long) = {
    val n = rows.size.toLong
    val s = rows.map(_._2).sum
    val na = rows.count(_._3).toLong
    val sa = rows.filter(_._3).map(_._2).sum
    val onum = (BigInt(sa) * n - BigInt(s) * na).abs
    val oden = BigInt(na) * (n - na)
    val exceed = (1 to perms).count { b =>
      val in = rows.filter(r => coin(seed, b, r._1))
      val pa = in.size.toLong
      val psa = in.map(_._2).sum
      val pnum = (BigInt(psa) * n - BigInt(s) * pa).abs
      val pden = BigInt(pa) * (n - pa)
      pden == 0 || pnum * oden >= onum * pden
    }.toLong
    (na, sa, onum, oden, exceed)
  }

  private val docs: Seq[(String, Long, Boolean)] =
    (0 until 120).map { i =>
      // Group A runs visibly longer so the observed stat is extreme.
      val a = i % 3 == 0
      (s"d$i", (if (a) 40 else 20) + (i % 7).toLong, a)
    }

  test("randomizationTest matches the BigInt reference replicate-for-replicate") {
    import spark.implicits._
    val df = docs.toDF("k", "v", "a").repartition(4)
    val r = Resample.randomizationTest(df, col("k"), col("v"), col("a"),
      perms = 50, seed = "spec").collect().head
    val (na, sa, onum, oden, exceed) = referenceTest(docs, 50, "spec")
    assert(r.getAs[Long]("n") === 120L)
    assert(r.getAs[Long]("n_in") === na)
    assert(r.getAs[Long]("sum_in") === sa)
    // Wide rationals ship as strings (the FIXTURES.md output contract).
    assert(BigInt(r.getAs[String]("stat_num")) === onum)
    assert(BigInt(r.getAs[String]("stat_den")) === oden)
    assert(r.getAs[Long]("n_exceed") === exceed)
    assert(r.getAs[Long]("p_num") === exceed + 1)
    assert(r.getAs[Long]("p_den") === 51L)
    // A 2:1 mean separation on 120 rows should beat nearly every fair
    // re-split — the test must actually detect it.
    assert(exceed < 5, s"planted shift not detected (exceed=$exceed)")
  }

  test("randomizationTest on an exchangeable labeling is insignificant") {
    import spark.implicits._
    // Labels carry no signal: value depends only on i, label on a hash.
    val noise = (0 until 150).map(i => (s"n$i", (i % 11).toLong,
      (md5Low(s"label:$i") & 1L) == 1L))
    val df = noise.toDF("k", "v", "a").repartition(4)
    val r = Resample.randomizationTest(df, col("k"), col("v"), col("a"),
      perms = 60, seed = "noise").collect().head
    val (_, _, _, _, exceed) = referenceTest(noise, 60, "noise")
    assert(r.getAs[Long]("n_exceed") === exceed)
    // Under the null, exceedance should be commonplace (p well above any
    // rejection bar). Guard loosely — this is a seeded fixture, so the
    // value is fixed; the assertion documents the regime.
    assert(exceed > 5, s"null fixture looks significant (exceed=$exceed)")
  }

  test("null keys, values, and labels are excluded before counting") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), Some(10L), Some(true)),
      (None: Option[String], Some(10L), Some(true)),
      (Some("b"), None: Option[Long], Some(false)),
      (Some("c"), Some(20L), None: Option[Boolean]),
      (Some("d"), Some(30L), Some(false))
    ).toDF("k", "v", "a")
    val r = Resample.randomizationTest(df, col("k"), col("v"), col("a"),
      perms = 8, seed = "s").collect().head
    assert(r.getAs[Long]("n") === 2L)
    assert(r.getAs[Long]("sum_total") === 40L)
  }

  /** Plain-Scala reference for the KS randomization test: sup-deviation
   * over the pooled histogram, coin re-splits, exceedance. */
  private def ksRef(rows: Seq[(String, Long, Boolean)], perms: Int,
      seed: String): (BigInt, BigInt, Long) = {
    val n = rows.size
    def supDev(inA: ((String, Long, Boolean)) => Boolean): (BigInt, Int) = {
      val aCount = rows.count(inA)
      val best = rows.map(_._2).distinct.sorted.map { v =>
        val cuma = rows.count(r => r._2 <= v && inA(r))
        val cum = rows.count(_._2 <= v)
        (BigInt(cuma) * (n - aCount) - BigInt(cum - cuma) * aCount).abs
      }.foldLeft(BigInt(0))(_ max _)
      (best, aCount)
    }
    val (onum, na) = supDev(_._3)
    val oden = BigInt(na) * (n - na)
    val exceed = (1 to perms).count { b =>
      val (pnum, pa) = supDev(r => coin(seed, b, r._1))
      val pden = BigInt(pa) * (n - pa)
      pden == 0 || pnum * oden >= onum * pden
    }.toLong
    (onum, oden, exceed)
  }

  test("ksRandomizationTest: shape shift with EQUAL means — KS detects what the mean test cannot") {
    import spark.implicits._
    // Group A is bimodal {0, 40}, group B constant {20}: identical means
    // (exactly 20 both sides), maximally different distributions.
    val rows = (0 until 120).map { i =>
      val a = i % 2 == 0
      val v = if (a) { if (i % 4 == 0) 0L else 40L } else 20L
      (s"d$i", v, a)
    }
    val df = rows.toDF("k", "v", "a").repartition(4)
    val r = Resample.ksRandomizationTest(df, col("k"), col("v"), col("a"),
      perms = 50, seed = "ks").collect().head
    val (onum, oden, exceed) = ksRef(rows, 50, "ks")
    assert(BigInt(r.getAs[String]("stat_num")) === onum)
    assert(BigInt(r.getAs[String]("stat_den")) === oden)
    assert(r.getAs[Long]("n_exceed") === exceed)
    assert(r.getAs[Long]("p_num") === exceed + 1)
    assert(r.getAs[Long]("p_den") === 51L)
    assert(exceed < 3, s"planted shape shift not detected (exceed=$exceed)")
    // The MOTIVATING contrast: the mean randomization test on the SAME
    // fixture must see nothing (both means are exactly 20).
    val m = Resample.randomizationTest(df, col("k"), col("v"), col("a"),
      perms = 50, seed = "ks").collect().head
    assert(BigInt(m.getAs[String]("stat_num")) === BigInt(0),
      "fixture means must be exactly equal")
  }

  test("ksRandomizationTest scans the corpus exactly once (plan pin)") {
    import spark.implicits._
    val df = (0 until 20).map(i => (s"p$i", i.toLong, i % 2 == 0))
      .toDF("k", "v", "a")
    // The one-scan contract (observed labeling = replicate 0) is a plan
    // SHAPE: the whole test is a single pipeline over one leaf — no
    // self-join, no second pass re-evaluating the value kernel.
    val plan = Resample.ksRandomizationTest(df, col("k"), col("v"),
      col("a"), perms = 8, seed = "x").queryExecution.optimizedPlan
    assert(plan.collectLeaves().size === 1,
      s"expected ONE corpus scan, got:\n$plan")
  }

  test("ksRandomizationTest: exchangeable labels are insignificant; nulls excluded") {
    import spark.implicits._
    val noise = (0 until 150).map(i => (s"n$i", (i % 11).toLong,
      (md5Low(s"kl:$i") & 1L) == 1L))
    val df = noise.toDF("k", "v", "a").repartition(4)
    val r = Resample.ksRandomizationTest(df, col("k"), col("v"), col("a"),
      perms = 40, seed = "kn").collect().head
    val (_, _, exceed) = ksRef(noise, 40, "kn")
    assert(r.getAs[Long]("n_exceed") === exceed)
    assert(exceed > 5, s"null fixture looks significant (exceed=$exceed)")
    val withNulls = Seq(
      (Some("a"), Some(10L), Some(true)),
      (None: Option[String], Some(10L), Some(true)),
      (Some("b"), Some(20L), None: Option[Boolean]),
      (Some("c"), Some(30L), Some(false))
    ).toDF("k", "v", "a")
    val x = Resample.ksRandomizationTest(withNulls, col("k"), col("v"),
      col("a"), perms = 8, seed = "s").collect().head
    assert(x.getAs[Long]("n") === 2L && x.getAs[Long]("n_in") === 1L)
  }

  /** Plain-Scala reference for the paired sign test's exceedance count:
   * coin-flip each non-tie unit, compare |2·heads − n| to the observed
   * |n_pos − n_neg|. */
  private def signRef(units: Seq[(String, Long)], perms: Int,
      seed: String): (Long, Long, Long) = {
    val nonTies = units.filter(_._2 != 0L)
    val npos = nonTies.count(_._2 == 1L).toLong
    val nneg = nonTies.count(_._2 == -1L).toLong
    val exceed = (1 to perms).count { b =>
      val heads = nonTies.count(u => coin(seed, b, u._1)).toLong
      math.abs(2 * heads - nonTies.size) >= math.abs(npos - nneg)
    }.toLong
    (npos, nneg, exceed)
  }

  test("pairedSignTest matches the coin reference; planted dominance detected") {
    import spark.implicits._
    // 50 units: A wins 40, B wins 6, 4 ties — decisively one-sided.
    val units = (0 until 50).map { i =>
      val s = if (i % 25 == 24) 0L else if (i % 8 == 3) -1L else 1L
      (s"q$i", s)
    }
    val df = units.toDF("k", "sgn").repartition(4)
    val r = Resample.pairedSignTest(df, col("k"), col("sgn"),
      perms = 60, seed = "sg").collect().head
    val (npos, nneg, exceed) = signRef(units, 60, "sg")
    assert(r.getAs[Long]("n") === npos + nneg)
    assert(r.getAs[Long]("n_pos") === npos)
    assert(r.getAs[Long]("n_neg") === nneg)
    assert(r.getAs[Long]("n_tie") === units.count(_._2 == 0L).toLong)
    assert(r.getAs[Long]("stat") === math.abs(npos - nneg))
    assert(r.getAs[Long]("n_exceed") === exceed)
    assert(r.getAs[Long]("p_num") === exceed + 1)
    assert(r.getAs[Long]("p_den") === 61L)
    assert(exceed < 3, s"planted dominance not detected (exceed=$exceed)")
  }

  test("pairedSignTest: exchangeable signs are insignificant; all-ties ships p = 1") {
    import spark.implicits._
    // Signs off an independent hash — no real direction.
    val noise = (0 until 80).map(i =>
      (s"n$i", if ((md5Low(s"sn:$i") & 1L) == 1L) 1L else -1L))
    val df = noise.toDF("k", "sgn").repartition(4)
    val r = Resample.pairedSignTest(df, col("k"), col("sgn"),
      perms = 40, seed = "nz").collect().head
    val (_, _, exceed) = signRef(noise, 40, "nz")
    assert(r.getAs[Long]("n_exceed") === exceed)
    assert(exceed > 5, s"null fixture looks significant (exceed=$exceed)")
    // Degenerate all-ties input: every replicate trivially reaches the
    // observed 0, so p = 1 exactly — not the empty-count 1/(B+1).
    val ties = Seq(("a", 0L), ("b", 0L)).toDF("k", "sgn")
    val t = Resample.pairedSignTest(ties, col("k"), col("sgn"),
      perms = 40, seed = "t").collect().head
    assert(t.getAs[Long]("n") === 0L && t.getAs[Long]("n_tie") === 2L)
    assert(t.getAs[Long]("p_num") === 41L && t.getAs[Long]("p_den") === 41L)
  }

  test("pairedSignTest rejects signs outside {-1, 0, 1}; NULL signs are excluded, not fatal") {
    import spark.implicits._
    val df = Seq(("a", 2L)).toDF("k", "sgn")
    val e = intercept[Exception] {
      Resample.pairedSignTest(df, col("k"), col("sgn"),
        perms = 8, seed = "x").collect()
    }
    assert(e.getMessage != null)
    // A NULL sign (e.g. a metric join with a missing side) follows the
    // family's null convention — dropped before counting, no error.
    val withNull = Seq(("a", Some(1L)), ("b", None: Option[Long]),
      ("c", Some(-1L))).toDF("k", "sgn")
    val r = Resample.pairedSignTest(withNull, col("k"), col("sgn"),
      perms = 8, seed = "x").collect().head
    assert(r.getAs[Long]("n") === 2L && r.getAs[Long]("n_tie") === 0L)
  }

  test("pairedSignTest evaluates its input exactly once (plan pin)") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("b", -1L), ("c", 0L)).toDF("k", "sgn")
    // The one-pass contract (observed counts = replicate 0) is a plan
    // SHAPE: a single pipeline over one leaf — no self-join re-running
    // the (potentially expensive) upstream comparison DAG.
    val plan = Resample.pairedSignTest(df, col("k"), col("sgn"),
      perms = 8, seed = "x").queryExecution.optimizedPlan
    assert(plan.collectLeaves().size === 1,
      s"expected ONE scan of the comparison rows, got:\n$plan")
  }

  /** Plain-Scala reference for the paired delta test: quantize each
   * rational to ⌊|num|·10⁶/den⌋ with the sign re-applied, flip signs
   * with the replayed md5 coin, count replicates reaching |Σ d̃|. */
  private def referenceDelta(rows: Seq[(String, Long, Long)], perms: Int,
      seed: String): (Long, Long, BigInt, Long) = {
    def quant(dn: Long, dd: Long): Long = {
      val q = (BigInt(dn).abs * 1000000) / BigInt(dd)
      (if (dn < 0) -q else q).toLong
    }
    val ds = rows.map { case (k, dn, dd) => (k, quant(dn, dd)) }
    val n = ds.size.toLong
    val nZero = ds.count(_._2 == 0L).toLong
    val ot = ds.map(d => BigInt(d._2)).sum.abs
    val nonzero = ds.filter(_._2 != 0L)
    val exceed =
      if (n - nZero == 0) perms.toLong
      else (1 to perms).count { b =>
        val t = nonzero.map { case (k, d) =>
          if (coin(seed, b, k)) -BigInt(d) else BigInt(d)
        }.sum
        t.abs >= ot
      }.toLong
    (n, nZero, ot, exceed)
  }

  test("pairedDeltaTest matches the BigInt reference replicate-for-replicate") {
    import spark.implicits._
    // Mixed denominators (the apAtK/ndcgAtK shape), planted positive
    // shift with a few reversals and exact zeros.
    val rows: Seq[(String, Long, Long)] = (0 until 60).map { i =>
      val den = Seq(2520L, 25200L, 7560L)(i % 3)
      val num = if (i % 11 == 0) -den / 4
        else if (i % 7 == 0) 0L
        else den / 3 + i
      (s"q$i", num, den)
    }
    val df = rows.toDF("k", "dn", "dd").repartition(4)
    val r = Resample.pairedDeltaTest(df, col("k"), col("dn"), col("dd"),
      perms = 64, seed = "dt").collect().head
    val (n, nZero, ot, exceed) = referenceDelta(rows, 64, "dt")
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("n_zero") === nZero)
    assert(BigInt(r.getAs[String]("stat")) === ot)
    assert(r.getAs[Long]("n_exceed") === exceed)
    assert(r.getAs[Long]("p_num") === exceed + 1)
    assert(r.getAs[Long]("p_den") === 65L)
    // The planted majority-positive shift must actually be detected.
    assert(exceed < 5, s"planted delta shift not detected (exceed=$exceed)")
  }

  test("pairedDeltaTest prices magnitude where the sign test cannot") {
    import spark.implicits._
    // Nine +1/9 wins and one -1/1 loss: directionally lopsided (the
    // sign test calls it significant) but the magnitudes cancel to
    // ~zero — the delta test must call it noise. This asymmetry is the
    // operator's reason to exist.
    val rows = (0 until 9).map(i => (s"w$i", 1L, 9L)) :+ (("loss", -1L, 1L))
    val df = rows.toDF("k", "dn", "dd")
    val delta = Resample.pairedDeltaTest(df, col("k"), col("dn"),
      col("dd"), perms = 200, seed = "mg").collect().head
    val sign = Resample.pairedSignTest(df,
      col("k"), when(col("dn") > 0, 1L).when(col("dn") < 0, -1L)
        .otherwise(0L), perms = 200, seed = "mg").collect().head
    val pDelta = delta.getAs[Long]("p_num").toDouble / delta.getAs[Long]("p_den")
    val pSign = sign.getAs[Long]("p_num").toDouble / sign.getAs[Long]("p_den")
    assert(pSign < 0.1, s"sign test should fire on 9-vs-1 (p=$pSign)")
    assert(pDelta > 0.5, s"delta test must see cancelled magnitudes (p=$pDelta)")
    // |Σ d̃| = |9·111111 - 1000000| = 1.
    assert(BigInt(delta.getAs[String]("stat")) === BigInt(1))
  }

  test("pairedDeltaTest degenerate and null edges") {
    import spark.implicits._
    // All-zero deltas: p = 1, never 1/(B+1).
    val zeros = Seq(("a", 0L, 5L), ("b", 0L, 7L)).toDF("k", "dn", "dd")
    val z = Resample.pairedDeltaTest(zeros, col("k"), col("dn"), col("dd"),
      perms = 16, seed = "z").collect().head
    assert(z.getAs[Long]("n") === 2L && z.getAs[Long]("n_zero") === 2L)
    assert(z.getAs[Long]("n_exceed") === 16L)
    assert(z.getAs[String]("stat") === "0")
    // Sub-resolution deltas quantize to zero (part of the definition).
    val tiny = Seq(("a", 1L, 10000000L)).toDF("k", "dn", "dd")
    val t = Resample.pairedDeltaTest(tiny, col("k"), col("dn"), col("dd"),
      perms = 16, seed = "z").collect().head
    assert(t.getAs[Long]("n_zero") === 1L && t.getAs[Long]("n_exceed") === 16L)
    // NULL rows drop (family convention); non-positive den raises.
    val withNull = Seq(("a", Some(1L), Some(2L)), ("b", None, Some(3L)),
      ("c", Some(1L), None)).toDF("k", "dn", "dd")
    val nn = Resample.pairedDeltaTest(withNull, col("k"), col("dn"),
      col("dd"), perms = 8, seed = "z").collect().head
    assert(nn.getAs[Long]("n") === 1L)
    val badDen = Seq(("a", 1L, 0L)).toDF("k", "dn", "dd")
    intercept[Exception] {
      Resample.pairedDeltaTest(badDen, col("k"), col("dn"), col("dd"),
        perms = 8, seed = "z").collect()
    }
    // Quantized |delta| past int64 raises loudly, never nulls.
    val huge = Seq(("a", Long.MaxValue / 2, 1L)).toDF("k", "dn", "dd")
    val e = intercept[Exception] {
      Resample.pairedDeltaTest(huge, col("k"), col("dn"), col("dd"),
        perms = 8, seed = "z").collect()
    }
    def messages(t2: Throwable): Seq[String] =
      Option(t2).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("quantized |delta| exceeds")),
      s"expected the quantization guard, got: ${messages(e).mkString(" | ")}")
  }

  /** Plain-Scala Wilcoxon reference: quantize, discard zeros, doubled
   * average ranks of |d̃| (2·lower + cnt + 1 — an independent
   * derivation of the engine's windowed 2·rank + cnt − 1 − 2z), coin
   * flips replayed. */
  private def referenceWilcoxon(rows: Seq[(String, Long, Long)], perms: Int,
      seed: String): (Long, Long, BigInt, Long) = {
    def quant(dn: Long, dd: Long): Long = {
      val q = (BigInt(dn).abs * 1000000) / BigInt(dd)
      (if (dn < 0) -q else q).toLong
    }
    val ds = rows.map { case (k, dn, dd) => (k, quant(dn, dd)) }
    val nonzero = ds.filter(_._2 != 0L)
    val absVals = nonzero.map(_._2.abs)
    def r2(a: Long): Long =
      2L * absVals.count(_ < a) + absVals.count(_ == a) + 1L
    val srs = nonzero.map { case (k, d) =>
      (k, (if (d < 0) -1L else 1L) * r2(d.abs))
    }
    val ow = srs.map(s => BigInt(s._2)).sum.abs
    val nZero = ds.count(_._2 == 0L).toLong
    val exceed =
      if (nonzero.isEmpty) perms.toLong
      else (1 to perms).count { b =>
        srs.map { case (k, sr) =>
          if (coin(seed, b, k)) -BigInt(sr) else BigInt(sr)
        }.sum.abs >= ow
      }.toLong
    (ds.size.toLong, nZero, ow, exceed)
  }

  test("wilcoxonSignedRank matches the BigInt reference, ties averaged exactly") {
    import spark.implicits._
    // Duplicate |d̃| values force the average-rank path; zeros and
    // reversals mixed in; majority-positive shift must be detected.
    val rows: Seq[(String, Long, Long)] = (0 until 40).map { i =>
      val den = 1000L
      val num = if (i % 13 == 0) 0L
        else if (i % 5 == 0) -200L          // tied negative group
        else if (i % 2 == 0) 300L           // tied positive group
        else 100L + (i % 3) * 100L          // more ties across signs
      (s"u$i", num, den)
    }
    val df = rows.toDF("k", "dn", "dd").repartition(4)
    val r = Resample.wilcoxonSignedRank(df, col("k"), col("dn"), col("dd"),
      perms = 64, seed = "wx").collect().head
    val (n, nZero, ow, exceed) = referenceWilcoxon(rows, 64, "wx")
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("n_zero") === nZero)
    assert(BigInt(r.getAs[String]("stat")) === ow)
    assert(r.getAs[Long]("n_exceed") === exceed)
    assert(r.getAs[Long]("p_den") === 65L)
    assert(exceed < 5, s"planted rank shift not detected (exceed=$exceed)")
  }

  test("the paired triple orders as sign < signed-rank < delta on an outlier") {
    import spark.implicits._
    // Nine +1/9 wins, one -1/1 loss: direction says significant, raw
    // magnitude says perfectly cancelled, ranks sit between — the
    // textbook reason all three tests exist.
    val rows = (0 until 9).map(i => (s"w$i", 1L, 9L)) :+ (("loss", -1L, 1L))
    val df = rows.toDF("k", "dn", "dd")
    val pOf = (r: org.apache.spark.sql.Row) =>
      r.getAs[Long]("p_num").toDouble / r.getAs[Long]("p_den")
    val sign = pOf(Resample.pairedSignTest(df, col("k"),
      when(col("dn") > 0, 1L).when(col("dn") < 0, -1L).otherwise(0L),
      perms = 200, seed = "tri").collect().head)
    val wx = Resample.wilcoxonSignedRank(df, col("k"), col("dn"),
      col("dd"), perms = 200, seed = "tri").collect().head
    val delta = pOf(Resample.pairedDeltaTest(df, col("k"), col("dn"),
      col("dd"), perms = 200, seed = "tri").collect().head)
    // W2: nine tied wins at doubled rank 10, the loss at 20 → |90−20|.
    assert(BigInt(wx.getAs[String]("stat")) === BigInt(70))
    assert(sign < pOf(wx), s"sign=$sign wilcoxon=${pOf(wx)}")
    assert(pOf(wx) < delta, s"wilcoxon=${pOf(wx)} delta=$delta")
  }

  test("wilcoxonSignedRank degenerate edges and guards") {
    import spark.implicits._
    val zeros = Seq(("a", 0L, 5L), ("b", 0L, 7L)).toDF("k", "dn", "dd")
    val z = Resample.wilcoxonSignedRank(zeros, col("k"), col("dn"),
      col("dd"), perms = 16, seed = "z").collect().head
    assert(z.getAs[Long]("n") === 2L && z.getAs[Long]("n_zero") === 2L)
    assert(z.getAs[Long]("n_exceed") === 16L && z.getAs[String]("stat") === "0")
    val empty = Seq.empty[(String, Long, Long)].toDF("k", "dn", "dd")
    val e = Resample.wilcoxonSignedRank(empty, col("k"), col("dn"),
      col("dd"), perms = 16, seed = "z").collect().head
    assert(e.getAs[Long]("n") === 0L && e.getAs[Long]("n_exceed") === 16L)
    intercept[Exception] {
      Resample.wilcoxonSignedRank(Seq(("a", 1L, -3L)).toDF("k", "dn", "dd"),
        col("k"), col("dn"), col("dd"), perms = 8, seed = "z").collect()
    }
  }

  test("delta-family fuzz: engine ≡ BigInt references on generated corpora") {
    import spark.implicits._
    import org.scalacheck.Gen
    // Random signed rationals with clustered magnitudes (forces rank
    // ties), exact zeros, and mixed denominators — both tests must
    // match their references replicate-for-replicate on every draw.
    val unit = for {
      num <- Gen.oneOf(Gen.chooseNum(-5L, 5L),
        Gen.oneOf(-2520L, -100L, 0L, 0L, 100L, 2520L))
      den <- Gen.oneOf(1L, 9L, 100L, 2520L, 1000000L)
    } yield (num, den)
    val corpus = Gen.chooseNum(0, 25).flatMap(n => Gen.listOfN(n, unit))
    val seeds = Iterator.iterate(org.scalacheck.rng.Seed(57L))(_.next)
    for ((gseed, i) <- seeds.take(12).zipWithIndex) {
      val rows = corpus.apply(Gen.Parameters.default, gseed).get
        .zipWithIndex.map { case ((n2, d2), j) => (s"f$i-$j", n2, d2) }
      val df = rows.toDF("k", "dn", "dd").repartition(3)
      val coinSeed = s"fz$i"
      val dRow = Resample.pairedDeltaTest(df, col("k"), col("dn"),
        col("dd"), perms = 24, seed = coinSeed).collect().head
      val (n, nZero, ot, exD) = referenceDelta(rows, 24, coinSeed)
      assert(dRow.getAs[Long]("n") === n, s"draw $i n")
      assert(dRow.getAs[Long]("n_zero") === nZero, s"draw $i n_zero")
      assert(BigInt(dRow.getAs[String]("stat")) === ot, s"draw $i stat")
      assert(dRow.getAs[Long]("n_exceed") ===
        (if (n - nZero == 0) 24L else exD), s"draw $i exceed")
      val wRow = Resample.wilcoxonSignedRank(df, col("k"), col("dn"),
        col("dd"), perms = 24, seed = coinSeed).collect().head
      val (wn, wZero, ww, exW) = referenceWilcoxon(rows, 24, coinSeed)
      assert(wRow.getAs[Long]("n") === wn, s"draw $i w n")
      assert(wRow.getAs[Long]("n_zero") === wZero, s"draw $i w n_zero")
      assert(BigInt(wRow.getAs[String]("stat")) === ww, s"draw $i w stat")
      assert(wRow.getAs[Long]("n_exceed") ===
        (if (wn - wZero == 0) 24L else exW), s"draw $i w exceed")
    }
  }

  test("wilcoxonSignedRank evaluates its input exactly once (plan pin)") {
    import spark.implicits._
    val df = Seq(("a", 1L, 4L), ("b", -1L, 2L), ("c", 0L, 3L))
      .toDF("k", "dn", "dd")
    val plan = Resample.wilcoxonSignedRank(df, col("k"), col("dn"),
      col("dd"), perms = 8, seed = "x").queryExecution.optimizedPlan
    assert(plan.collectLeaves().size === 1,
      s"expected ONE scan of the comparison rows, got:\n$plan")
  }

  test("pairedDeltaTest evaluates its input exactly once (plan pin)") {
    import spark.implicits._
    val df = Seq(("a", 1L, 4L), ("b", -1L, 2L), ("c", 0L, 3L))
      .toDF("k", "dn", "dd")
    val plan = Resample.pairedDeltaTest(df, col("k"), col("dn"), col("dd"),
      perms = 8, seed = "x").queryExecution.optimizedPlan
    assert(plan.collectLeaves().size === 1,
      s"expected ONE scan of the comparison rows, got:\n$plan")
  }

  /** Plain-Scala reference for one group's sweep pieces: threshold rule,
   * per-replicate membership, exceedance. */
  private def referenceSweep(rows: Seq[(String, Long, String)], perms: Int,
      seed: String): Map[String, (Long, Long, Long)] = {
    val n = rows.size.toLong
    val s = rows.map(_._2).sum
    val groups = rows.map(_._3).distinct
    groups.map { g =>
      val ng = rows.count(_._3 == g).toLong
      val sg = rows.filter(_._3 == g).map(_._2).sum
      val thr = (BigInt(ng) << 63) / BigInt(n)
      val onum = (BigInt(sg) * n - BigInt(s) * ng).abs
      val oden = BigInt(ng) * (n - ng)
      val exceed = (1 to perms).count { b =>
        // Shared coin: one hash per (row, b), reused by every group's
        // threshold test (the operator's PRDS-noted scheme).
        val in = rows.filter { r =>
          val h = md5Low(s"$seed:$b:${r._1}")
          BigInt(h >>> 1) < thr
        }
        val pa = in.size.toLong
        val psa = in.map(_._2).sum
        val pnum = (BigInt(psa) * n - BigInt(s) * pa).abs
        val pden = BigInt(pa) * (n - pa)
        pden == 0 || pnum * oden >= onum * pden
      }.toLong
      g -> ((ng, sg, exceed))
    }.toMap
  }

  private val sweepDocs: Seq[(String, Long, String)] =
    (0 until 160).map { i =>
      // One planted outlier source ("hot"), three exchangeable ones.
      val g = if (i % 8 == 0) "hot" else s"src${i % 3}"
      val v = (if (g == "hot") 90 else 30) + (i % 5).toLong
      (s"w$i", v, g)
    }

  test("fdrDriftSweep matches the reference and BH rejects exactly the planted group") {
    import spark.implicits._
    val df = sweepDocs.toDF("k", "v", "g").repartition(4)
    val out = Resample.fdrDriftSweep(df, col("k"), col("v"), col("g"),
      perms = 40, seed = "sweep", fdrNum = 1, fdrDen = 20).collect()
    val ref = referenceSweep(sweepDocs, 40, "sweep")
    assert(out.length === ref.size)
    out.foreach { r =>
      val g = r.getAs[String]("g")
      val (ng, sg, exceed) = ref(g)
      assert(r.getAs[Long]("n_g") === ng, s"n_g for $g")
      assert(r.getAs[Long]("sum_g") === sg, s"sum_g for $g")
      assert(r.getAs[Long]("n_exceed") === exceed, s"n_exceed for $g")
      assert(r.getAs[Long]("p_num") === exceed + 1)
      assert(r.getAs[Long]("p_den") === 41L)
    }
    // BH step-up replayed in plain Scala over the reference exceedances.
    val m = ref.size.toLong
    val ranked = ref.toSeq.sortBy { case (g, (_, _, e)) => (e, g) }.zipWithIndex
    val cutoff = ranked.reverse.collectFirst {
      case ((_, (_, _, e)), i) if (e + 1) * m * 20 <= (i + 1) * 41 * 1 =>
        (i + 1).toLong
    }.getOrElse(0L)
    val expectedRejected =
      ranked.filter { case (_, i) => (i + 1).toLong <= cutoff }
        .map(_._1._1).toSet
    assert(out.filter(_.getAs[Boolean]("rejected"))
      .map(_.getAs[String]("g")).toSet === expectedRejected)
    assert(expectedRejected.contains("hot"),
      "the planted outlier source must be rejected")
    // NOTE: the non-hot sources may ALSO reject here, correctly — hot's
    // large values shift the global mean, so "srcN vs rest" is a real
    // difference too. The all-null regime is pinned in the next test.
    assert(out.filter(_.getAs[String]("g") === "hot").head
      .getAs[Long]("bh_rank") === 1L,
      "the planted source must carry the smallest p-value")
  }

  test("an exchangeable sweep rejects nothing") {
    import spark.implicits._
    // Group labels AND values both come off independent hashes — no
    // group has a real mean shift, so BH at q = 1/20 must stay silent.
    val nullDocs = (0 until 200).map { i =>
      val g = s"s${(md5Low(s"g:$i") & 3L)}"
      (s"z$i", (md5Low(s"v:$i") & 15L), g)
    }
    val df = nullDocs.toDF("k", "v", "g").repartition(4)
    val out = Resample.fdrDriftSweep(df, col("k"), col("v"), col("g"),
      perms = 40, seed = "null", fdrNum = 1, fdrDen = 20).collect()
    val ref = referenceSweep(nullDocs, 40, "null")
    out.foreach { r =>
      assert(r.getAs[Long]("n_exceed") === ref(r.getAs[String]("g"))._3)
    }
    assert(!out.exists(_.getAs[Boolean]("rejected")),
      "exchangeable groups must survive the FDR gate")
  }

  /** The operator's pinned Poisson(1) thresholds, replayed: w = #{k :
   * (md5_64(seed:b:key) >>> 1) ≥ T_k}. Thresholds re-derived here from
   * the CDF independently (BigDecimal at 60 digits) rather than copied,
   * so a constant typo in the operator cannot self-verify. */
  private val refThresholds: Seq[BigInt] = {
    val mc = new java.math.MathContext(60)
    val one = java.math.BigDecimal.ONE
    // e via its series — enough terms that the 60-digit context saturates.
    val e = (1 to 50).foldLeft((one, one)) { case ((sum, fact), k) =>
      val f = fact.divide(new java.math.BigDecimal(k), mc)
      (sum.add(f, mc), f)
    }._1
    val scale = new java.math.BigDecimal(BigInt(1L << 62).bigInteger)
      .multiply(new java.math.BigDecimal(2))
    (0 to 8).map { k =>
      val cum = (0 to k).foldLeft((java.math.BigDecimal.ZERO, one)) {
        case ((sum, fact), j) =>
          val f = if (j == 0) one
            else fact.divide(new java.math.BigDecimal(j), mc)
          (sum.add(f, mc), f)
      }._1
      BigInt(cum.divide(e, mc).multiply(scale, mc)
        .toBigInteger) // floor: positive value, toBigInteger truncates
    }
  }

  private def refWeight(seed: String, b: Int, key: String): Long = {
    val u = BigInt(md5Low(s"$seed:$b:$key") >>> 1)
    refThresholds.count(u >= _).toLong
  }

  /** Plain-Scala reference for the percentile-bootstrap CI: replicate
   * (num, den) pairs, exact scaled quotients, order statistics. */
  private def referenceCI(units: Seq[(String, Long, Long)], reps: Int,
      seed: String, tailDen: Int): (Long, Long, Seq[(Long, Long, BigInt)]) = {
    val n = units.map(_._2).sum
    val s = units.map(_._3).sum
    val perRep = (1 to reps).map { b =>
      val ws = units.map(u => (refWeight(seed, b, u._1), u))
      val nb = ws.map { case (w, u) => w * u._2 }.sum
      val sb = ws.map { case (w, u) => w * u._3 }.sum
      val q = if (nb == 0) BigInt(-1)
        else BigInt(sb) * BigInt("1000000000000000") / BigInt(nb)
      (nb, sb, q, b)
    }
    val ranked = perRep.sortBy(r => (r._3, r._4))
      .map(r => (r._2, r._1, r._3))
    (n, s, ranked)
  }

  private val ciDocs: Seq[(String, Long)] =
    (0 until 90).map(i => (s"c$i", 20L + (i % 13)))

  test("bootstrapMeanCI matches the BigInt reference at both order statistics") {
    import spark.implicits._
    val df = ciDocs.toDF("k", "v").repartition(4)
    val out = Resample.bootstrapMeanCI(df, col("k"), col("v"),
      reps = 80, seed = "ci", tailDen = 40).collect().head
    val (n, s, ranked) = referenceCI(
      ciDocs.map { case (k, v) => (k, 1L, v) }, 80, "ci", 40)
    val lo = ranked(1) // rank 2 of 80 (80/40 = 2), 0-indexed
    val hi = ranked(78) // rank 79 = 80 - 2 + 1
    assert(out.getAs[Long]("n") === n)
    assert(out.getAs[Long]("sum_total") === s)
    assert(out.getAs[Long]("n_reps") === 80L)
    assert(out.getAs[Long]("lo_rank") === 2L)
    assert(out.getAs[Long]("hi_rank") === 79L)
    assert(out.getAs[Long]("lo_num") === lo._1)
    assert(out.getAs[Long]("lo_den") === lo._2)
    // *_scaled ship as BIGINT (the FIXTURES.md output contract).
    assert(BigInt(out.getAs[Long]("lo_scaled")) === lo._3)
    assert(out.getAs[Long]("hi_num") === hi._1)
    assert(out.getAs[Long]("hi_den") === hi._2)
    assert(BigInt(out.getAs[Long]("hi_scaled")) === hi._3)
    // The CI must bracket the observed mean: lo ≤ mean ≤ hi as exact
    // cross-multiplied rationals.
    assert(BigInt(lo._1) * n <= BigInt(s) * lo._2)
    assert(BigInt(hi._1) * n >= BigInt(s) * hi._2)
  }

  test("clusterBootstrapMeanCI resamples clusters, not rows") {
    import spark.implicits._
    // Two 10-row clusters with extreme means + 20 singletons: the
    // cluster CI must match a reference whose units are the CLUSTERS.
    val rows = (0 until 10).map(i => (s"a$i", 100L, "A")) ++
      (0 until 10).map(i => (s"b$i", 10L, "B")) ++
      (0 until 20).map(i => (s"s$i", 50L + i, s"s$i"))
    val df = rows.map(r => (r._1, r._2)).toDF("k", "v").repartition(4)
    val comps = rows.filter(r => r._3 == "A" || r._3 == "B")
      .map(r => (r._1, if (r._3 == "A") "a0" else "b0"))
      .toDF("id", "component_id")
    val out = Resample.clusterBootstrapMeanCI(df, col("k"), col("v"),
      comps, reps = 80, seed = "cl", tailDen = 40).collect().head
    val units = Seq(("a0", 10L, 1000L), ("b0", 10L, 100L)) ++
      (0 until 20).map(i => (s"s$i", 1L, 50L + i))
    val (n, s, ranked) = referenceCI(units, 80, "cl", 40)
    assert(out.getAs[Long]("n") === n)
    assert(out.getAs[Long]("sum_total") === s)
    assert(out.getAs[Long]("n_units") === 22L)
    assert(out.getAs[Long]("lo_num") === ranked(1)._1)
    assert(out.getAs[Long]("lo_den") === ranked(1)._2)
    assert(out.getAs[Long]("hi_num") === ranked(78)._1)
    assert(out.getAs[Long]("hi_den") === ranked(78)._2)
  }

  test("cluster bootstrap CI is wider than the row bootstrap on a duplicated corpus") {
    import spark.implicits._
    // 4 template clusters of 25 identical extreme docs each + 100
    // moderate singletons: row resampling sees 200 "independent" rows,
    // cluster resampling sees 104 units with 4 huge ones — its CI width
    // (hi − lo, compared as exact cross-multiplied rationals) must be
    // strictly larger. This is the operator's whole reason to exist.
    val rows = (0 until 4).flatMap(c =>
      (0 until 25).map(i => (s"t${c}_$i", if (c % 2 == 0) 200L else 5L,
        Some(s"t${c}_0")))) ++
      (0 until 100).map(i => (s"m$i", 100L + (i % 7), None))
    val df = rows.map(r => (r._1, r._2)).toDF("k", "v").repartition(4)
    val comps = rows.collect { case (k, _, Some(c)) => (k, c) }
      .toDF("id", "component_id")
    val row = Resample.bootstrapMeanCI(df, col("k"), col("v"),
      reps = 80, seed = "w", tailDen = 40).collect().head
    val clu = Resample.clusterBootstrapMeanCI(df, col("k"), col("v"),
      comps, reps = 80, seed = "w", tailDen = 40).collect().head
    def width(r: org.apache.spark.sql.Row): (BigInt, BigInt) = {
      val hn = BigInt(r.getAs[Long]("hi_num")); val hd = BigInt(r.getAs[Long]("hi_den"))
      val ln = BigInt(r.getAs[Long]("lo_num")); val ld = BigInt(r.getAs[Long]("lo_den"))
      (hn * ld - ln * hd, hd * ld)
    }
    val (rn, rd) = width(row)
    val (cn, cd) = width(clu)
    assert(cn * rd > rn * cd,
      s"cluster CI ($cn/$cd) not wider than row CI ($rn/$rd)")
  }

  test("groupedBootstrapMeanCI: per-group CIs match per-group references, weights shared with the global CI") {
    import spark.implicits._
    val rows = (0 until 60).map(i =>
      (s"g$i", 10L + (i % 9), if (i % 2 == 0) "even" else "odd"))
    val df = rows.map(r => (r._1, r._2, r._3)).toDF("k", "v", "g")
      .repartition(4)
    val out = Resample.groupedBootstrapMeanCI(df, col("k"), col("v"),
      col("g"), reps = 80, seed = "gci", tailDen = 40).collect()
    assert(out.length === 2)
    out.foreach { r =>
      val g = r.getAs[String]("g")
      val units = rows.filter(_._3 == g).map(x => (x._1, 1L, x._2))
      // Per-group reference runs the SAME row-keyed weights — the
      // group partition must not re-key the randomness.
      val (n, s, ranked) = referenceCI(units, 80, "gci", 40)
      assert(r.getAs[Long]("n") === n, s"n for $g")
      assert(r.getAs[Long]("sum_total") === s, s"s for $g")
      assert(r.getAs[Long]("lo_num") === ranked(1)._1, s"lo_num for $g")
      assert(r.getAs[Long]("lo_den") === ranked(1)._2, s"lo_den for $g")
      assert(r.getAs[Long]("hi_num") === ranked(78)._1, s"hi_num for $g")
      assert(r.getAs[Long]("hi_den") === ranked(78)._2, s"hi_den for $g")
    }
  }

  /** Plain-Scala reference for the paired diff CI: shared weights per
   * row, scaled-floor ordering, exact cross-multiplied bounds. */
  private def referenceDiffCI(rows: Seq[(String, Long, Boolean, Boolean)],
      reps: Int, seed: String): Seq[(BigInt, BigInt, Boolean)] = {
    val kept = rows.filter(r => r._3 || r._4)
    val perRep = (1 to reps).map { b =>
      val ws = kept.map(r => (refWeight(seed, b, r._1), r))
      val na = ws.collect { case (w, r) if r._3 => w }.sum
      val sa = ws.collect { case (w, r) if r._3 => w * r._2 }.sum
      val nb = ws.collect { case (w, r) if r._4 => w }.sum
      val sb = ws.collect { case (w, r) if r._4 => w * r._2 }.sum
      val scale = BigInt("1000000000000000")
      val q = if (na == 0 || nb == 0) -BigInt("1000000000000000000")
        else BigInt(sa) * scale / BigInt(na) - BigInt(sb) * scale / BigInt(nb)
      val (num, den, ok) =
        if (na == 0 || nb == 0) (BigInt(0), BigInt(0), false)
        else (BigInt(sa) * nb - BigInt(sb) * na, BigInt(na) * nb, true)
      (q, b, num, den, ok)
    }
    perRep.sortBy(r => (r._1, r._2)).map(r => (r._3, r._4, r._5))
  }

  test("bootstrapMeanDiffCI: paired replicates match the reference; CI brackets the observed diff") {
    import spark.implicits._
    // Overlapping releases: 70 shared rows, 15 A-only, 15 B-only with
    // a planted +5 shift on the B-only tail.
    val rows = (0 until 70).map(i => (s"s$i", 30L + (i % 7), true, true)) ++
      (0 until 15).map(i => (s"ao$i", 28L + (i % 5), true, false)) ++
      (0 until 15).map(i => (s"bo$i", 35L + (i % 5), false, true))
    val df = rows.toDF("k", "v", "a", "bb").repartition(4)
    val out = Resample.bootstrapMeanDiffCI(df, col("k"), col("v"),
      col("a"), col("bb"), reps = 80, seed = "dci", tailDen = 40)
      .collect().head
    val ranked = referenceDiffCI(rows, 80, "dci")
    val lo = ranked(1) // rank 2
    val hi = ranked(78) // rank 79
    assert(out.getAs[Long]("n_a") === 85L)
    assert(out.getAs[Long]("n_b") === 85L)
    // Diff/bound rationals ship as strings (FIXTURES.md contract).
    def bd(r: org.apache.spark.sql.Row, f: String): BigInt =
      BigInt(r.getAs[String](f))
    assert(lo._3 && hi._3, "picked replicates degenerate in fixture")
    assert(bd(out, "lo_num") === lo._1)
    assert(bd(out, "lo_den") === lo._2)
    assert(bd(out, "hi_num") === hi._1)
    assert(bd(out, "hi_den") === hi._2)
    // CI brackets the observed diff (exact rational comparison).
    val dn = bd(out, "diff_num"); val dd = bd(out, "diff_den")
    assert(bd(out, "lo_num") * dd <= dn * bd(out, "lo_den"))
    assert(bd(out, "hi_num") * dd >= dn * bd(out, "hi_den"))
  }

  test("bootstrapMeanDiffCI: identical releases center the CI on zero") {
    import spark.implicits._
    val rows = (0 until 50).map(i => (s"z$i", 10L + (i % 4), true, true))
    val df = rows.toDF("k", "v", "a", "bb")
    val out = Resample.bootstrapMeanDiffCI(df, col("k"), col("v"),
      col("a"), col("bb"), reps = 40, seed = "zz", tailDen = 40)
      .collect().head
    def bd(f: String): BigInt = BigInt(out.getAs[String](f))
    // Paired weights make every replicate diff EXACTLY zero when the
    // two releases are the same row set — the pairing property itself.
    assert(bd("diff_num") === BigInt(0))
    assert(bd("lo_num") === BigInt(0) && bd("hi_num") === BigInt(0))
  }

  test("unitBootstrapRatioCI matches the reference (units ARE the (key, den, num) triples)") {
    import spark.implicits._
    // 30 units: den 10..39, num = den/3-ish (an uneven rate).
    val units = (0 until 30).map(i => (s"u$i", 10L + i, (10L + i) / 3))
    val df = units.toDF("u", "d", "m").repartition(4)
    val out = Resample.unitBootstrapRatioCI(df, col("u"), col("d"),
      col("m"), reps = 80, seed = "ur", tailDen = 40).collect().head
    val (n, s, ranked) = referenceCI(units, 80, "ur", 40)
    assert(out.getAs[Long]("den_total") === n)
    assert(out.getAs[Long]("num_total") === s)
    assert(out.getAs[Long]("n_units") === 30L)
    assert(out.getAs[Long]("lo_num") === ranked(1)._1)
    assert(out.getAs[Long]("lo_den") === ranked(1)._2)
    assert(out.getAs[Long]("hi_num") === ranked(78)._1)
    assert(out.getAs[Long]("hi_den") === ranked(78)._2)
    // Ratio CI brackets the observed rate, exactly.
    assert(BigInt(ranked(1)._1) * n <= BigInt(s) * ranked(1)._2)
    assert(BigInt(ranked(78)._1) * n >= BigInt(s) * ranked(78)._2)
  }

  test("bootstrapMeanCI rejects reps not divisible by tailDen") {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Resample.bootstrapMeanCI(df, col("k"), col("v"), 81, "x", 40)
    }
  }

  test("CI scaled-display domain guard raises loudly past 2^63/10^15") {
    import spark.implicits._
    // A mean of 10^10 value units overflows the 10^15-scaled BIGINT
    // display columns; non-ANSI Spark would silently NULL them (and
    // mis-rank the replicate against the empty sentinel) while the
    // DuckDB oracle raises — the guard makes the engine raise too.
    val big = (0 until 8).map(i => (s"k$i", 10000000000L)).toDF("k", "v")
    val e = intercept[Exception] {
      Resample.bootstrapMeanCI(big, col("k"), col("v"),
        reps = 8, seed = "ovf", tailDen = 4).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("scaled BIGINT display domain")),
      s"expected the domain guard, got: ${messages(e).mkString(" | ")}")
    // Means inside the domain are untouched by the guard.
    val ok = (0 until 8).map(i => (s"k$i", 9000L)).toDF("k", "v")
    val row = Resample.bootstrapMeanCI(ok, col("k"), col("v"),
      reps = 8, seed = "ovf", tailDen = 4).collect().head
    assert(row.getAs[Long]("mean_scaled") === 9000L * 1000000000000000L)
    // Negative direction: since r17 ANY negative sum trips the
    // non-negativity contract guard (it would both mis-rank against the
    // -1 empty sentinel and round differently between Spark's
    // truncating div and the oracle's flooring //) — the raise fires
    // whether the magnitude would overflow the display domain or not.
    val neg = (0 until 8).map(i => (s"k$i", -10000000000L)).toDF("k", "v")
    val en = intercept[Exception] {
      Resample.bootstrapMeanCI(neg, col("k"), col("v"),
        reps = 8, seed = "ovf", tailDen = 4).collect()
    }
    assert(messages(en).exists(_.contains("non-negative")),
      s"negative direction unguarded: ${messages(en).mkString(" | ")}")
    // The r17 ADVICE case specifically: an IN-RANGE negative mean (no
    // overflow anywhere) used to flow through `div`'s toward-zero
    // truncation while the DuckDB oracle floors — a silent off-by-one
    // between engines. Now it raises loudly instead.
    val negSmall = (0 until 8).map(i => (s"k$i", -5L)).toDF("k", "v")
    val es = intercept[Exception] {
      Resample.bootstrapMeanCI(negSmall, col("k"), col("v"),
        reps = 8, seed = "ovf", tailDen = 4).collect()
    }
    assert(messages(es).exists(_.contains("non-negative")),
      s"in-range negative mean unguarded: ${messages(es).mkString(" | ")}")
  }

  test("bh ranks are dense, ordered by exceedance then group key") {
    import spark.implicits._
    val df = sweepDocs.toDF("k", "v", "g").repartition(4)
    val out = Resample.fdrDriftSweep(df, col("k"), col("v"), col("g"),
      perms = 16, seed = "rank", fdrNum = 1, fdrDen = 20)
      .collect()
    val byRank = out.sortBy(_.getAs[Long]("bh_rank"))
    assert(byRank.map(_.getAs[Long]("bh_rank")).toSeq ===
      (1L to out.length.toLong))
    val keys = byRank.map(r =>
      (r.getAs[Long]("n_exceed"), r.getAs[String]("g"))).toSeq
    assert(keys === keys.sorted)
  }
}
