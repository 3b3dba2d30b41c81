package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AgreementSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-agreement-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def kappa(pairs: Seq[(String, String)]): (Long, Long, Long, Long, Long) = {
    import spark.implicits._
    val r = Agreement.cohenKappa(pairs.toDF("a", "b").repartition(4),
      col("a"), col("b")).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("textbook 2x2 confusion reproduces the known kappa rational") {
    // Classic example: N=50, diag = 20 + 15 = 35,
    // marginals A: yes 25, no 25; B: yes 30, no 20 -> S = 25*30 + 25*20 = 1250.
    // kappa = (50*35 - 1250) / (2500 - 1250) = 500/1250 = 0.4.
    val pairs =
      Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val (n, agree, s, num, den) = kappa(pairs)
    assert((n, agree, s) === (50L, 35L, 1250L))
    assert(num === 500L && den === 1250L) // = 0.4 exactly
  }

  test("perfect agreement gives num = den; worse-than-chance goes negative") {
    val (_, _, _, pn, pd) = kappa(Seq(("a", "a"), ("b", "b"), ("c", "c")))
    assert(pn === pd && pn > 0)
    // Systematic disagreement on a balanced binary mix: kappa = -1.
    val (_, _, _, nn, nd) = kappa(Seq.fill(5)(("y", "n")) ++ Seq.fill(5)(("n", "y")))
    assert(nn === -nd && nn < 0)
  }

  test("labels present on only one side contribute zero chance agreement") {
    // B never answers 'c'; A never answers 'n' — the join over shared
    // labels must not fabricate marginal products for them.
    val (n, agree, s, _, _) =
      kappa(Seq(("c", "n"), ("c", "n"), ("y", "y")))
    assert(n === 3L && agree === 1L)
    assert(s === 1L) // only label 'y': rowA = 1, colB = 1
  }

  test("diagonal-absent labels still price chance agreement (the window-formulation bug)") {
    // Both sides use label 'x' but never on the same row: conf has no
    // (x, x) cell, yet S must include rowA(x) * colB(x) = 1.
    val (_, _, s, _, _) = kappa(Seq(("x", "y"), ("y", "x"), ("y", "y")))
    // labels: x -> 1*1 = 1; y -> 2*2 = 4.
    assert(s === 5L)
  }

  // ------------------------------------------------------------- Fleiss

  private def fleiss(ratings: Seq[(Long, String)])
      : (Long, Long, Long, Long, Long, Option[Long], Option[Long]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val r = Agreement.fleissKappa(
      ratings.toDF("item", "label"), col("item"), col("label")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      if (r.isNullAt(5)) None else Some(r.getLong(5)),
      if (r.isNullAt(6)) None else Some(r.getLong(6)))
  }

  test("fleissKappa: hand case lands on the exact rational -1/3") {
    // item 1: A, A; item 2: A, B. P_o = 1/2, P_e = 5/8 -> kappa = -1/3.
    val (n, rMin, rMax, t, e, num, den) = fleiss(Seq(
      (1L, "A"), (1L, "A"), (2L, "A"), (2L, "B")))
    assert((n, rMin, rMax) === ((2L, 2L, 2L)))
    assert(t === 6L && e === 10L)
    assert(num === Some(-2L) && den === Some(6L)) // = -1/3
  }

  test("fleissKappa: unanimous raters give kappa = 1 exactly") {
    val (_, _, _, _, _, num, den) = fleiss(Seq(
      (1L, "A"), (1L, "A"), (1L, "A"),
      (2L, "B"), (2L, "B"), (2L, "B")))
    assert(num.nonEmpty && num === den && num.get > 0L)
  }

  test("fleissKappa: unequal rating counts surface in (r_min, r_max) and NULL the kappa") {
    val (n, rMin, rMax, _, _, num, den) = fleiss(Seq(
      (1L, "A"), (1L, "A"), (2L, "A"), (2L, "A"), (2L, "B")))
    assert(n === 2L && rMin === 2L && rMax === 3L)
    assert(num.isEmpty && den.isEmpty,
      "a violated constant-raters precondition must not price a kappa")
  }

  test("fleissKappa: a single rating per item cannot price agreement (r < 2 -> NULL)") {
    val (_, rMin, rMax, _, _, num, _) = fleiss(Seq((1L, "A"), (2L, "B")))
    assert(rMin === 1L && rMax === 1L && num.isEmpty)
  }

  private def alpha(ratings: Seq[(Long, String)], maxRaters: Int)
      : (Long, Long, Long, Long, Long, Long, Long, Option[Long], Option[Long]) = {
    import spark.implicits._
    val r = Agreement.krippendorffAlpha(ratings.toDF("item", "label"),
      col("item"), col("label"), maxRaters).collect().head
    def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), opt(7), opt(8))
  }

  /** Exact plain-Scala reference: alpha as a reduced BigInt fraction over
   * the definitional per-unit rationals (no lcm trick). */
  private def alphaReference(ratings: Seq[(Long, String)])
      : Option[(BigInt, BigInt)] = {
    val byUnit = ratings.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      .filter(_._2.size >= 2)
    if (byUnit.isEmpty) return None
    val n = BigInt(byUnit.values.map(_.size).sum)
    if (n < 2) return None
    val catTotals = byUnit.values.flatten.groupBy(identity)
      .view.mapValues(v => BigInt(v.size)).toMap
    val e = n * n - catTotals.values.map(c => c * c).sum
    if (e == 0) return None
    // sum over units of a_u / (m_u - 1) as one fraction num/den
    val (num, den) = byUnit.values.foldLeft((BigInt(0), BigInt(1))) {
      case ((an, ad), labels) =>
        val m = BigInt(labels.size)
        val s2 = labels.groupBy(identity).values
          .map(g => BigInt(g.size) * g.size).sum
        val (bn, bd) = (m * m - s2, m - 1)
        (an * bd + bn * ad, ad * bd)
    }
    // alpha = 1 - (n-1) * (num/den) / e
    val aNum = den * e - (n - 1) * num
    val aDen = den * e
    val g = aNum.gcd(aDen)
    Some((aNum / g, aDen / g))
  }

  test("krippendorffAlpha: hand case with varying raters lands on exactly 1/2") {
    // u1 [a,a], u2 [a,b], u3 [b,b,b], u4 [c] (unpairable, excluded):
    // n=7, D_o(lcm=2) = 4, E = 49-25 = 24, alpha = (48-24)/48 = 1/2.
    val (n, u, mMin, mMax, lcm, d, e, num, den) = alpha(Seq(
      (1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (3L, "b"), (4L, "c")), maxRaters = 3)
    assert((n, u, mMin, mMax, lcm) === ((7L, 3L, 2L, 3L, 2L)))
    assert(d === 4L && e === 24L)
    assert(num === Some(24L) && den === Some(48L))
    assert(alphaReference(Seq(
      (1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (3L, "b"), (4L, "c")))
      === Some((BigInt(1), BigInt(2))))
  }

  test("krippendorffAlpha: equals the definitional BigInt reference on varied data") {
    val data = for {
      item <- 0L until 40L
      rater <- 0 until (1 + (item % 4).toInt)
    } yield (item, "l" + ((item * 7 + rater * 3) % 5))
    val (_, _, _, _, _, _, _, num, den) = alpha(data, maxRaters = 4)
    val Some((rn, rd)) = alphaReference(data)
    assert(num.nonEmpty && den.nonEmpty)
    val g = BigInt(num.get).gcd(BigInt(den.get))
    assert((BigInt(num.get) / g, BigInt(den.get) / g) === ((rn, rd)))
  }

  test("krippendorffAlpha: unanimity is alpha = 1; single-label corpus is NULL, not 1") {
    val (_, _, _, _, _, _, _, num, den) = alpha(Seq(
      (1L, "a"), (1L, "a"), (2L, "b"), (2L, "b")), maxRaters = 2)
    assert(num.nonEmpty && num === den && num.get > 0L)
    // All pairable ratings share one label: E = 0, alpha undefined.
    val (_, _, _, _, _, _, e0, n0, d0) = alpha(Seq(
      (1L, "a"), (1L, "a"), (2L, "a"), (2L, "a")), maxRaters = 2)
    assert(e0 === 0L && n0.isEmpty && d0.isEmpty)
  }

  test("krippendorffAlpha: a violated maxRaters promise NULLs alpha, never misprices it") {
    val (_, _, _, mMax, _, _, _, num, den) = alpha(Seq(
      (1L, "a"), (1L, "b"), (1L, "a"), (2L, "a"), (2L, "b")), maxRaters = 2)
    assert(mMax === 3L)
    assert(num.isEmpty && den.isEmpty)
    intercept[IllegalArgumentException] {
      Agreement.krippendorffAlpha(
        { import spark.implicits._; Seq((1L, "a")).toDF("item", "label") },
        col("item"), col("label"), maxRaters = 44)
    }
  }

  /** Definitional quadratic-weighted kappa over an explicit confusion
   * matrix, in BigInt — the independent reference. */
  private def refWeightedKappa(pairs: Seq[(Long, Long)]): (BigInt, BigInt) = {
    val n = BigInt(pairs.size)
    val dObs = pairs.map { case (i, j) => BigInt(i - j) * BigInt(i - j) }.sum
    val labels = (pairs.map(_._1) ++ pairs.map(_._2)).distinct
    val w = (for (i <- labels; j <- labels) yield {
      val ri = BigInt(pairs.count(_._1 == i))
      val cj = BigInt(pairs.count(_._2 == j))
      BigInt(i - j) * BigInt(i - j) * ri * cj
    }).sum
    (w - n * dObs, w)
  }

  test("weightedKappa: hand case — near-miss costs less than far-miss") {
    import spark.implicits._
    // 8 pairs: 6 exact agreements on tiers 0..2, one near-miss (1,2),
    // one far-miss (0,4).
    val pairs = Seq((0L, 0L), (0L, 0L), (1L, 1L), (1L, 1L), (2L, 2L),
      (2L, 2L), (1L, 2L), (0L, 4L))
    val out = Agreement.weightedKappa(pairs.toDF("a", "b"),
      col("a"), col("b")).collect().head
    val (num, den) = refWeightedKappa(pairs)
    assert(out.getAs[Long]("n") === 8L)
    assert(out.getAs[Long]("d_obs") === 1L + 16L)
    assert(BigInt(out.getAs[Long]("kappa_num")) === num)
    assert(BigInt(out.getAs[Long]("kappa_den")) === den)
    // Swap the far-miss for a second near-miss: kappa must rise —
    // that's the ordinal pricing nominal kappa can't express.
    val softer = pairs.dropRight(1) :+ ((0L, 1L))
    val out2 = Agreement.weightedKappa(softer.toDF("a", "b"),
      col("a"), col("b")).collect().head
    val betterNum = BigInt(out2.getAs[Long]("kappa_num"))
    val betterDen = BigInt(out2.getAs[Long]("kappa_den"))
    assert(betterNum * den > num * betterDen,
      "near-miss corpus must score higher weighted kappa than far-miss")
  }

  test("weightedKappa: perfect agreement is exactly 1; reference holds on varied data") {
    import spark.implicits._
    val perfect = Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L))
    val p = Agreement.weightedKappa(perfect.toDF("a", "b"),
      col("a"), col("b")).collect().head
    assert(p.getAs[Long]("kappa_num") === p.getAs[Long]("kappa_den"))
    assert(p.getAs[Long]("d_obs") === 0L)
    val rnd = new scala.util.Random(11)
    val mixed = Seq.fill(60)((rnd.nextInt(5).toLong, rnd.nextInt(5).toLong))
    val out = Agreement.weightedKappa(mixed.toDF("a", "b"),
      col("a"), col("b")).collect().head
    val (num, den) = refWeightedKappa(mixed)
    assert(BigInt(out.getAs[Long]("kappa_num")) === num)
    assert(BigInt(out.getAs[Long]("kappa_den")) === den)
  }

  test("weightedKappa: null on either side excludes the pair") {
    import spark.implicits._
    val df = Seq((Some(1L), Some(1L)), (None: Option[Long], Some(2L)),
      (Some(3L), None: Option[Long]), (Some(2L), Some(0L)))
      .toDF("a", "b")
    val out = Agreement.weightedKappa(df, col("a"), col("b"))
      .collect().head
    assert(out.getAs[Long]("n") === 2L)
    assert(out.getAs[Long]("d_obs") === 4L)
  }
}
