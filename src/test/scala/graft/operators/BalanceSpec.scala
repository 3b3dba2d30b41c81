package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class BalanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-balance-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def gini(rows: Seq[(String, Long)]): (Long, Long, Long, Long) = {
    import spark.implicits._
    val r = Balance.gini(rows.toDF("k", "w"), col("k"), col("w")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("gini: hand case (1, 3) lands on exactly 1/4") {
    val (n, total, num, den) = gini(Seq(("a", 1L), ("b", 3L)))
    assert((n, total) === ((2L, 4L)))
    assert(num * 4L === den, s"expected 1/4, got $num/$den")
  }

  test("gini: a perfectly even mix prices zero") {
    val (_, _, num, den) = gini(Seq(("a", 5L), ("b", 5L), ("c", 5L)))
    assert(num === 0L && den > 0L)
  }

  test("gini: per-key totals aggregate before ranking") {
    // a = 1+2 = 3, b = 3 -> even -> zero.
    val (n, total, num, _) = gini(Seq(("a", 1L), ("a", 2L), ("b", 3L)))
    assert(n === 2L && total === 6L && num === 0L)
  }

  test("gini: extreme concentration approaches (n-1)/n") {
    // x = (0, 0, 12): G = (2*36 - 4*12) / (3*12) = 24/36 = 2/3.
    val (_, _, num, den) = gini(Seq(("a", 0L), ("b", 0L), ("c", 12L)))
    assert(num * 3L === den * 2L, s"expected 2/3, got $num/$den")
  }

  test("gini: empty input yields the 0/0 no-distribution row") {
    val (n, total, num, den) = gini(Seq.empty)
    assert((n, total, num, den) === ((0L, 0L, 0L, 0L)))
  }

  private def chi(rows: Seq[(String, String)]) = {
    import spark.implicits._
    Balance.chiSquareIndependence(rows.toDF("r", "c"), col("r"), col("c"))
      .collect().map(x => ((x.getString(0), x.getString(1)),
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5),
          // chi rationals ship as strings (FIXTURES.md contract)
          x.getString(6).toLong, x.getString(7).toLong)))
      .toMap
  }

  test("chiSquareIndependence: hand-checked 2x2 with E = 2 everywhere") {
    // a: 3x + 1y, b: 1x + 3y -> N = 8, every margin 4, E = 2;
    // each cell (O-E)^2/E = 1/2 -> (N*O - R*C)^2/(N*R*C) = 64/128.
    val rows = Seq.fill(3)(("a", "x")) ++ Seq(("a", "y"), ("b", "x")) ++
      Seq.fill(3)(("b", "y"))
    val out = chi(rows)
    assert(out.size === 4)
    for (((_, _), (o, r, c, n, num, den)) <- out) {
      assert(r === 4L && c === 4L && n === 8L)
      assert(num === 64L && den === 128L, s"o=$o")
    }
  }

  test("chiSquareIndependence: an independent table prices zero in every cell") {
    // a: 2x + 2y, b: 1x + 1y -> col split identical within each row.
    val rows = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("a", "y"),
      ("b", "x"), ("b", "y"))
    assert(chi(rows).values.forall(_._5 === 0L))
  }

  test("chiSquareIndependence: zero-observed margin-cross cells are included and priced") {
    val out = chi(Seq(("a", "x"), ("b", "y")))
    // (a,y) never observed: O=0, (2*0 - 1*1)^2 = 1 over 2*1*1 = 2.
    assert(out(("a", "y")) === ((0L, 1L, 1L, 2L, 1L, 2L)))
    assert(out(("a", "x")) === ((1L, 1L, 1L, 2L, 1L, 2L)))
    assert(out.size === 4)
  }

  test("chiSquareIndependence: null keys are excluded from counts and margins") {
    import spark.implicits._
    val df = Seq[(Option[String], Option[String])](
      (Some("a"), Some("x")), (None, Some("x")), (Some("a"), None))
      .toDF("r", "c")
    val out = Balance.chiSquareIndependence(df, col("r"), col("c")).collect()
    assert(out.length === 1 && out.head.getLong(5) === 1L)
  }

  private def shift(prev: Seq[String], cur: Seq[String]) = {
    import spark.implicits._
    Balance.mixShift(prev.toDF("k"), cur.toDF("k"), col("k"))
      .collect().map(r => (if (r.isNullAt(0)) "<total>" else r.getString(0),
        r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  test("mixShift: hand-checked deviations and total-row TV") {
    // prev: 3a 1b (P=4); cur: 1a 1b 2c (C=4).
    // dev_a = |3*4 - 1*4| = 8; dev_b = 0; dev_c = |0 - 2*4| = 8.
    // TV = 16 / (2*4*4) = 1/2.
    val out = shift(Seq("a", "a", "a", "b"), Seq("a", "b", "c", "c"))
    assert(out.toSeq === Seq(
      ("a", 3L, 1L, 8L), ("b", 1L, 1L, 0L), ("c", 0L, 2L, 8L),
      ("<total>", 4L, 4L, 16L)))
  }

  test("mixShift: identical mixes price zero; disjoint mixes price TV = 1") {
    val same = shift(Seq("a", "b"), Seq("a", "b"))
    assert(same.last === (("<total>", 2L, 2L, 0L)))
    // disjoint: dev = P*C each side -> total 2*P*C -> TV = 1 exactly.
    val disj = shift(Seq("a"), Seq("b", "b"))
    assert(disj.last === (("<total>", 1L, 2L, 4L)))
  }
}
