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
}
