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
}
