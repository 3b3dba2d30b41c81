package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RichnessSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-richness-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(texts: String*): (Long, Long, Long, Long, Long, Long, Long, Long) = {
    import spark.implicits._
    val r = Richness.chao1Vocabulary(texts.toDF("text")).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
  }

  test("chao1Vocabulary: hand-computed head on a crafted corpus") {
    // tokens: a×3, b×2, c×1, d×1  →  N=7, V=4, f1=2, f2=1
    // chao1 = 4 + 2·1/(2·2) = 4.5 = 18/4; GT unseen = 2/7.
    val (n, v, f1, f2, cn, cd, gn, gd) =
      run("a a b c", "a b d")
    assert((n, v, f1, f2) === ((7L, 4L, 2L, 1L)))
    assert((cn, cd) === ((18L, 4L)))
    assert(cn.toDouble / cd === 4.5)
    assert((gn, gd) === ((2L, 7L)))
  }

  test("chao1Vocabulary: no doubletons stays defined (bias-corrected form)") {
    // tokens: a×1, b×1 → V=2, f1=2, f2=0 → chao1 = 2 + 2·1/2 = 3 = 6/2.
    val (_, v, f1, f2, cn, cd, _, _) = run("a b")
    assert((v, f1, f2) === ((2L, 2L, 0L)))
    assert((cn, cd) === ((6L, 2L)))
  }

  test("chao1Vocabulary: saturated corpus estimates no unseen vocabulary") {
    // every type seen ≥3 times: f1 = f2 = 0 → chao1 = V exactly, GT = 0.
    val (_, v, _, _, cn, cd, gn, _) = run("a a a b b b", "a b")
    assert(v === 2L && cn === cd * v && gn === 0L)
  }

  test("chao1Vocabulary: empty corpus yields zeros and a 0-denominator GT") {
    val (n, v, _, _, cn, cd, _, gd) = run("", "   ")
    assert((n, v) === ((0L, 0L)))
    assert(cn === 0L && cd === 2L && gd === 0L)
  }
}
