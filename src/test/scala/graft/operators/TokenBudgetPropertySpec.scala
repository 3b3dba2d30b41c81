package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property test: tokenBudgetSample's two-phase bucketed prefix sum agrees
 * with a definitional plain-Scala prefix sum on arbitrary corpora —
 * including zero-weight rows, duplicate weights, budgets on exact
 * cumulative boundaries, and budgets past the corpus total. The bucketed
 * scheme has no special cases for any of these; this spec proves it. */
class TokenBudgetPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-budgetprop-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def md5Signed(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    (0 until 8).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
  }

  private val corpusGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(0, 60)
    ids <- Gen.listOfN(n, Gen.chooseNum(1L, 10000L)).map(_.distinct)
    ws <- Gen.listOfN(ids.size, Gen.frequency(
      (1, Gen.const(0L)), (8, Gen.chooseNum(1L, 50L))))
  } yield ids.zip(ws)

  test("bucketed prefix sum equals the definitional one on generated corpora") {
    import spark.implicits._
    val seed0 = org.scalacheck.rng.Seed(7L)
    val cases = Iterator.iterate(seed0)(_.next).take(12).flatMap { s =>
      corpusGen(Gen.Parameters.default, s)
    }.toList
    for ((rows, i) <- cases.zipWithIndex) {
      val total = rows.map(_._2).sum
      // Budgets probing the edges: zero, mid, an exact cumulative
      // boundary (the running total after 1/3 of the admission order),
      // and past-the-end.
      val ordered = rows.map { case (id, w) => (md5Signed(s"$i:$id"), id, w) }
        .sortBy(t => (t._1, t._2))
      val boundary = ordered.take(ordered.size / 3).map(_._3).sum
      val budgets = List(0L, total / 2 + 1, boundary, total + 5).distinct
      val df = rows.toDF("id", "w")
      for (budget <- budgets) {
        val got = Sampling.tokenBudgetSample(df, col("id"), col("w"),
            budget, seed = i.toLong)
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        var cum = 0L
        val want = scala.collection.mutable.Map[Long, (Long, Long)]()
        for ((_, id, w) <- ordered) {
          if (cum < budget) want(id) = (w, cum)
          cum += w
        }
        assert(got === want.toMap, s"case $i budget $budget rows ${rows.size}")
      }
    }
  }
}
