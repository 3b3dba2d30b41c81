package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property test: weightedSample's map-side min-ticket priorities and
 * global top-n agree with a definitional plain-Scala restatement on
 * arbitrary corpora — zero weights, weights above the clamp, duplicate
 * weights, n larger than the eligible population, and varying seeds. The
 * sequence/array_min formulation has no special cases for any of these. */
class WeightedSamplePropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-wsampleprop-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def md5U63(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    (0 until 8).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL)) >>> 1
  }

  private val corpusGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(0, 80)
    ids <- Gen.listOfN(n, Gen.chooseNum(1L, 100000L)).map(_.distinct)
    ws <- Gen.listOfN(ids.size, Gen.frequency(
      (2, Gen.const(0L)), (6, Gen.chooseNum(1L, 6L)), (1, Gen.chooseNum(7L, 40L))))
  } yield ids.zip(ws)

  test("min-ticket top-n equals the definitional restatement on generated corpora") {
    import spark.implicits._
    val maxTickets = 6
    val seed0 = org.scalacheck.rng.Seed(13L)
    val cases = Iterator.iterate(seed0)(_.next).take(10).flatMap { s =>
      corpusGen(Gen.Parameters.default, s)
    }.toList
    for ((rows, i) <- cases.zipWithIndex) {
      val seed = 100L + i
      val n = 1 + i % 25
      val got = Sampling.weightedSample(rows.toDF("id", "w"), col("id"), col("w"),
          n = n, seed = seed, maxTickets = maxTickets)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val ref = rows
        .map { case (id, w) => (id, math.min(w, maxTickets.toLong)) }
        .filter(_._2 > 0)
        .map { case (id, w) =>
          (id, w, (0L until w).map(t => md5U63(s"$seed:$id:$t")).min)
        }
        .sortBy(t => (t._3, t._1)).take(n).toSet
      assert(got === ref, s"case $i (n=$n, seed=$seed) diverged")
    }
  }
}
