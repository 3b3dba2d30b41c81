package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Definitional property checks for the round-13 exact statistics: each
 * operator's rational output is compared against a brute-force
 * plain-Scala reference computed from first principles on generated
 * inputs — the same discipline as DedupPropertySpec. Generation is
 * seeded-deterministic (no test flake, reproducible failures). */
class EvalPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-eval-property-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("rankAuc equals the definitional pair-counting AUC on generated inputs") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val n = 20 + rng.nextInt(60)
      // Small score domain forces heavy ties — the midrank path.
      val rows = Seq.fill(n)((rng.nextInt(6).toLong, rng.nextBoolean()))
      val r = Eval.rankAuc(rows.toDF("s", "p"), col("s"), col("p")).head()
      val (num, den) = (r.getLong(3), r.getLong(4))
      // Definitional: over all (pos, neg) pairs, wins + half-ties.
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      // 2 * (wins + ties/2) = 2*wins + ties keeps everything integer.
      val num2 = pos.map(sp => 2L * neg.count(sp > _) + neg.count(sp == _)).sum
      val den2 = 2L * pos.size * neg.size
      if (den2 == 0L) assert(den === 0L, s"trial $trial: single-class must 0-den")
      else assert(num * den2 === num2 * den,
        s"trial $trial: engine $num/$den != definitional $num2/$den2")
    }
  }

  test("gini equals the mean-absolute-difference identity on generated inputs") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 8) {
      val n = 2 + rng.nextInt(12)
      val rows = (1 to n).map(i => (s"k$i", rng.nextInt(100).toLong))
      val r = Balance.gini(rows.toDF("k", "w"), col("k"), col("w")).head()
      val (num, den) = (r.getLong(2), r.getLong(3))
      // Definitional: G = sum_ij |x_i - x_j| / (2 n W).
      val xs = rows.map(_._2)
      val mad = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum
      val w = xs.sum
      if (w == 0L) assert(num === 0L && den === 0L)
      else assert(num * (2L * n * w) === mad * den,
        s"trial $trial: engine $num/$den != definitional $mad/(2*$n*$w)")
    }
  }

  test("fleissKappa equals a plain-Scala Fleiss reference on generated rating tables") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 8) {
      val nItems = 3 + rng.nextInt(10)
      val r = 2 + rng.nextInt(4)
      val labels = Seq("a", "b", "c")
      val rows = for (i <- 1 to nItems; _ <- 1 to r)
        yield (i.toLong, labels(rng.nextInt(labels.size)))
      val out = Agreement.fleissKappa(rows.toDF("item", "lb"),
        col("item"), col("lb")).head()
      val (num, den) = (out.getLong(5), out.getLong(6))
      // Reference: T = sum n_ij^2, E = sum column-total^2, the same
      // rearranged rational derived independently here.
      val cnt = rows.groupBy(identity).map(_._2.size.toLong)
      val t = cnt.map(c => c * c).sum
      val e = rows.groupBy(_._2).map(_._2.size.toLong).map(c => c * c).sum
      val nn = nItems.toLong; val rr = r.toLong
      val refNum = nn * rr * (t - nn * rr) - e * (rr - 1L)
      val refDen = (nn * nn * rr * rr - e) * (rr - 1L)
      assert(num === refNum && den === refDen,
        s"trial $trial: engine $num/$den != reference $refNum/$refDen")
      // And the reference itself matches the textbook P_o/P_e form.
      val pObar = (t - nn * rr).toDouble / (nn * rr * (rr - 1L))
      val pE = e.toDouble / (nn * rr * nn * rr)
      if (pE < 1.0)
        assert(math.abs(num.toDouble / den - (pObar - pE) / (1 - pE)) < 1e-12)
    }
  }
}
