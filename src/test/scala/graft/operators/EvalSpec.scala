package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class EvalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-eval-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def auc(rows: Seq[(Long, Boolean)]): (Long, Long, Long, Long, Long) = {
    import spark.implicits._
    val r = Eval.rankAuc(rows.toDF("s", "p"), col("s"), col("p")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("rankAuc: perfect separation scores exactly 1") {
    val (np, nn, _, num, den) = auc(Seq((1L, false), (2L, false), (5L, true), (9L, true)))
    assert((np, nn) === ((2L, 2L)))
    assert(num === den && den === 8L) // 2*2*2
  }

  test("rankAuc: reversed scorer scores exactly 0") {
    val (_, _, _, num, _) = auc(Seq((9L, false), (5L, false), (1L, true)))
    assert(num === 0L)
  }

  test("rankAuc: all-tied scores land on exactly 1/2 via midranks") {
    val (_, _, rs2, num, den) = auc(Seq((3L, true), (3L, false), (3L, false), (3L, true)))
    // midrank of every row = 2.5 -> x2 = 5; R+*2 = 10.
    assert(rs2 === 10L)
    assert(num * 2L === den, s"expected 1/2, got $num/$den")
  }

  test("rankAuc: textbook mixed case with a tie straddling the classes") {
    // neg: 1, 3; pos: 3, 7. Ranks: 1->1; the two 3s midrank 2.5; 7->4.
    // R+*2 = 5 + 8 = 13; num = 13 - 2*3 = 7; den = 8 -> AUC 0.875.
    val (_, _, rs2, num, den) = auc(Seq((1L, false), (3L, false), (3L, true), (7L, true)))
    assert(rs2 === 13L && num === 7L && den === 8L)
  }

  test("rankAuc: single-class input yields den = 0, and null scores/labels are excluded") {
    import spark.implicits._
    val df = Seq((Some(1L), Some(true)), (Some(2L), Some(true)),
      (None, Some(false)), (Some(5L), None)).toDF("s", "p")
    val r = Eval.rankAuc(df, col("s"), col("p")).head()
    assert(r.getLong(0) === 2L && r.getLong(1) === 0L && r.getLong(4) === 0L)
  }

  test("rankAuc histogram-window guard: raises past the bucket bound, identical result below it") {
    import spark.implicits._
    // 5 distinct scores; bound at 4 -> the bounded-universe contract
    // (scaladoc-only before r17) now raises instead of silently
    // single-tasking an unbounded histogram.
    val rows = Seq((1L, true), (2L, false), (3L, true), (4L, false), (5L, true))
    val df = rows.toDF("s", "p")
    val e = intercept[Exception] {
      Eval.rankAucBounded(df, col("s"), col("p"), maxBuckets = 4L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m => m.contains("rankAuc") &&
      m.contains("more than 4 distinct score buckets")),
      s"expected the histogram guard, got: ${messages(e).mkString(" | ")}")
    // At the bound (5 buckets <= 5) the guard is inert and the result
    // matches the unbounded default path bit-for-bit.
    val bounded = Eval.rankAucBounded(df, col("s"), col("p"), maxBuckets = 5L).head()
    val default = Eval.rankAuc(df, col("s"), col("p")).head()
    assert(bounded.toSeq === default.toSeq)
  }

  private def disparity(rows: Seq[(String, Long)], cutoff: Long) = {
    import spark.implicits._
    Eval.keepRateDisparity(rows.toDF("g", "v"), col("g"), col("v") >= cutoff).head()
  }

  test("keepRateDisparity: exact cross-multiplied gap between extreme groups") {
    // a keeps 2/2, b keeps 1/4 -> gap = (2*4 - 1*2) / (2*4) = 6/8 = 3/4.
    val r = disparity(Seq(("a", 10L), ("a", 10L),
      ("b", 10L), ("b", 1L), ("b", 1L), ("b", 1L)), 5L)
    assert(r.getAs[String]("max_group") === "a")
    assert(r.getAs[String]("min_group") === "b")
    assert(r.getAs[Long]("gap_num") === 6L && r.getAs[Long]("gap_den") === 8L)
  }

  test("keepRateDisparity: e6-rate ties break by key (max takes the larger, min the smaller)") {
    val r = disparity(Seq(("a", 10L), ("b", 10L), ("c", 1L)), 5L)
    // a and b both keep 1/1 -> max = b (larger key); min = c (0/1).
    assert(r.getAs[String]("max_group") === "b")
    assert(r.getAs[String]("min_group") === "c")
    assert(r.getAs[Long]("n_groups") === 3L)
  }

  private def calibrate(rows: Seq[(Long, Boolean)], bins: Int = 10) = {
    import spark.implicits._
    Eval.calibrationAudit(rows.toDF("c", "p"), col("c"), col("p"), bins)
      .collect().map(r => (if (r.isNullAt(0)) -1 else r.getInt(0),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
  }

  test("calibrationAudit: hand-checked bins, deviations, and total-row ECE") {
    // Bin 2 (conf .20-.30): two docs at 250000, one positive ->
    //   dev = |1e6*1 - 500000| = 500000.
    // Bin 7: one doc at 750000, positive -> dev = |1e6 - 750000| = 250000.
    // Bin 9 via clamp: conf_e6 = 1000000 -> 1e6 div 1e5 = 10 -> bin 9,
    //   negative -> dev = |0 - 1000000| = 1000000.
    val out = calibrate(Seq(
      (250000L, true), (250000L, false), (750000L, true), (1000000L, false)))
    assert(out.toSeq === Seq(
      (2, 2L, 1L, 500000L, 500000L),
      (7, 1L, 1L, 750000L, 250000L),
      (9, 1L, 0L, 1000000L, 1000000L),
      (-1, 4L, 2L, 2250000L, 1750000L)))
    // ECE = 1750000 / (1e6 * 4) = 0.4375 -- the consumer's one division.
  }

  test("calibrationAudit: a perfectly calibrated scorer has ECE 0 in every bin") {
    // 10 docs at conf .50, exactly 5 positive: dev = |5e6 - 5e6| = 0.
    val rows = (1 to 10).map(i => (500000L, i <= 5))
    val out = calibrate(rows)
    assert(out.toSeq === Seq((5, 10L, 5L, 5000000L, 0L), (-1, 10L, 5L, 5000000L, 0L)))
  }

  test("calibrationAudit: null confidences/outcomes excluded; bins validated") {
    import spark.implicits._
    val df = Seq[(Option[Long], Option[Boolean])](
      (Some(100000L), Some(true)), (None, Some(true)), (Some(5L), None))
      .toDF("c", "p")
    val out = Eval.calibrationAudit(df, col("c"), col("p")).collect()
    assert(out.length === 2 && out.last.getLong(1) === 1L)
    intercept[IllegalArgumentException] {
      Eval.calibrationAudit(df, col("c"), col("p"), bins = 7)
    }
  }

  test("mcnemar: hand-checked 2x2 disagreement and statistic") {
    import spark.implicits._
    // both: 3, a-only: 4, b-only: 1, neither: 2 -> (4-1)^2 / (4+1) = 9/5.
    val rows = Seq.fill(3)((true, true)) ++ Seq.fill(4)((true, false)) ++
      Seq((false, true)) ++ Seq.fill(2)((false, false))
    val r = Eval.mcnemar(rows.toDF("a", "b"), col("a"), col("b")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((3L, 4L, 1L, 2L)))
    assert((r.getLong(4), r.getLong(5)) === ((9L, 5L)))
  }

  test("mcnemar: perfect agreement ships den = 0; nulls excluded") {
    import spark.implicits._
    val agree = Seq((true, true), (false, false))
    val r = Eval.mcnemar(agree.toDF("a", "b"), col("a"), col("b")).head()
    assert(r.getLong(4) === 0L && r.getLong(5) === 0L)
    val withNulls = Seq[(Option[Boolean], Option[Boolean])](
      (Some(true), Some(false)), (None, Some(true)), (Some(false), None))
      .toDF("a", "b")
    val r2 = Eval.mcnemar(withNulls, col("a"), col("b")).head()
    assert(r2.getLong(1) === 1L && r2.getLong(2) === 0L)
  }

  private def kw(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    Eval.kruskalWallis(rows.toDF("s", "g"), col("s"), col("g"))
      .collect().map(r => (if (r.isNullAt(0)) "<total>" else r.getString(0),
        r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
  }

  test("kruskalWallis: hand-checked doubled midranks, tie term, and the N(N+1) identity") {
    // a: {1, 3}, b: {2, 2}. Ranks: 1->1, the two 2s -> midrank 2.5,
    // 3 -> 4. R2_a = 2 + 8 = 10, R2_b = 5 + 5 = 10.
    // Tie term: the 2-group contributes 2^3 - 2 = 6.
    val out = kw(Seq((1L, "a"), (3L, "a"), (2L, "b"), (2L, "b")))
    assert(out.toSeq === Seq(
      ("a", 2L, 10L, -1L), ("b", 2L, 10L, -1L),
      ("<total>", 4L, 20L, 6L)))
    assert(out.last._3 === 4L * 5L, "sum of doubled ranks must be N(N+1)")
  }

  test("kruskalWallis: tie-free groups recover plain doubled rank sums") {
    // a: {10, 40} ranks {1, 4}; b: {20, 30} ranks {2, 3} -> equal sums.
    val out = kw(Seq((10L, "a"), (40L, "a"), (20L, "b"), (30L, "b")))
    assert(out.toSeq === Seq(
      ("a", 2L, 10L, -1L), ("b", 2L, 10L, -1L),
      ("<total>", 4L, 20L, 0L)))
  }

  test("kruskalWallis: null scores and groups are excluded") {
    import spark.implicits._
    val df = Seq[(Option[Long], Option[String])](
      (Some(1L), Some("a")), (None, Some("a")), (Some(2L), None))
      .toDF("s", "g")
    val out = Eval.kruskalWallis(df, col("s"), col("g")).collect()
    assert(out.length === 2 && out.last.getLong(1) === 1L)
  }
}
