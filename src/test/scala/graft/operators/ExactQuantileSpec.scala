package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExactQuantileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-exact-quantile-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val qs = Seq((0, 1), (1, 2), (9, 10), (1, 1))

  private def reference(vals: Seq[Long]): Map[(Int, Int), Long] = {
    val sorted = vals.sorted
    qs.map { case (num, den) =>
      val k = (vals.size - 1).toLong * num / den + 1
      (num, den) -> sorted((k - 1).toInt)
    }.toMap
  }

  private def run(rows: Seq[(String, Long)], shift: Int): Map[(String, Int, Int), Long] = {
    import spark.implicits._
    ExactQuantile.exactQuantilesByKey(rows.toDF("g", "v"),
      col("g"), col("v"), qs, shift)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) -> r.getLong(4))
      .toMap
  }

  test("matches the sort-based reference across groups, ties, and shifts") {
    // Deterministic pseudo-random values with heavy ties; two groups of
    // different sizes (one even, one odd N — both rank parities).
    val a = (0 until 101).map(i => "a" -> ((i * 7919L) % 50))
    val b = (0 until 64).map(i => "b" -> ((i * 104729L) % 1000))
    val rows = a ++ b
    val want =
      reference(a.map(_._2)).map { case (q, v) => ("a", q._1, q._2) -> v } ++
        reference(b.map(_._2)).map { case (q, v) => ("b", q._1, q._2) -> v }
    // shift=0 (bucket per value), mid, and wider-than-range (degenerates
    // to one bucket = per-group sort) must all give the exact answer.
    for (shift <- Seq(0, 3, 20)) {
      assert(run(rows, shift) === want, s"shift=$shift")
    }
  }

  test("all mass on one value: every quantile is that value") {
    val rows = (0 until 40).map(_ => "k" -> 7L)
    val out = run(rows, 4)
    assert(out.values.toSet === Set(7L))
    assert(out.size === qs.size)
  }

  test("madOutliers: hand case — median 10, MAD 2, one far outlier at k=3") {
    import spark.implicits._
    // values: 6 8 9 10 10 11 12 13 100 -> n=9, med=10 (rank 5)
    // devs sorted: 0 0 1 1 2 2 3 4 90 -> mad=2 (rank 5); 3*mad=6 -> only 90 flags
    val df = Seq(6L, 8L, 9L, 10L, 10L, 11L, 12L, 13L, 100L)
      .map(("g", _)).toDF("g", "v").repartition(4)
    val r = ExactQuantile.madOutliers(df,
      org.apache.spark.sql.functions.col("g"),
      org.apache.spark.sql.functions.col("v")).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      === ((9L, 10L, 2L, 1L, 90L)))
  }

  test("madOutliers: MAD 0 flags every deviating value, equal values flag none") {
    import spark.implicits._
    // over half identical -> mad = 0; the two deviants flag (d*1 > 0*3)
    val df = (Seq.fill(6)(5L) ++ Seq(4L, 9L)).map(("g", _)).toDF("g", "v")
    val r = ExactQuantile.madOutliers(df,
      org.apache.spark.sql.functions.col("g"),
      org.apache.spark.sql.functions.col("v")).collect().head
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((5L, 0L, 2L)))
    val same = Seq.fill(4)(("h", 7L)).toDF("g", "v")
    val r2 = ExactQuantile.madOutliers(same,
      org.apache.spark.sql.functions.col("g"),
      org.apache.spark.sql.functions.col("v")).collect().head
    assert(r2.getLong(4) === 0L)
  }

  test("madOutliers: histogram and sliver median paths agree") {
    import spark.implicits._
    val rows = (0 until 200).map(i => ("g" + (i % 3), (i * 37 % 97).toLong))
    val df = rows.toDF("g", "v").repartition(4)
    def run(hist: Boolean) = ExactQuantile.madOutliers(df,
      org.apache.spark.sql.functions.col("g"),
      org.apache.spark.sql.functions.col("v"), viaHistogram = hist)
      .orderBy("g").collect().map(_.toString).toSeq
    assert(run(true) === run(false))
  }
}
