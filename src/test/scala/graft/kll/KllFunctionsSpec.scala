package graft.kll

import graft.kll.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KllFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-kll-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** quantile_disc reference: smallest value with cumulative weight >= q*n. */
  private def disc(sorted: Seq[Double], q: Double): Double =
    sorted(math.max(0, math.ceil(q * sorted.size).toInt - 1))

  test("exact mode matches quantile_disc semantics for every quantile") {
    import spark.implicits._
    val values = scala.util.Random.shuffle((1 to 1000).map(_.toDouble)).toList
    val df = values.toDF("v")
    val sk = df.agg(kll_init_agg(col("v"), 2048).as("sk"))
    val sorted = values.sorted
    for (q <- Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)) {
      val got = sk.select(kll_quantile(col("sk"), q)).head().getDouble(0)
      assert(got === disc(sorted, q), s"q=$q")
    }
  }

  test("sketches merge across groups and shuffles; exact when capacity allows") {
    import spark.implicits._
    val values = (1 to 2000).map(_.toDouble)
    val df = values.zipWithIndex.map { case (v, i) => (i % 7, v) }.toDF("g", "v")
      .repartition(4)
    val merged = df.groupBy("g").agg(kll_init_agg(col("v"), 4096).as("sk"))
      .agg(kll_merge(col("sk"), 4096).as("m"))
    assert(merged.select(kll_n(col("m"))).head().getLong(0) === 2000L)
    val p50 = merged.select(kll_quantile(col("m"), 0.5)).head().getDouble(0)
    assert(p50 === disc(values.sorted, 0.5))
  }

  test("approximate mode (k=200) stays within the documented rank error") {
    import spark.implicits._
    val n = 50000
    val df = (1 to n).map(_.toDouble).toDF("v")
    val sk = df.agg(kll_init_agg(col("v"), 200).as("sk"))
    val p50 = sk.select(kll_quantile(col("sk"), 0.5)).head().getDouble(0)
    // rank error epsilon ~ 1.65/k ≈ 0.008; allow 3x
    assert(math.abs(p50 / n - 0.5) < 0.025, s"p50=$p50")
  }

  test("rank is the inverse of quantile in exact mode") {
    import spark.implicits._
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val sk = df.agg(kll_init_agg(col("v"), 256).as("sk"))
    assert(sk.select(kll_rank(col("sk"), 50.0)).head().getDouble(0) === 0.5)
    assert(sk.select(kll_rank(col("sk"), 100.0)).head().getDouble(0) === 1.0)
  }

  test("null and empty-group semantics") {
    import spark.implicits._
    val df = Seq[(Int, Option[Double])]((1, Some(1.0)), (1, None), (2, None)).toDF("g", "v")
    val out = df.groupBy("g").agg(kll_init_agg(col("v")).as("sk"))
      .select(col("g"), col("sk")).collect().map(r => r.getInt(0) -> r.get(1)).toMap
    assert(out(1) != null) // nulls skipped, one real value
    assert(out(2) == null) // all-null group -> null sketch
  }

  test("SQL registration: full pipeline parses and runs") {
    KllFunctionRegistry.registerFunctions(spark)
    val row = spark.sql(
      """SELECT kll_n(m) AS n, kll_quantile(m, 0.5) AS p50, kll_rank(m, 250.0) AS r
        |FROM (SELECT kll_merge(sk, 1024) AS m FROM (
        |  SELECT kll_init_agg(CAST(id AS DOUBLE), 1024) AS sk
        |  FROM range(1, 501) GROUP BY id % 4))""".stripMargin).head()
    assert(row.getLong(0) === 500L)
    assert(row.getDouble(1) === 250.0)
    assert(row.getDouble(2) === 0.5)
  }

  test("integer input casts implicitly to double") {
    import spark.implicits._
    val sk = (1 to 9).toDF("v").agg(kll_init_agg(col("v"), 64).as("sk"))
    assert(sk.select(kll_quantile(col("sk"), 0.5)).head().getDouble(0) === 5.0)
  }

  test("cdf and pmf are exact count fractions in exact mode") {
    import spark.implicits._
    val sk = (1 to 100).map(_.toDouble).toDF("v")
      .agg(kll_init_agg(col("v"), 256).as("sk"))
    val cdf = sk.select(kll_cdf(col("sk"), Seq(10.0, 50.0, 90.0)))
      .head().getSeq[Double](0)
    assert(cdf === Seq(0.10, 0.50, 0.90, 1.0))
    // PMF masses are differences of rank fractions — exact counts, but
    // ±ulp float error (the scaladoc points bit-exact users at kll_cdf).
    val pmf = sk.select(kll_pmf(col("sk"), Seq(10.0, 50.0, 90.0)))
      .head().getSeq[Double](0)
    Seq(0.10, 0.40, 0.40, 0.10).zip(pmf).foreach { case (want, got) =>
      assert(math.abs(want - got) < 1e-12)
    }
    // Empty sketch -> null, matching the quantile/rank convention.
    val empty = Seq[Option[Double]](None).toDF("v")
      .agg(kll_init_agg(col("v")).as("sk"))
      .select(kll_cdf(col("sk"), Seq(1.0))).head().get(0)
    assert(empty == null)
  }
}
