package graft.theta

import graft.theta.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ThetaFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-theta-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("set algebra on sketches is exact in exact mode") {
    import spark.implicits._
    // A = {0..599}, B = {300..899}: |A|=600 |B|=600 |A∩B|=300 |A\B|=300.
    val df = (0 until 900).map(i => (if (i < 600) 1 else 0, if (i >= 300) 1 else 0, i))
      .toDF("in_a", "in_b", "v")
    val row = df.agg(
      theta_init_agg(when(col("in_a") === 1, col("v"))).as("a"),
      theta_init_agg(when(col("in_b") === 1, col("v"))).as("b"))
      .select(
        theta_estimate(col("a")).as("na"),
        theta_estimate(col("b")).as("nb"),
        theta_estimate(theta_intersect(col("a"), col("b"))).as("nboth"),
        theta_estimate(theta_a_not_b(col("a"), col("b"))).as("nonly_a"))
      .head()
    assert(row.toSeq === Seq(600L, 600L, 300L, 300L))
  }

  test("sketches union across groups and shuffle boundaries, then compose") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i % 10, i)).toDF("g", "v").repartition(4)
    val union = df.groupBy("g").agg(theta_init_agg(col("v")).as("sk"))
      .agg(graft.theta.functions.theta_union(col("sk")).as("all"))
      .select(theta_estimate(col("all"))).head().getLong(0)
    assert(union === 1000L)
  }

  test("duplicate values and typed hashing match the HLL semantics matrix") {
    import spark.implicits._
    // Same value in different types counts separately (type-tagged hash).
    val longs = (1 to 100).map(_.toLong % 5).toDF("v")
      .agg(theta_estimate(theta_init_agg(col("v")))).head().getLong(0)
    assert(longs === 5L)
    val strs = (1 to 100).map(i => (i % 5).toString).toDF("v")
      .agg(theta_estimate(theta_init_agg(col("v")))).head().getLong(0)
    assert(strs === 5L)
  }

  test("all-null group yields a null sketch") {
    import spark.implicits._
    val out = Seq[Option[Long]](None, None).toDF("v")
      .agg(theta_init_agg(col("v")).as("sk")).head().get(0)
    assert(out == null)
  }

  test("SQL registration: full set-algebra pipeline in SparkSQL") {
    ThetaFunctionRegistry.registerFunctions(spark)
    val row = spark.sql(
      """SELECT theta_estimate(theta_intersect(a, b)) AS nboth,
        |       theta_estimate(theta_a_not_b(a, b)) AS nonly
        |FROM (SELECT
        |  theta_init_agg(CASE WHEN id < 60 THEN id END, 12) AS a,
        |  theta_init_agg(CASE WHEN id >= 30 THEN id END, 12) AS b
        |FROM range(90))""".stripMargin).head()
    assert(row.getLong(0) === 30L)
    assert(row.getLong(1) === 30L)
  }
}
