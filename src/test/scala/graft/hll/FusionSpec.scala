package graft.hll

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.hll.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[FuseWindowSketchEval]]: the optimizer-rule path injected by
 * GraftSparkExtensions. Fusion must fire exactly when the plan proves the
 * sketch bytes are unobserved, and must never change a value. */
class FusionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-fusion-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftSparkExtensions)
      .getOrCreate()
  }

  private def runningCardinality() = {
    import spark.implicits._
    // user 1 sees values 1,2 then 2,3 (cumulative 2 then 3); user 2 all
    // nulls (cumulative null); user 3 one value.
    val df = Seq[(Long, Int, java.lang.Long)](
      (1L, 1, 1L), (1L, 1, 2L), (1L, 2, 2L), (1L, 2, 3L),
      (2L, 1, null), (3L, 1, 7L))
      .toDF("user", "day", "v")
      .groupBy("user", "day").agg(hll_init_agg(col("v")).as("h"))
    val w = Window.partitionBy("user").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col("user"), col("day"),
      hll_cardinality(hll_merge(col("h")).over(w)).as("cum"))
  }

  test("hll_cardinality over a windowed hll_merge fuses and keeps every value") {
    val fused = runningCardinality()
    val planStr = fused.queryExecution.optimizedPlan.toString
    assert(planStr.contains("hll_merge_cardinality"), s"no fusion in:\n$planStr")
    assert(!planStr.contains("hll_cardinality("), s"scalar eval survived in:\n$planStr")

    val expected = {
      spark.conf.set("spark.graft.fuse.windowSketchEval", "false")
      try {
        val plain = runningCardinality()
        assert(!plain.queryExecution.optimizedPlan.toString.contains("hll_merge_cardinality"))
        plain.collect().map(r => (r.getLong(0), r.getInt(1),
          if (r.isNullAt(2)) null else r.getLong(2))).toSet
      } finally spark.conf.unset("spark.graft.fuse.windowSketchEval")
    }
    val got = fused.collect().map(r => (r.getLong(0), r.getInt(1),
      if (r.isNullAt(2)) null else r.getLong(2))).toSet
    assert(got === expected)
    assert(got === Set((1L, 1, 2L), (1L, 2, 3L), (2L, 1, null), (3L, 1, 1L)))
  }

  test("BOUNDED (sliding) frames fuse too, and old rows fall out of the merge") {
    import spark.implicits._
    // user 1, three days with types a / b / c: a 2-row trailing frame sees
    // {a}, {a,b}, {b,c} — the third day PROVES day-1 fell out (a cumulative
    // frame would report 3).
    val df = Seq((1L, 1, "a"), (1L, 2, "b"), (1L, 3, "c"))
      .toDF("user", "day", "v")
      .groupBy("user", "day").agg(hll_init_agg(col("v")).as("h"))
    val w = Window.partitionBy("user").orderBy("day").rowsBetween(-1, 0)
    val slid = df.select(col("user"), col("day"),
      hll_cardinality(hll_merge(col("h")).over(w)).as("win2"))
    assert(slid.queryExecution.optimizedPlan.toString.contains("hll_merge_cardinality"),
      "bounded frame did not fuse")
    val got = slid.collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    assert(got === Set((1, 1L), (2, 2L), (3, 2L)))
  }

  test("no fusion when the sketch bytes are also observed directly") {
    import spark.implicits._
    val df = Seq((1L, 1, 1L)).toDF("user", "day", "v")
      .groupBy("user", "day").agg(hll_init_agg(col("v")).as("h"))
    val w = Window.partitionBy("user").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val both = df.select(col("user"),
      hll_merge(col("h")).over(w).as("bytes"),
      hll_cardinality(hll_merge(col("h")).over(w)).as("cum"))
    val planStr = both.queryExecution.optimizedPlan.toString
    // The byte-consuming window expression must survive unfused. (The
    // cardinality one is a distinct window expression and may still fuse.)
    assert(planStr.contains("hll_merge("), s"byte-producing merge vanished:\n$planStr")
    val row = both.head()
    assert(row.getAs[Array[Byte]]("bytes") != null)
    assert(row.getAs[Long]("cum") === 1L)
  }

  test("theta_estimate over a windowed theta_union fuses with identical values") {
    import spark.implicits._
    import graft.theta.functions._
    val df = Seq[(Long, Int, java.lang.Long)](
      (1L, 1, 1L), (1L, 1, 2L), (1L, 2, 3L), (2L, 1, null))
      .toDF("user", "day", "v")
      .groupBy("user", "day").agg(theta_init_agg(col("v")).as("h"))
    val w = Window.partitionBy("user").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def query() = df.select(col("user"), col("day"),
      theta_estimate(theta_union(col("h")).over(w)).as("cum"))

    val fused = query()
    val planStr = fused.queryExecution.optimizedPlan.toString
    assert(planStr.contains("theta_union_count"), s"no theta fusion in:\n$planStr")
    val expected = {
      spark.conf.set("spark.graft.fuse.windowSketchEval", "false")
      try query().collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toSet
      finally spark.conf.unset("spark.graft.fuse.windowSketchEval")
    }
    val got = fused.collect().map(r => (r.getLong(0), r.getInt(1),
      if (r.isNullAt(2)) null else r.getLong(2))).toSet
    assert(got === expected)
    assert(got === Set((1L, 1, 2L), (1L, 2, 3L), (2L, 1, null)))
  }

  test("SQL-surface windows fuse too (extensions rule, not a DSL special case)") {
    import spark.implicits._
    Seq((1L, 1, 5L), (1L, 2, 6L)).toDF("user", "day", "v")
      .createOrReplaceTempView("fusion_src")
    val q = spark.sql(
      """SELECT user, day, hll_cardinality(hll_merge(h) OVER (
        |  PARTITION BY user ORDER BY day
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS cum
        |FROM (SELECT user, day, hll_init_agg(v) AS h
        |      FROM fusion_src GROUP BY user, day)""".stripMargin)
    assert(q.queryExecution.optimizedPlan.toString.contains("hll_merge_cardinality"))
    assert(q.orderBy("day").collect().map(_.getLong(2)).toSeq === Seq(1L, 2L))
  }
}
