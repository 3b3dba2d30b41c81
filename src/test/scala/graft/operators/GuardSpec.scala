package graft.operators

import graft.operators.Guard.{Check, GuardViolation}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GuardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-guard-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("audit reports every check with exact values and pass booleans") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (2L, null)).toDF("id", "v")
    val got = Guard.audit(df, Seq(
      Check("n_rows", count(lit(1)), lo = 3L, hi = 3L),
      Check("null_v", sum(when(col("v").isNull, 1L).otherwise(0L)), hi = 0L),
      Check("dup_ids", count(lit(1)) - countDistinct(col("id")), hi = 0L)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(4)))).toMap
    assert(got("n_rows") === ((3L, true)))
    assert(got("null_v") === ((1L, false)))
    assert(got("dup_ids") === ((1L, false)))
  }

  test("observedRun passes through on clean data and rides the action's own job") {
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
    val n = Guard.observedRun(df, Seq(
      Check("n_rows", count(lit(1)), lo = 2L, hi = 2L),
      Check("v_sum", sum(col("v")), lo = 30L, hi = 30L)))(_.count())
    assert(n === 2L)
  }

  test("observedRun throws GuardViolation listing every failed check") {
    import spark.implicits._
    val df = Seq((1L, 10L), (1L, 200L)).toDF("id", "v")
    val e = intercept[GuardViolation] {
      // No DISTINCT aggregates here: observe() rejects them (documented
      // on observedRun — uniqueness checks belong in audit()).
      Guard.observedRun(df, Seq(
        Check("v_min", min(col("v")), lo = 50L),
        Check("v_max", max(col("v")), hi = 100L),
        Check("n_rows", count(lit(1)), lo = 1L)))(_.count())
    }
    assert(e.failed.toMap === Map("v_min" -> 10L, "v_max" -> 200L))
    assert(e.getMessage.contains("v_max=200 not in"))
  }
}
