package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-profile-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("profile computes row/null/distinct/min/max/total_len per column") {
    import spark.implicits._
    val df = Seq(
      (Some("b"), Some(10)),
      (Some("a"), None),
      (Some("a"), Some(7)),
      (None, Some(10))).toDF("s", "n")
    val out = Profile.profile(df, Seq(
      "n" -> col("n"),
      "s" -> col("s")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5), r.getLong(6)))
      .toMap
    // s: 4 rows, 1 null, 2 distinct ("a","b"), min "a", max "b", len 3.
    assert(out("s") === ((4L, 1L, 2L, "a", "b", 3L)))
    // n: 4 rows, 1 null, 2 distinct ("10","7"), lexicographic min "10"
    // max "7" (string domain — the caller chose the normalization), and
    // total_len counts the duplicate "10" twice: 2+2+1 = 5.
    assert(out("n") === ((4L, 1L, 2L, "10", "7", 5L)))
  }

  test("profile plan cascades two hash aggregates, never the countDistinct Expand") {
    import spark.implicits._
    val df = Seq(("a", 1), ("b", 2)).toDF("s", "n")
    val plan = Profile.profile(df, Seq("s" -> col("s"), "n" -> col("n")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      "distinct counting must collapse duplicates map-side, not expand the scan")
  }
}
