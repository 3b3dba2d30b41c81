package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FeaturesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-features-test")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(daysBeforeHorizon: Long): java.sql.Timestamp =
    new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2026-06-30 00:00:00").getTime -
        daysBeforeHorizon * 86400000L)

  test("half-life weights are exact bit shifts by week of age") {
    import spark.implicits._
    // user 1: one event AT the horizon (w=0 -> 2^3), one 8 days old
    //   (w=1 -> 2^2), one 22 days old (w=3 -> 2^0).
    // user 2: one event 30 days old (w=4 > maxWeeks=3 -> excluded).
    val df = Seq(
      (1L, ts(0)), (1L, ts(8)), (1L, ts(22)),
      (2L, ts(30)), (2L, ts(1))).toDF("u", "t")
    val out = Features.halfLifeEngagement(df, col("u"), col("t"), maxWeeks = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((3L, 8L + 4L + 1L)))
    assert(out(2L) === ((1L, 8L))) // only the fresh event counts
  }

  test("a key with only out-of-horizon events reports zeros, not absence") {
    import spark.implicits._
    // key 1's fresh event sets the corpus horizon; key 9's only event is
    // 100 days older than it — outside maxWeeks = 2.
    val df = Seq((1L, ts(0)), (9L, ts(100))).toDF("u", "t")
    val out = Features.halfLifeEngagement(df, col("u"), col("t"), maxWeeks = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(9L) === ((0L, 0L)))
    assert(out(1L) === ((1L, 4L)))
  }

  test("maxWeeks bounds are enforced") {
    import spark.implicits._
    val df = Seq((1L, ts(0))).toDF("u", "t")
    intercept[IllegalArgumentException] {
      Features.halfLifeEngagement(df, col("u"), col("t"), maxWeeks = 61)
    }
  }
}
