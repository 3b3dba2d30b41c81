package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class AsOfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-asof-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("joinPrior picks the latest right row at or before each left row, per key") {
    import spark.implicits._
    val left = Seq(
      (100L, 1L, ts(10)), // after clicks 1,2 -> latest is 2
      (101L, 1L, ts(3)),  // after click 1 only
      (102L, 1L, ts(1)),  // before everything -> null
      (103L, 2L, ts(30)), // other key: sees only its own clicks
      (104L, 3L, ts(30))  // key with no right rows at all -> null
    ).toDF("purchase_id", "user_id", "ts")
    val right = Seq(
      (1L, 1L, ts(2)),
      (2L, 1L, ts(5)),
      (3L, 2L, ts(4)),
      (4L, 9L, ts(1))
    ).toDF("event_id", "user_id", "ts")

    val out = AsOf.joinPrior(left, right, Seq("user_id"), "ts", "ts",
      col("event_id"), "click")
      .select(col("purchase_id"), col("asof_click"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(out === Map(
      100L -> Some(2L), 101L -> Some(1L), 102L -> None,
      103L -> Some(3L), 104L -> None))
  }

  test("a right row at exactly the left timestamp counts; equal-ts ties take the max payload") {
    import spark.implicits._
    val left = Seq((200L, 1L, ts(5))).toDF("purchase_id", "user_id", "ts")
    val right = Seq(
      (7L, 1L, ts(5)), // exactly at the purchase ts
      (9L, 1L, ts(5)), // tie: larger id wins
      (1L, 1L, ts(4))
    ).toDF("event_id", "user_id", "ts")
    val out = AsOf.joinPrior(left, right, Seq("user_id"), "ts", "ts",
      col("event_id"), "click")
      .select(col("asof_click")).head().getLong(0)
    assert(out === 9L)
  }

  test("plans a single shuffle on the key, no range join explosion") {
    import spark.implicits._
    val left = (1 to 100).map(i => (i.toLong, i.toLong % 5, ts(i % 50))).toDF("id", "k", "ts")
    val right = (1 to 100).map(i => (i.toLong, i.toLong % 5, ts(i % 40))).toDF("rid", "k", "ts")
    val out = AsOf.joinPrior(left, right, Seq("k"), "ts", "ts", col("rid"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      "as-of join exploded into a product")
    assert(plan.contains("Window"), "expected a window-based plan")
  }
}
