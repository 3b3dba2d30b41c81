package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class RangeJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-rangejoin-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  private def frames(ls: Seq[(Long, Long)], rs: Seq[(Long, Long)]) = {
    import spark.implicits._
    (ls.map { case (id, s) => (id, ts(s)) }.toDF("l_id", "l_ts").repartition(3),
      rs.map { case (id, s) => (id, ts(s)) }.toDF("r_id", "r_ts").repartition(3))
  }

  test("banded join equals the naive range join, pairs emitted exactly once") {
    val ls = (0L until 50L).map(i => (i, i * 37L % 1000))
    val rs = (100L until 180L).map(i => (i, i * 53L % 1000))
    val (l, r) = frames(ls, rs)
    val banded = RangeJoin.joinWithin(l, r, "l_ts", "r_ts", 60L)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    val naive = for {
      (li, lt) <- ls; (ri, rt) <- rs
      if rt >= lt && rt < lt + 60L
    } yield (li, ri)
    assert(banded.sorted.toSeq === naive.sorted)
    assert(banded.length === banded.distinct.length, "duplicate pairs emitted")
    assert(naive.nonEmpty)
  }

  test("window boundaries: start inclusive, end exclusive, band-crossing found") {
    // Left at t=59: window [59, 119). Rights at 58 (out), 59 (in, same
    // band), 60 (in, next band — crosses the 60s band edge), 118 (in),
    // 119 (out, exclusive end).
    val (l, r) = frames(Seq((1L, 59L)), Seq((10L, 58L), (11L, 59L), (12L, 60L), (13L, 118L), (14L, 119L)))
    val got = RangeJoin.joinWithin(l, r, "l_ts", "r_ts", 60L)
      .select("r_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(11L, 12L, 13L))
  }

  test("plans as a hash equi-join on the band, never a nested loop") {
    val (l, r) = frames(Seq((1L, 0L)), Seq((2L, 1L)))
    val plan = RangeJoin.joinWithin(l, r, "l_ts", "r_ts", 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
  }
}
