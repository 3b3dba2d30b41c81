package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PrivacySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-privacy-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // QI groups: (a,x) size 1, (a,y) size 2, (b,x) size 4, (b,y) size 8.
  private def df = {
    import spark.implicits._
    (Seq.fill(1)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq.fill(4)(("b", "x")) ++ Seq.fill(8)(("b", "y")))
      .toDF("q1", "q2").repartition(4)
  }

  test("per-threshold linkable rows and groups are the hand counts") {
    val out = Privacy.kAnonymityAudit(df, Seq(col("q1"), col("q2")), Seq(2, 3, 5, 100))
      .orderBy("k").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out === Array(
      (2, 1L, 1L, 1L, 4L),    // only the size-1 group is below 2
      (3, 3L, 2L, 1L, 4L),    // sizes 1 + 2
      (5, 7L, 3L, 1L, 4L),    // sizes 1 + 2 + 4
      (100, 15L, 4L, 1L, 4L)))// everything
  }

  test("a fully k-anonymous corpus reports zero at its achieved k") {
    import spark.implicits._
    val safe = Seq.fill(5)("g1").map(g => (g, 1)) ++ Seq.fill(5)("g2").map(g => (g, 1))
    val out = Privacy.kAnonymityAudit(safe.toDF("g", "v"), Seq(col("g")), Seq(5))
      .collect().head
    assert(out.getLong(1) === 0L && out.getLong(2) === 0L)
    assert(out.getLong(3) === 5L) // min group size = the achieved k
  }

  test("threshold below 1 and empty QI are rejected") {
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityAudit(df, Seq(col("q1")), Seq(0))
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityAudit(df, Seq.empty, Seq(2))
    }
  }
}
