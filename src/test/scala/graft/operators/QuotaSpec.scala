package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuotaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-quota-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def keyedDf(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("k", "id").repartition(4)
  }

  test("caps every key at n and the result is deterministic") {
    val rows = (0L until 200L).map(i => (s"k${i % 5}", i))
    val out = Quota.quotaCap(keyedDf(rows), col("k"), col("id"), n = 7)
    val byKey = out.groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey.values.toSet === Set(7L))
    val again = Quota.quotaCap(keyedDf(rows), col("k"), col("id"), n = 7)
    assert(out.orderBy("k", "id").collect().toSeq === again.orderBy("k", "id").collect().toSeq)
  }

  test("keys with fewer than n rows keep all rows") {
    val rows = Seq(("a", 1L), ("a", 2L), ("b", 3L))
    val out = Quota.quotaCap(keyedDf(rows), col("k"), col("id"), n = 10)
    assert(out.count() === 3L)
  }

  test("two-phase salted plan selects exactly the single-window survivors, hot key included") {
    // One mega-key (1000 rows) + normal keys: the salted pre-cap must not
    // change WHICH rows survive, only how the work distributes.
    val rows = (0L until 1000L).map(i => ("hot", i)) ++ (1000L until 1040L).map(i => (s"k${i % 4}", i))
    val salted = Quota.quotaCap(keyedDf(rows), col("k"), col("id"), n = 9, salts = 16)
      .orderBy("k", "id").collect().toSeq
    val single = Quota.quotaCap(keyedDf(rows), col("k"), col("id"), n = 9, salts = 1)
      .orderBy("k", "id").collect().toSeq
    assert(salted === single)
    assert(salted.count(_.getString(0) == "hot") === 9)
  }

  test("survivors are the first n by (md5(id), id) — engine-neutral order") {
    import spark.implicits._
    val rows = (0L until 50L).map(i => ("only", i))
    val got = Quota.quotaCap(keyedDf(rows), col("k"), col("id"), n = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    val want = rows.map(_._2).toDF("id")
      .select(col("id"), md5(col("id").cast("string")).as("h"))
      .orderBy("h", "id").limit(5).collect().map(_.getLong(0)).toSet
    assert(got === want)
  }
}
