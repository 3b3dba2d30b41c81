package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sampling-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("deterministic sample keeps the same rows on every evaluation") {
    import spark.implicits._
    val df = (1 to 10000).toDF("id")
    val a = Sampling.deterministicSample(df, col("id"), 1, 5)
      .collect().map(_.getInt(0)).toSet
    val b = Sampling.deterministicSample(df, col("id"), 1, 5)
      .collect().map(_.getInt(0)).toSet
    assert(a === b)
    // ~20% with hash-uniform deviation
    assert(math.abs(a.size - 2000) < 200, s"kept ${a.size}")
  }

  test("nested fractions nest: a 10% sample is a subset of a 20% sample") {
    import spark.implicits._
    val df = (1 to 5000).toDF("id")
    val small = Sampling.deterministicSample(df, col("id"), 1, 10)
      .collect().map(_.getInt(0)).toSet
    val large = Sampling.deterministicSample(df, col("id"), 2, 10)
      .collect().map(_.getInt(0)).toSet
    assert(small.subsetOf(large))
  }

  test("splitColumn partitions every row into exactly one split with ~right sizes") {
    import spark.implicits._
    val df = (1 to 10000).toDF("id")
    val counts = df.select(Sampling.splitColumn(col("id"),
        Seq("train" -> 8L, "val" -> 1L, "test" -> 1L), 10L).as("split"))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 10000L)
    assert(math.abs(counts("train") - 8000) < 300, counts.toString)
    assert(math.abs(counts("val") - 1000) < 150, counts.toString)
    assert(math.abs(counts("test") - 1000) < 150, counts.toString)
  }

  test("split membership is consistent with deterministicSample thresholds") {
    import spark.implicits._
    val df = (1 to 2000).toDF("id")
    // The train split (first 8/10) is exactly the 8/10 deterministic sample.
    val trainViaSplit = df.select(col("id"), Sampling.splitColumn(col("id"),
        Seq("train" -> 8L, "rest" -> 2L), 10L).as("s"))
      .filter(col("s") === "train").collect().map(_.getInt(0)).toSet
    val trainViaSample = Sampling.deterministicSample(df, col("id"), 8, 10)
      .collect().map(_.getInt(0)).toSet
    assert(trainViaSplit === trainViaSample)
  }

  test("the full fraction num == den keeps every row") {
    import spark.implicits._
    val df = (1 to 1000).toDF("id")
    assert(Sampling.deterministicSample(df, col("id"), 5, 5).count() === 1000L)
    assert(Sampling.deterministicSample(df, col("id"), 1, 1).count() === 1000L)
    assert(Sampling.deterministicSample(df, col("id"), 0, 5).count() === 0L)
  }

  test("fractions must sum to the denominator") {
    val e = intercept[IllegalArgumentException] {
      Sampling.splitColumn(col("id"), Seq("a" -> 5L, "b" -> 4L), 10L)
    }
    assert(e.getMessage.contains("must sum"))
  }
}
