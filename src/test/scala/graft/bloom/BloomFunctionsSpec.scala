package graft.bloom

import graft.bloom.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bloom-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("no false negatives: every inserted item queries true, across shuffles") {
    import spark.implicits._
    val items = (0 until 5000).map(i => s"item$i")
    val filterBytes = items.toDF("v").repartition(4)
      .agg(bloom_init_agg(col("v"), 8192L, 10000L).as("bf"))
      .head().getAs[Array[Byte]](0)
    val bf = lit(filterBytes)
    val misses = items.toDF("v")
      .filter(!bloom_might_contain(bf, col("v"))).count()
    assert(misses === 0L)
  }

  test("false-positive rate stays near the configured fpp") {
    import spark.implicits._
    val filterBytes = (0 until 10000).map(i => s"in$i").toDF("v")
      .agg(bloom_init_agg(col("v"), 16384L, 10000L).as("bf"))
      .head().getAs[Array[Byte]](0)
    val fps = (0 until 10000).map(i => s"out$i").toDF("v")
      .filter(bloom_might_contain(lit(filterBytes), col("v"))).count()
    // Configured 1%; allow generous slack for hash variance.
    assert(fps < 400L, s"fp count $fps way above the 1% design point")
  }

  test("merge of per-group filters equals direct aggregation") {
    import spark.implicits._
    val df = (0 until 4000).map(i => (i % 8, s"v${i % 500}")).toDF("g", "v")
    val direct = df.agg(bloom_init_agg(col("v"), 1024L, 10000L).as("bf"))
      .head().getAs[Array[Byte]](0)
    val merged = df.groupBy("g").agg(bloom_init_agg(col("v"), 1024L, 10000L).as("bf"))
      .agg(bloom_merge(col("bf"), 1024L, 10000L).as("bf"))
      .head().getAs[Array[Byte]](0)
    // Same geometry + same seed -> union is bit-identical to direct build.
    assert(java.util.Arrays.equals(direct, merged))
  }

  test("fill fraction gauges saturation; nulls skipped; all-null group is null") {
    import spark.implicits._
    val low = Seq("a", "b").toDF("v")
      .agg(bloom_fill_fraction(bloom_init_agg(col("v"), 4096L, 10000L))).head().getDouble(0)
    assert(low > 0.0 && low < 0.01)
    val mixed = Seq(Some("a"), None, Some("b")).toDF("v")
      .agg(bloom_fill_fraction(bloom_init_agg(col("v"), 4096L, 10000L))).head().getDouble(0)
    assert(mixed === low)
    val allNull = Seq[Option[String]](None, None).toDF("v")
      .agg(bloom_init_agg(col("v")).as("bf")).head().get(0)
    assert(allNull == null)
  }

  test("filters are reproducible run to run (fixed seed, fixed geometry)") {
    import spark.implicits._
    def build() = (0 until 1000).map(i => s"x$i").toDF("v").repartition(3)
      .agg(bloom_init_agg(col("v"), 2048L, 10000L)).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(build(), build()))
  }

  test("SQL registration installs the bloom family") {
    BloomFunctionRegistry.registerFunctions(spark)
    spark.range(100).createOrReplaceTempView("bloom_sql_in")
    val row = spark.sql(
      """SELECT bloom_might_contain(bf, '7') AS hit,
        |       bloom_might_contain(bf, 'nope') OR NOT bloom_might_contain(bf, '8') AS probably_false,
        |       bloom_fill_fraction(bf) > 0 AS filled
        |FROM (SELECT bloom_init_agg(CAST(id AS STRING), 1024L, 10000L) AS bf
        |      FROM bloom_sql_in)""".stripMargin).head()
    assert(row.getBoolean(0))
    assert(row.getBoolean(2))
  }
}
