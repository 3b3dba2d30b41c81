package graft.freq

import graft.freq.functions._
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FreqFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-freq-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def items(rows: Seq[Row]): Seq[(String, Long)] =
    rows.map(r => (r.getString(0), r.getLong(1)))

  test("counts are exact while the map never purges, across shuffles") {
    import spark.implicits._
    // Zipf-ish: item i appears 200/i times, i in 1..20 → 20 distinct << map.
    val data = (1 to 20).flatMap(i => Seq.fill(200 / i)(s"item$i"))
    val df = data.toDF("v").repartition(4)
    val out = df.agg(freq_init_agg(col("v"), 64).as("sk"))
      .select(
        freq_max_error(col("sk")).as("err"),
        freq_stream_length(col("sk")).as("n"),
        freq_items(col("sk"), 50L).as("hh"),
        freq_estimate(col("sk"), lit("item7")).as("e7"),
        freq_estimate(col("sk"), lit("missing")).as("e0"))
      .head()
    assert(out.getLong(0) === 0L)
    assert(out.getLong(1) === data.size.toLong)
    // est >= 50 ⇔ 200/i >= 50 ⇔ i <= 4; ordered cnt desc, item asc.
    assert(items(out.getSeq[Row](2)) ===
      Seq(("item1", 200L), ("item2", 100L), ("item3", 66L), ("item4", 50L)))
    assert(out.getLong(3) === 200L / 7)
    assert(out.getLong(4) === 0L)
  }

  test("support-threshold form matches the exact relative-frequency filter") {
    import spark.implicits._
    val data = (1 to 20).flatMap(i => Seq.fill(i * 10)(s"w$i")) // N = 2100
    val hh = data.toDF("v").repartition(3)
      .agg(freq_init_agg(col("v"), 256).as("sk"))
      // 60000 ppm of 2100 = 126 → ceil threshold 126 → i*10 >= 126 ⇔ i >= 13.
      .select(freq_items_by_support(col("sk"), 60000L).as("hh"))
      .head().getSeq[Row](0)
    assert(items(hh) === (20 to 13 by -1).map(i => (s"w$i", i * 10L)))
  }

  test("merge of stored sketches equals direct aggregation (store -> reload path)") {
    import spark.implicits._
    val df = (0 until 3000).map(i => (i % 4, s"t${i % 30}")).toDF("g", "v")
    val direct = df.agg(freq_init_agg(col("v"), 128).as("sk"))
      .select(freq_items(col("sk"), 100L)).head().getSeq[Row](0)
    val merged = df.groupBy("g").agg(freq_init_agg(col("v"), 128).as("sk"))
      .agg(freq_merge(col("sk"), 128).as("sk"))
      .select(freq_items(col("sk"), 100L)).head().getSeq[Row](0)
    assert(items(merged) === items(direct))
    assert(items(direct).nonEmpty)
  }

  test("approximate mode: bounded error, no heavy hitter missed") {
    import spark.implicits._
    // 5000 distinct singletons overflow a 64-slot map; two true heavy
    // hitters at 800 and 400 occurrences tower over the error bound.
    val data = Seq.fill(800)("big") ++ Seq.fill(400)("mid") ++
      (0 until 5000).map(i => s"noise$i")
    val out = data.toDF("v").repartition(4)
      .agg(freq_init_agg(col("v"), 64).as("sk"))
      .select(freq_max_error(col("sk")).as("err"),
        freq_items(col("sk"), 300L).as("hh"))
      .head()
    val err = out.getLong(0)
    assert(err > 0L, "map must have purged")
    val got = items(out.getSeq[Row](1)).toMap
    // NO_FALSE_NEGATIVES: both true hitters present, estimates within err.
    assert(math.abs(got("big") - 800L) <= err)
    assert(math.abs(got("mid") - 400L) <= err)
    // Estimates only ever overcount (Misra-Gries offset is additive).
    assert(got.values.forall(_ >= 300L))
  }

  test("nulls are skipped; an all-null group yields a null sketch") {
    import spark.implicits._
    val mixed = Seq(Some("a"), None, Some("a"), Some("b"), None)
      .toDF("v").agg(freq_init_agg(col("v"), 16).as("sk"))
      .select(freq_stream_length(col("sk")), freq_items(col("sk"), 2L)).head()
    assert(mixed.getLong(0) === 3L)
    assert(items(mixed.getSeq[Row](1)) === Seq(("a", 2L)))
    val allNull = Seq[Option[String]](None, None).toDF("v")
      .agg(freq_init_agg(col("v")).as("sk")).head().get(0)
    assert(allNull == null)
  }

  test("maxMapSize is validated at analysis time") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq("x").toDF("v").agg(freq_init_agg(col("v"), 100)).collect()
    }
    assert(e.getMessage.contains("power of 2"))
  }

  test("sketches survive the parquet store -> reload -> re-merge round trip") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("freq_roundtrip").toString
    val df = (0 until 4000).map(i => (i % 8, s"g${i % 40}")).toDF("g", "v")
    df.groupBy("g").agg(freq_init_agg(col("v"), 128).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
      .agg(freq_merge(col("sk"), 128).as("sk"))
      .select(freq_items(col("sk"), 1L)).head().getSeq[Row](0)
    val direct = df.agg(freq_init_agg(col("v"), 128).as("sk"))
      .select(freq_items(col("sk"), 1L)).head().getSeq[Row](0)
    assert(items(reloaded) === items(direct))
    assert(items(direct).size === 40)
  }

  test("freq aggregates work inside window specs (running heavy hitters)") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val w = Window.partitionBy("g").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val df = Seq((0, 1, "a"), (0, 2, "a"), (0, 3, "b"), (1, 1, "c"))
      .toDF("g", "ord", "v")
    val out = df
      .withColumn("sk", freq_init_agg(col("v"), 16).over(w))
      .select(col("g"), col("ord"), freq_estimate(col("sk"), lit("a")).as("a_n"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out((0, 1)) === 1L)
    assert(out((0, 2)) === 2L)
    assert(out((0, 3)) === 2L)
    assert(out((1, 1)) === 0L)
  }

  test("SQL registration: registerFunctions installs the freq family") {
    FreqFunctionRegistry.registerFunctions(spark)
    spark.range(300).createOrReplaceTempView("freq_sql_in")
    val row = spark.sql(
      """SELECT freq_max_error(sk) AS err,
        |       freq_stream_length(sk) AS n,
        |       freq_estimate(sk, '1') AS e1,
        |       freq_items_by_support(sk, 300000L) AS hh
        |FROM (SELECT freq_init_agg(CAST(id % 3 AS STRING), 64) AS sk
        |      FROM freq_sql_in)""".stripMargin).head()
    assert(row.getLong(0) === 0L)
    assert(row.getLong(1) === 300L)
    assert(row.getLong(2) === 100L)
    assert(items(row.getSeq[Row](3)) === Seq(("0", 100L), ("1", 100L), ("2", 100L)))
  }
}
