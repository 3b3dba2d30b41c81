package graft.hll

import com.clearspring.analytics.stream.cardinality.HyperLogLogPlus
import graft.hll.functions._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions.{array, col, lit, map}
import org.apache.spark.sql.types.{ArrayType, IntegerType}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

object HllFunctionsSpec {
  case class Row5(c1: Int, c2: String, c3: Array[Int], c4: Map[String, String], c5: Array[String])
  object Row5 {
    def apply(c1: Int, c2: String): Row5 = Row5(c1, c2, null, null, null)
  }
  case class Row3(c1: String, c2: String, c3: String)
}

/** Operator semantics across all three wire formats. Expected cardinality
 * vectors are ported from the reference's test oracle
 * (reference: HLLFunctionsTest.scala:92-155, 263-281, 296-337 — exact small
 * integers because HLL is exact at tiny cardinalities). */
class HllFunctionsSpec extends AnyFunSuite with graft.testutil.OpenStreamLeakCheck {

  import HllFunctionsSpec._

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-hll-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def withFormatConf(name: Option[String])(body: => Unit): Unit = {
    name match {
      case Some(n) => spark.conf.set(HllFormat.ConfKey, n)
      case None => spark.conf.unset(HllFormat.ConfKey)
    }
    try body finally spark.conf.unset(HllFormat.ConfKey)
  }

  private def mergeAll(df: DataFrame): DataFrame =
    df.select(df.columns.zipWithIndex.map { case (name, i) =>
      hll_merge(col(name)).as(s"m$i")
    }.toIndexedSeq: _*)

  private def cardinalitiesOf(df: DataFrame): Seq[Long] =
    df.select(df.columns.zipWithIndex.map { case (name, i) =>
      hll_cardinality(col(name)).as(s"k$i")
    }.toIndexedSeq: _*).head().toSeq.map(v => if (v == null) -1L else v.asInstanceOf[Long])

  private def fixture(): DataFrame = {
    import spark.implicits._
    spark.createDataset(Seq(
      Row5(1, "a", Array(1, 2, 3), Map("a" -> "A"), Array.empty),
      Row5(2, "b", Array(2, 3, 1), Map("b" -> "B"), Array(null)),
      Row5(2, "b", Array(2, 3, 1), Map("b" -> "B"), Array(null, null)),
      Row5(3, "c", Array(3, 1, 2), Map("a" -> "A", "b" -> "B"), null),
      Row5(2, "b", Array(1, 1, 1), Map("b" -> "B", "c" -> "C"), null),
      Row5(3, "c", Array(2, 2, 2), Map("c" -> "C", "a" -> null), null),
      Row5(4, "d", null, null, null),
      Row5(4, "d", null, null, null),
      Row5(5, "e", Array.empty, Map.empty, null),
      Row5(5, "e", Array.empty, Map.empty, null)
    )).toDF()
  }

  // Expected vector for the 10-row fixture (reference: HLLFunctionsTest.scala:145-154):
  // 5 unique ints, 5 unique strings, 6 unique arrays-as-atoms, 6 unique
  // maps-as-atoms, 3 unique string-arrays-as-atoms, 3 unique array elements,
  // 4 unique map entries, 0 non-null elements in the string arrays.
  private val expectedVector = Seq(5L, 5L, 6L, 6L, 3L, 3L, 4L, 0L)

  private val formatsUnderTest: Seq[Option[String]] =
    Seq(None, Some("STRM"), Some("DS"), Some("GRAFT"))

  for (conf <- formatsUnderTest) {
    val label = conf.getOrElse("default")

    test(s"[$label] scalar init + merge matches reference cardinality vector") {
      withFormatConf(conf) {
        val df = fixture()
        val result = cardinalitiesOf(mergeAll(df.select(
          hll_init(col("c1")), hll_init(col("c2")), hll_init(col("c3")),
          hll_init(col("c4")), hll_init(col("c5")),
          hll_init_collection(col("c3")), hll_init_collection(col("c4")),
          hll_init_collection(col("c5"))
        )))
        assert(result == expectedVector)
      }
    }

    test(s"[$label] aggregate init matches reference cardinality vector") {
      withFormatConf(conf) {
        val df = fixture()
        val result = cardinalitiesOf(df.select(
          hll_init_agg(col("c1")), hll_init_agg(col("c2")), hll_init_agg(col("c3")),
          hll_init_agg(col("c4")), hll_init_agg(col("c5")),
          hll_init_collection_agg(col("c3")), hll_init_collection_agg(col("c4")),
          hll_init_collection_agg(col("c5"))
        ))
        assert(result == expectedVector)
      }
    }

    test(s"[$label] re-aggregation across a union is exact") {
      withFormatConf(conf) {
        import spark.implicits._
        val sample = spark.createDataset(Seq(
          Row5(1, "a"), Row5(2, "b"), Row5(2, "b"), Row5(3, "c"), Row5(4, "d")
        )).select(hll_init_agg(col("c1")), hll_init_agg(col("c2")))
        val result = cardinalitiesOf(mergeAll(sample union sample))
        assert(result == Seq(4L, 4L))
      }
    }

    test(s"[$label] row merge skips nulls, all-null row yields null") {
      withFormatConf(conf) {
        import spark.implicits._
        val df = spark.createDataset(Seq(
          Row3("a", "a", "a"),
          Row3("a", "b", "c"),
          Row3("a", "b", null),
          Row3("a", null, null),
          Row3(null, null, null)
        ))
        val result = df
          .select(hll_init(col("c1")).as("s1"), hll_init(col("c2")).as("s2"),
            hll_init(col("c3")).as("s3"))
          .select(hll_cardinality(hll_row_merge(col("s1"), col("s2"), col("s3"))))
          .na.fill(-1L)
          .as[Long]
          .collect()
          .toSeq
        assert(result == Seq(1L, 3L, 2L, 1L, -1L))
      }
    }

    test(s"[$label] scalar init edge values: nulls, empty string, arrays as atoms vs collections") {
      withFormatConf(conf) {
        val a123 = array(lit(1), lit(2), lit(3))
        val simple = Seq(
          lit(null).cast(IntegerType),
          lit(""),
          a123
        ).map(c => hll_init(c))
        val collections = Seq(
          lit(null).cast(ArrayType(IntegerType)),
          array(),
          map(),
          a123
        ).map(c => hll_init_collection(c))
        val result = cardinalitiesOf(spark.range(1).select((simple ++ collections): _*))
        assert(result == Seq(-1L, 1L, 1L, -1L, 0L, 0L, 3L))
      }
    }

    test(s"[$label] intersection: overlap, disjoint, and null handling") {
      withFormatConf(conf) {
        import spark.implicits._
        val df = spark.createDataset(Seq(
          Row3("a", "e", "f"), Row3("b", "d", "g"), Row3("c", "c", "h"),
          Row3("d", "b", "i"), Row3("e", "a", "j")
        ))
        val sketches = df.select(
          hll_init_agg(col("c1")).as("s1"),
          hll_init_agg(col("c2")).as("s2"),
          hll_init_agg(col("c3")).as("s3"))
        val Array(full, disjoint) = sketches.select(
          hll_intersect_cardinality(col("s1"), col("s2")),
          hll_intersect_cardinality(col("s2"), col("s3"))
        ).head().toSeq.map(_.asInstanceOf[Long]).toArray
        assert(full == 5L)
        assert(disjoint == 0L)

        val withNulls = spark.createDataset(Seq(
          Row3("a", null, null), Row3("b", null, null)
        )).select(
          hll_init_agg(col("c1")).as("s1"),
          hll_init_agg(col("c2")).as("s2"),
          hll_init_agg(col("c3")).as("s3"))
        val row = withNulls.select(
          hll_intersect_cardinality(col("s1"), col("s2")),
          hll_intersect_cardinality(col("s2"), col("s3"))).head()
        assert(row.getLong(0) == 0L) // one side null → 0
        assert(row.isNullAt(1)) // both null → null
      }
    }
  }

  test("relativeSD above 39% is rejected") {
    val err = intercept[IllegalArgumentException] { hll_init(lit(null), 0.40) }
    assert(err.getMessage.contains("at most 39%"))
    assert(intercept[IllegalArgumentException] {
      hll_init_collection(lit(null), 0.40)
    }.getMessage.contains("at most 39%"))
    hll_init(lit(null), 0.39) // boundary is allowed
  }

  test("format resolution: conf key, compat conf key, explicit name") {
    withFormatConf(Some("DS")) {
      assert(HllFormat.sessionDefault == DataSketchesHll)
    }
    withFormatConf(None) {
      assert(HllFormat.sessionDefault == StreamLibHll)
      spark.conf.set(HllFormat.CompatConfKey, "GRAFT")
      try assert(HllFormat.sessionDefault == GraftHll)
      finally spark.conf.unset(HllFormat.CompatConfKey)
    }
    assert(HllFormat.resolve("AGKN", null) == DataSketchesHll)
    assert(HllFormat.resolve(null, GraftHll) == GraftHll)
    intercept[IllegalArgumentException] { HllFormat.byName("BOGUS") }
  }

  test("SQL registration: every function parses and runs end-to-end") {
    HllFunctionRegistry.registerFunctions(spark)
    val row = spark.sql(
      """select
        |  hll_cardinality(hll_merge(hll_init(1))),
        |  hll_cardinality(hll_merge(hll_init_collection(array(1,2,3)))),
        |  hll_cardinality(hll_init_agg(1)),
        |  hll_cardinality(hll_init_collection_agg(array(1,2,3))),
        |  hll_cardinality(hll_merge(hll_init(1, 0.05))),
        |  hll_cardinality(hll_merge(hll_init_collection(array(1,2,3), 0.05))),
        |  hll_cardinality(hll_init_agg(1, 0.05)),
        |  hll_cardinality(hll_init_collection_agg(array(1,2,3), 0.05)),
        |  hll_cardinality(hll_row_merge(hll_init(1), hll_init(1))),
        |  hll_intersect_cardinality(hll_init(1), hll_init(1)),
        |  hll_cardinality(hll_convert(hll_init(1), "STRM", "GRAFT"), "GRAFT")
      """.stripMargin).head()
    assert(row.toSeq == Seq(1L, 3L, 1L, 3L, 1L, 3L, 1L, 3L, 1L, 1L, 1L))
  }

  test("SQL registration: implName accepted positionally in every signature") {
    HllFunctionRegistry.registerFunctions(spark)
    val row = spark.sql(
      """select
        |  hll_cardinality(hll_merge(hll_init(1, 0.05, "DS"), "DS"), "DS"),
        |  hll_cardinality(hll_merge(hll_init_collection(array(1,2,3), 0.05, "STRM"), "STRM"), "STRM"),
        |  hll_cardinality(hll_init_agg(1, 0.05, "GRAFT"), "GRAFT"),
        |  hll_cardinality(hll_init_collection_agg(array(1,2,3), 0.05, "STRM"), "STRM"),
        |  hll_cardinality(hll_row_merge(hll_init(1, 0.05, "DS"), hll_init(1, 0.05, "DS"), "DS"), "DS"),
        |  hll_intersect_cardinality(hll_init(1, 0.05, "STRM"), hll_init(1, 0.05, "STRM"), "STRM")
      """.stripMargin).head()
    assert(row.toSeq == Seq(1L, 3L, 1L, 3L, 1L, 1L))
  }

  test("converted STRM sketch estimates within ±1 of a natively-built GRAFT sketch") {
    val p = 20
    val n = 10000
    val strm = new HyperLogLogPlus(p, 0)
    val graft = GraftHll.create(p)
    val rand = new scala.util.Random(42)
    for (_ <- 0 until n) {
      val h = XXH64.hashInt(rand.nextInt(n), 0)
      strm.offerHashed(h)
      graft.offer(h)
    }
    val converted = GraftHll.deserialize(SketchConvert.strmToGraft(strm.getBytes))
    assert(math.abs(converted.cardinality - graft.cardinality) <= 1)
  }

  test("unsupported conversion direction raises a clear error") {
    val err = intercept[Exception] {
      spark.range(1).select(hll_convert(hll_init(lit(1), 0.05, "DS"), "DS", "STRM")).collect()
    }
    assert(err.getMessage.contains("only supported from STRM"))
  }

  test("sort-based aggregation fallback path serializes buffers correctly") {
    // Forces ObjectHashAggregateExec to spill to the sort-based path after one
    // in-memory group, exercising serialize/deserialize mid-aggregation
    // (SURVEY.md §7.4 R6).
    import spark.implicits._
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1")
    try {
      val df = (1 to 1000).map(i => (i % 10, i % 100)).toDF("g", "v")
      val counts = df.groupBy($"g")
        .agg(hll_cardinality(hll_init_agg($"v", 0.02)).as("users"))
        .orderBy($"g")
        .as[(Int, Long)]
        .collect()
      assert(counts.length == 10)
      assert(counts.forall(_._2 == 10L)) // each group sees 10 distinct values
    } finally {
      spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    }
  }

  test("two-level aggregation over real data: daily sketches re-aggregate to the exact total") {
    import org.apache.spark.sql.functions.to_date
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val daily = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_init_agg(col("event_type"), 0.005).as("types_hll"))
    val total = daily
      .agg(hll_cardinality(hll_merge(col("types_hll"))).as("total"))
      .head().getLong(0)
    val exact = events.select(col("event_type")).distinct().count()
    assert(total == exact)
  }
}
