package graft.hll

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound pinning across init functions and the Spark built-in
 * (reference: BoundHLL.scala:12-59). */
class BoundHllSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-boundhll-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bound instance pins the error for all four inits and approx_count_distinct") {
    import spark.implicits._
    val bound = BoundHll(0.02)
    val df = (1 to 500).map(i => i % 50).toDF("v")

    val sketchCard = df
      .agg(bound.hll_init_agg(col("v")).as("h"))
      .select(graft.hll.functions.hll_cardinality(col("h")))
      .head().getLong(0)
    assert(sketchCard === 50L) // exact at sd=0.02, |values|=50

    val builtIn = df.agg(bound.approx_count_distinct(col("v"))).head().getLong(0)
    assert(builtIn === 50L)

    val scalarCard = df.limit(1)
      .select(graft.hll.functions.hll_cardinality(bound.hll_init(col("v"))))
      .head().getLong(0)
    assert(scalarCard === 1L)

    val collCard = df.limit(1)
      .select(graft.hll.functions.hll_cardinality(
        bound.hll_init_collection(org.apache.spark.sql.functions.array(col("v")))))
      .head().getLong(0)
    assert(collCard === 1L)
  }

  test("bound instance with an explicit format produces sketches in that format") {
    import spark.implicits._
    val bound = BoundHll(0.05, DataSketchesHll)
    val bytes = (1 to 10).toDF("v")
      .agg(bound.hll_init_agg(col("v")).as("h"))
      .head().getAs[Array[Byte]](0)
    // DataSketches sketches deserialize in the DS format; STRM would throw.
    val card = DataSketchesHll.deserialize(bytes).cardinality
    assert(card === 10L)
  }
}
