package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the engine-side output-type lint (FIXTURES.md §4): the detector
 * must go RED on a deliberately-wide scratch query — top-level, nested
 * struct, array element, and map value decimals all named — and GREEN on
 * the narrow BIGINT/STRING shapes the harness actually ships. The wide
 * shape here is exactly the r14 failure class: decimal(38,0) arithmetic
 * correct by value, hash-mismatched at the driver by representation. */
class OutputTypeContractSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-output-contract-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("a deliberately-wide scratch query is RED, every path named") {
    import spark.implicits._
    val wide = Seq((1L, 2L)).toDF("a", "b")
      .select(
        expr("cast(a as decimal(38,0))").as("top"),
        struct(expr("cast(b as decimal(20,2))").as("inner"),
          col("b").as("ok")).as("s"),
        array(expr("cast(a as decimal(10,0))")).as("arr"),
        map(col("a"), expr("cast(b as decimal(12,3))")).as("m"))
    val paths = OutputTypeContract.decimalPaths(wide.schema)
    assert(paths.toSet === Set("top", "s.inner", "arr[]", "m<value>"))
    val e = intercept[IllegalStateException] {
      OutputTypeContract.assertNoDecimals("scratch_wide", wide.schema)
    }
    assert(e.getMessage.contains("scratch_wide"))
    assert(e.getMessage.contains("s.inner"))
    assert(e.getMessage.contains("FIXTURES.md"))
  }

  test("the narrowed shape of the same query is GREEN") {
    import spark.implicits._
    // The prescribed repair: BIGINT for in-range values, STRING where
    // int128 headroom is required — decimal stays internal only.
    val narrow = Seq((1L, 2L)).toDF("a", "b")
      .select(
        expr("cast(cast(a as decimal(38,0)) as bigint)").as("top"),
        expr("cast(cast(b as decimal(38,0)) as string)").as("wide_str"),
        struct(col("b").as("inner")).as("s"))
    assert(OutputTypeContract.decimalPaths(narrow.schema).isEmpty)
    OutputTypeContract.assertNoDecimals("scratch_narrow", narrow.schema)
  }

  test("internal decimal arithmetic narrowed at the final projection is GREEN") {
    import spark.implicits._
    // The family pattern (Resample/Balance): exact decimal(38,0) cross
    // products internally, BIGINT/STRING at the boundary.
    val df = (1 to 10).map(i => (i.toLong, (i * 7).toLong)).toDF("n", "s")
      .agg(sum(expr("cast(n as decimal(38,0)) * cast(s as decimal(38,0))"))
        .as("acc"))
      .select(col("acc").cast("string").as("stat_num"))
    assert(OutputTypeContract.decimalPaths(df.schema).isEmpty)
    assert(df.collect().head.getString(0).toLong ===
      (1 to 10).map(i => i.toLong * i * 7).sum)
  }
}
