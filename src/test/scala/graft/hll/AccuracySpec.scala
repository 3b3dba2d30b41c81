package graft.hll

import graft.hll.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate-mode error bounds at scale — the regime the oracle-checked
 * queries deliberately avoid (they pin precision for exactness). These
 * tests pin the OTHER half of the contract: estimates stay inside the
 * advertised relative error when cardinality far exceeds the registers. */
class AccuracySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-accuracy-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val n = 200000L

  test("STRM HLL at sd=0.05 stays within 3 standard errors at 200k distinct") {
    val est = spark.range(n)
      .agg(hll_cardinality(hll_init_agg(col("id"), 0.05)))
      .head().getLong(0)
    assert(math.abs(est - n).toDouble / n < 0.15, s"estimate $est")
  }

  test("DS HLL at sd=0.05 stays within 3 standard errors at 200k distinct") {
    val est = spark.range(n)
      .agg(hll_cardinality(hll_init_agg(col("id"), 0.05, "DS"), "DS"))
      .head().getLong(0)
    assert(math.abs(est - n).toDouble / n < 0.15, s"estimate $est")
  }

  test("theta sketch at lgK=12 stays within 3 standard errors at 200k distinct") {
    import graft.theta.functions._
    val est = spark.range(n)
      .agg(theta_estimate(theta_init_agg(col("id"))))
      .head().getLong(0)
    // rel err ~ 1/sqrt(2^12) ≈ 1.6%; allow 3x
    assert(math.abs(est - n).toDouble / n < 0.05, s"estimate $est")
  }

  test("merged partial sketches estimate like a single sketch (no merge drift)") {
    val whole = spark.range(n)
      .agg(hll_init_agg(col("id"), 0.05).as("h"))
      .select(hll_cardinality(col("h"))).head().getLong(0)
    val merged = spark.range(n)
      .groupBy((col("id") % 64).as("g"))
      .agg(hll_init_agg(col("id"), 0.05).as("h"))
      .agg(hll_cardinality(hll_merge(col("h"))))
      .head().getLong(0)
    // Same hash, same registers: merging partials must give the IDENTICAL
    // register state, hence the identical estimate.
    assert(merged === whole)
  }
}
