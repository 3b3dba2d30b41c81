package graft

import graft.bloom.functions._
import graft.freq.functions._
import graft.kll.functions._
import graft.theta.functions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/**
 * SURVEY §7.4 R6 for every sketch family: `ObjectHashAggregateExec` falls
 * back to sort-based aggregation after `fallbackThreshold` in-memory
 * groups, which exercises each TypedImperativeAggregate's
 * serialize/deserialize mid-aggregation — a buffer that does not
 * round-trip its wire format changes the result. Forcing the threshold to
 * 1 on a 10-group aggregate pushes 9 groups through the spill path, so
 * value-equality with the default plan proves the format. HLL has this
 * spec in HllFunctionsSpec; this covers the other four families.
 *
 * Every query here runs its sketch in exact mode (capacity above the
 * input's cardinality), so results are order-independent and the compare
 * can be strict equality rather than tolerance.
 */
class SketchFallbackSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-fallback-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 10 groups × 100 rows; values cycle 0..99 (each group sees 10 distinct). */
  private def input: DataFrame = {
    import spark.implicits._
    (1 to 1000).map(i => (i % 10, i % 100)).toDF("g", "v").repartition(4)
  }

  private val FallbackKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"

  /** Runs `query` on the default plan and under forced sort-based fallback;
   * asserts the plan really is object-hash (else the conf is a no-op and
   * the test proves nothing) and that results match value-for-value. */
  private def checkForcedFallback(query: DataFrame => DataFrame): Unit = {
    val plan = query(input).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregateExec in plan:\n$plan")
    val expected = query(input).collect().toSeq
    spark.conf.set(FallbackKey, "1")
    val forced =
      try query(input).collect().toSeq
      finally spark.conf.unset(FallbackKey)
    assert(forced === expected)
  }

  test("theta: grouped init + union re-merge survive forced sort fallback") {
    checkForcedFallback { df =>
      df.groupBy("g").agg(theta_init_agg(col("v")).as("sk"))
        .agg(theta_estimate(graft.theta.functions.theta_union(col("sk"))).as("total"))
    }
    checkForcedFallback { df =>
      df.groupBy("g").agg(theta_estimate(theta_init_agg(col("v"))).as("nd"))
        .orderBy("g")
    }
  }

  test("kll: grouped init + merge survive forced sort fallback") {
    checkForcedFallback { df =>
      // k=2048 > 1000 total items: the merged sketch never compacts, so the
      // median is exact and independent of merge order — without this the
      // sort path's different merge order gives a different (equally valid)
      // approximation and the equality assert would be testing noise.
      df.groupBy("g").agg(kll_init_agg(col("v").cast("double"), 2048).as("sk"))
        .agg(kll_quantile(kll_merge(col("sk"), 2048), 0.5).as("median"))
    }
    checkForcedFallback { df =>
      df.groupBy("g")
        .agg(kll_init_agg(col("v").cast("double"), 256).as("sk"))
        .select(col("g"), kll_quantile(col("sk"), 0.5).as("q50"),
          kll_n(col("sk")).as("n"))
        .orderBy("g")
    }
  }

  test("freq: grouped init + merge survive forced sort fallback") {
    checkForcedFallback { df =>
      df.groupBy("g").agg(freq_init_agg(col("v").cast("string"), 256).as("sk"))
        .agg(freq_merge(col("sk"), 256).as("all"))
        .select(freq_estimate(col("all"), lit("5")).as("n5"),
          freq_stream_length(col("all")).as("len"))
    }
    checkForcedFallback { df =>
      df.groupBy("g").agg(freq_init_agg(col("v").cast("string"), 256).as("sk"))
        .select(col("g"), freq_estimate(col("sk"), lit("5")).as("n5"),
          freq_max_error(col("sk")).as("err"))
        .orderBy("g")
    }
  }

  test("bloom: grouped init + merge survive forced sort fallback") {
    checkForcedFallback { df =>
      df.groupBy("g").agg(bloom_init_agg(col("v"), 4096, 10000).as("bf"))
        .agg(bloom_merge(col("bf"), 4096, 10000).as("all"))
        .select(bloom_might_contain(col("all"), lit(5)).as("has5"),
          bloom_might_contain(col("all"), lit(-1)).as("hasNeg"),
          bloom_fill_fraction(col("all")).as("fill"))
    }
    checkForcedFallback { df =>
      df.groupBy("g").agg(bloom_init_agg(col("v"), 4096, 10000).as("bf"))
        .select(col("g"), bloom_might_contain(col("bf"), lit(5)).as("has5"),
          bloom_fill_fraction(col("bf")).as("fill"))
        .orderBy("g")
    }
  }
}
