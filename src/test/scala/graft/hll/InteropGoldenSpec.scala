package graft.hll

import graft.hll.functions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * The library's signature move, pinned end-to-end at the reference's interop
 * scale (reference: PostgresInteropTest.scala:64-98 — 100k seeded rows, 24
 * groups, relativeSD 0.39): build per-group sketches, WRITE them to parquet,
 * read them back in a fresh DataFrame, merge, and require the estimate to
 * EQUAL the one from aggregating the raw rows directly — for every wire
 * format. Equality (not closeness) is the point: the store→reload→re-merge
 * path must reproduce the exact registers the direct path builds, or
 * persisted sketch tables silently drift from their sources.
 */
class InteropGoldenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-interop-golden-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Rows = 100000
  private val Groups = 24
  private val Sd = 0.39 // p = 4: deliberately coarse, like the reference

  private def seededData() = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // Materialized driver-side so every format iteration sees identical
    // rows (a seeded RNG inside a distributed map would depend on task
    // ordering).
    (1 to Rows).map(i => (i % Groups, rnd.nextInt(Rows))).toDF("g", "v")
  }

  for (fmt <- Seq("STRM", "DS", "GRAFT")) {
    test(s"[$fmt] sketches survive parquet store -> reload -> re-merge with an identical estimate") {
      val df = seededData()
      val out = java.nio.file.Files.createTempDirectory(s"graft-interop-$fmt").toString

      // Store: one sketch per group (the persisted "sketch table").
      df.groupBy(col("g"))
        .agg(hll_init_agg(col("v"), Sd, fmt).as("sk"))
        .write.mode("overwrite").parquet(out)

      // Reload in a fresh frame and re-aggregate without the raw data.
      val merged = spark.read.parquet(out)
        .agg(hll_cardinality(hll_merge(col("sk"), fmt), fmt).as("estimate"))
        .head().getLong(0)

      // Direct aggregation over the raw rows.
      val direct = df
        .agg(hll_cardinality(hll_init_agg(col("v"), Sd, fmt), fmt).as("estimate"))
        .head().getLong(0)

      assert(merged === direct, s"store/reload drifted from direct aggregation for $fmt")
      // The estimate is also sane: ~63k distinct values at sd=0.39 should
      // land within the (very coarse) error envelope, not at 0 or 100k+.
      val trueDistinct = df.select(countDistinct(col("v"))).head().getLong(0)
      assert(math.abs(merged - trueDistinct).toDouble / trueDistinct < 3 * Sd,
        s"estimate $merged vs true $trueDistinct outside 3-sigma for $fmt")
    }
  }
}
