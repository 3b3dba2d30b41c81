package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the Z-order kernels: the interleave is a bijection
 * [0,2^16)² → [0,2^32) whose inverse recovers both coordinates, and the
 * curve's locality bound holds for arbitrary points, not just the crafted
 * grid in LayoutSpec. */
class ZorderPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-zorderprop-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Plain-Scala inverse: gather even (x) / odd (y) bits. */
  private def deinterleave(z: Long): (Long, Long) = {
    var x = 0L; var y = 0L
    var i = 0
    while (i < 16) {
      x |= ((z >>> (2 * i)) & 1L) << i
      y |= ((z >>> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }

  test("zorder2 round-trips arbitrary 16-bit coordinates through deinterleave") {
    import spark.implicits._
    val seed = org.scalacheck.rng.Seed(7L)
    val coord = Gen.chooseNum(0L, 65535L)
    val pts = Iterator.iterate(seed)(_.next)
      .take(500)
      .flatMap(s => Gen.zip(coord, coord).apply(Gen.Parameters.default, s))
      .toList
    val rows = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorder2(col("x"), col("y")).as("z"))
      .collect()
    rows.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z >= 0L && z < (1L << 32), s"z out of range for ($x,$y): $z")
      assert(deinterleave(z) === ((x, y)), s"round-trip failed for ($x,$y)")
    }
    // Bijection on the sample: distinct inputs -> distinct z.
    assert(rows.map(_.getLong(2)).distinct.length === pts.distinct.length)
  }

  test("top-bit file assignment bounds both spans for arbitrary points") {
    import spark.implicits._
    val seed = org.scalacheck.rng.Seed(11L)
    val coord = Gen.chooseNum(0L, 65535L)
    val pts = Iterator.iterate(seed)(_.next)
      .take(2000)
      .flatMap(s => Gen.zip(coord, coord).apply(Gen.Parameters.default, s))
      .toList
    val audit = Layout.zorderAudit(pts.toDF("x", "y"), col("x"), col("y"),
      bucketBits = 2).collect()
    audit.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 16384, s"x span: $r")
      assert(r.getLong(5) - r.getLong(4) <= 16384, s"y span: $r")
    }
  }
}
