package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Sketch columns are stored, shipped, and re-read across jobs and systems
 * — so malformed bytes (truncation in transit, a column mixup, a format
 * mismatch) WILL eventually reach every eval path. The library's safety
 * contract: corrupt input fails LOUDLY with an exception, never a silent
 * garbage estimate and never a JVM crash. This spec pins that contract
 * for every sketch family, and for the HLL formats additionally pins the
 * actionable wrapper message (format name + byte count + implName hint).
 */
class CorruptSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-corrupt-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def garbageDf = {
    import spark.implicits._
    Seq(
      Tuple1(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)),
      Tuple1(Array.empty[Byte]),
      Tuple1(Array[Byte](0x7f))).toDF("b")
  }

  /** The chain of messages from a failed action, top to root. */
  private def failureChain(action: => Unit): Seq[String] = {
    val t = intercept[Throwable](action)
    Iterator.iterate(t)(_.getCause)
      .takeWhile(e => e != null)
      .take(10)
      .map(e => s"${e.getClass.getName}: ${e.getMessage}").toSeq
  }

  test("garbage bytes fail loudly in every HLL format, naming the format") {
    import graft.hll.functions._
    for (fmt <- Seq("STRM", "DS", "GRAFT")) {
      val chain = failureChain(
        garbageDf.select(hll_cardinality(col("b"), fmt)).collect())
      assert(chain.exists(m => m.contains("Cannot deserialize") && m.contains(fmt)),
        s"$fmt corrupt-sketch failure lost the actionable wrapper:\n${chain.mkString("\n")}")
    }
  }

  test("cross-format confusion fails loudly, not with a wrong estimate") {
    import graft.hll.functions._
    import spark.implicits._
    // A VALID sketch in one format read as another must error — a dense
    // STRM register array is NOT parseable DS coupon bytes and vice
    // versa; silently estimating from misread bytes would be the worst
    // outcome.
    val strm = Seq(1L, 2L, 3L).toDF("v")
      .agg(hll_init_agg(col("v"), 0.05, "STRM").as("h"))
    val asDs = failureChain(strm.select(hll_cardinality(col("h"), "DS")).collect())
    assert(asDs.exists(_.contains("Cannot deserialize")), asDs.mkString("\n"))
    val ds = Seq(1L, 2L, 3L).toDF("v")
      .agg(hll_init_agg(col("v"), 0.05, "DS").as("h"))
    val asGraft = failureChain(ds.select(hll_cardinality(col("h"), "GRAFT")).collect())
    assert(asGraft.exists(_.contains("Cannot deserialize")), asGraft.mkString("\n"))
  }

  test("garbage bytes fail loudly in the theta, KLL, freq, and bloom families") {
    val evals: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "theta_estimate" -> graft.theta.functions.theta_estimate(col("b")),
      "kll_quantile" -> graft.kll.functions.kll_quantile(col("b"), 0.5),
      "kll_n" -> graft.kll.functions.kll_n(col("b")),
      "freq_items" -> graft.freq.functions.freq_items(col("b"), 1L),
      "bloom_might_contain" ->
        graft.bloom.functions.bloom_might_contain(col("b"), lit(1L)))
    for ((name, c) <- evals) {
      val chain = failureChain(garbageDf.select(c).collect())
      assert(chain.nonEmpty, s"$name accepted garbage bytes silently")
    }
  }

  test("truncated valid sketches are rejected, not re-estimated") {
    import graft.hll.functions._
    import spark.implicits._
    val bytes = Seq(1L, 2L, 3L, 4L, 5L).toDF("v")
      .agg(hll_init_agg(col("v"), 0.05).as("h"))
      .collect()(0).getAs[Array[Byte]](0)
    val cut = bytes.take(bytes.length / 2)
    val chain = failureChain(
      Seq(Tuple1(cut)).toDF("b").select(hll_cardinality(col("b"))).collect())
    assert(chain.exists(_.contains("Cannot deserialize")), chain.mkString("\n"))
  }
}
