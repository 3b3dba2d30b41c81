package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * A production SparkSession runs MANY queries at once (thrift server,
 * notebook cells, scheduled jobs sharing a session). Custom expressions
 * must be re-entrant: no shared mutable state across rows of DIFFERENT
 * concurrent queries, no registry races. This spec runs a mixed slice of
 * the harness — sketch aggregation, LSH dedup, text kernels, windows,
 * exact quantiles — 2× each from a thread pool against one session and
 * asserts every result equals its serial run. A mutable-static bug in any
 * kernel shows up as a value diff or a crash here.
 */
class ConcurrencySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .withExtensions(new graft.hll.GraftSparkExtensions)
    .master("local[8]")
    .appName("graft-concurrency-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private val slice = Seq(
    "hll_agg_months", "q12_text_fingerprint", "q14_dedup_minhash",
    "q10_text_stats", "q4_top_orders_per_priority", "q130_exact_quantiles",
    "q24_quantile_sketch", "q37_freq_heavyhitters", "q161_key_skew_report",
    "q154_weighted_sample",
    // Round-9 shared-state paths: the BPE learner's cached AQE-off child
    // session (two concurrent learns share one quiet session), the
    // windowed-sketch thread-local parse/estimate caches, and the
    // fingerprint-prefiltered span detection.
    "q91_bpe_learn", "q62_window_sketch", "q64_repeated_spans")

  private def run(name: String): Seq[Seq[String]] =
    SparkEntry.queries(name)(spark, sf).collect().toSeq
      .map(r => (0 until r.length).map(i => String.valueOf(r.get(i))))
      .sortBy(_.mkString("\u0000"))

  test("concurrent executions of a mixed query slice equal their serial runs") {
    val serial = slice.map(n => n -> run(n)).toMap
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val tasks = (slice ++ slice).map { n =>
        Future(n -> run(n))
      }
      val results = Await.result(Future.sequence(tasks), 10.minutes)
      for ((n, got) <- results)
        assert(got === serial(n), s"$n diverged under concurrency")
    } finally pool.shutdown()
  }
}
