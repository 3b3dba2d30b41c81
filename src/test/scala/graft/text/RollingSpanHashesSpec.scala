package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlBridge
import org.scalatest.funsuite.AnyFunSuite

/**
 * The span-dedup hash split is only lossless if the rolling pass is
 * EXACTLY the fingerprint it claims: window i of rolling_span_hashes must
 * equal rolling_hash64 of the space-joined window string, for every
 * window — that identity is what guarantees equal window strings always
 * collide in the prefilter.
 */
class RollingSpanHashesSpec extends AnyFunSuite with graft.testutil.OpenStreamLeakCheck {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-rolling-span-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def spanHashes(tokens: Seq[String], w: Int): Seq[Long] = {
    import spark.implicits._
    Seq(tokens).toDF("ts")
      .select(GraftSqlBridge.column(RollingSpanHashes(
        GraftSqlBridge.expression(col("ts")), w)).as("h"))
      .collect()(0).getSeq[Long](0)
  }

  test("window fingerprints equal rolling_hash64 of the joined window string") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val n = 1 + rnd.nextInt(12)
      val tokens = (1 to n).map(_ =>
        (1 to 1 + rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
      val w = 1 + rnd.nextInt(5)
      val got = spanHashes(tokens, w)
      val expected = (0 to n - w).map { i =>
        RollingHash64.hashBytes(
          tokens.slice(i, i + w).mkString(" ").getBytes("UTF-8"))
      }
      assert(got === expected, s"tokens=$tokens w=$w")
    }
  }

  test("short arrays yield no windows; exact-length arrays yield one") {
    assert(spanHashes(Seq("a", "b"), 3).isEmpty)
    assert(spanHashes(Seq("a", "b", "c"), 3) ===
      Seq(RollingHash64.hashBytes("a b c".getBytes("UTF-8"))))
  }

  test("null tokens fail fast: the md5 confirm (concat_ws) would render them differently") {
    // concat_ws drops null elements AND separators, so any null-hashing
    // convention diverges from the confirm identity and silently makes
    // the prefilter lossy — the expression must refuse instead.
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(Seq("a", null, "c")).toDF("ts")
        .select(GraftSqlBridge.column(RollingSpanHashes(
          GraftSqlBridge.expression(col("ts")), 2)).as("h"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("null token")), s"unexpected error: $e")
  }

  test("repeatedSpans (prefiltered) == the definitional md5-only formulation") {
    import spark.implicits._
    import graft.operators.Sampling
    // A corpus with planted cross-doc repeats, within-doc repeats (must
    // be excluded), and unique text. Small enough that the old
    // md5-every-window formulation runs as the in-test oracle.
    val docs: DataFrame = Seq(
      ("d1", "the quick brown fox jumps over the lazy dog again and again"),
      ("d2", "prefix words the quick brown fox jumps over something else entirely"),
      ("d3", "one two three one two three one two three one two four"),
      ("d4", "totally unrelated content with no overlap whatsoever here at all"),
      ("d5", "the quick brown fox jumps over the fence not the dog today")
    ).toDF("doc_id", "text")
    val w = 4
    val got = graft.dedup.Dedup.repeatedSpans(docs, w)
      .select("doc_id", "start", "gh")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet

    val hashes = when(size(col("ts")) >= w, transform(
      sequence(lit(1), size(col("ts")) - (w - 1)),
      i => Sampling.md5Hash64(concat_ws(" ", slice(col("ts"), i, lit(w))))))
      .otherwise(array().cast("array<bigint>"))
    val spans = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ts"))
      .select(col("doc_id"), posexplode(hashes).as(Seq("pos0", "gh")))
      .select(col("doc_id"), (col("pos0") + 1).as("start"), col("gh"))
    val repeated = spans.groupBy("gh")
      .agg(count_distinct(col("doc_id")).as("nd")).filter(col("nd") > 1).select("gh")
    val expected = spans.join(repeated, "gh")
      .select("doc_id", "start", "gh")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet

    assert(expected.nonEmpty, "test corpus must contain cross-doc repeats")
    assert(got === expected)
  }
}
