package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The harness corpus never carries NULL text, but user corpora do. Every
 * text-consuming operator must tolerate null documents without throwing —
 * null-text rows either drop out (null produces no shingles/lines/tokens)
 * or carry null results through, per Spark's null semantics; they must
 * never crash a 100 TB job at hour three. */
class NullSafetySpec extends AnyFunSuite with graft.testutil.OpenStreamLeakCheck {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-nullsafety-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def corpus: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog " * 3),
      (2L, null.asInstanceOf[String]),
      (3L, "the quick brown fox jumps over the lazy dog " * 3 + "TAIL"),
      (4L, "")).toDF("doc_id", "text")
  }

  test("exact dedup: null text forms its own group, empty text another") {
    val groups = graft.dedup.Dedup.exactDupGroups(corpus).collect()
    assert(groups.length === 4) // two distinct texts + null + empty
    assert(groups.map(_.getLong(2)).sum === 4L) // every doc accounted for
  }

  test("near-dup pipeline survives null and empty text") {
    val pairs = graft.dedup.Dedup.jaccardNearDupPairs(corpus,
      thresholdNum = 3, thresholdDen = 4, rows = 4, shingleWidth = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 3L))) // null/empty rows just drop out
  }

  test("incremental near-dup survives null on either side") {
    val got = graft.dedup.Dedup.incrementalJaccardNearDup(
      corpus.filter(col("doc_id") >= 3), corpus.filter(col("doc_id") < 3),
      thresholdNum = 3, thresholdDen = 4, rows = 4, shingleWidth = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((3L, 1L)))
  }

  test("boilerplate removal carries null text through as null") {
    val out = graft.text.Cleanup.removeBoilerplateLines(corpus, minDocs = 3)
      .orderBy("doc_id").collect()
    assert(out.length === 4)
    assert(out(1).isNullAt(1)) // null in, null out — not a crash, not ""
  }

  test("text kernels return null for null input") {
    val r = corpus.filter(col("doc_id") === 2).select(
      graft.text.TextAnalysis.fingerprint(col("text")),
      graft.text.TextAnalysis.tokenCount(col("text")),
      graft.text.Cleanup.scrub(col("text"))).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("frame hashing skips null payloads") {
    val payloads = corpus.select(col("doc_id"), lit("image/stub").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))
    val n = graft.multimodal.Multimodal.frameHashes(spark,
      payloads.filter(col("payload").isNotNull), 64, 1).count()
    assert(n > 0)
  }
}
