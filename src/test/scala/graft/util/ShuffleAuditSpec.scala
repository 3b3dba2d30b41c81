package graft.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime shuffle-byte accounting: the NUMERIC side of PlanShapeSpec's
 * payload-free-shuffle claims. */
class ShuffleAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-shuffle-audit-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("map-only plans shuffle zero bytes; aggregations report bytes and rows") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val mapOnly = docs.select(col("doc_id"), length(col("text")).as("n"))
    mapOnly.collect()
    assert(ShuffleAudit.shuffledBytes(mapOnly) === 0L)
    assert(ShuffleAudit.shuffledRows(mapOnly) === 0L)

    val agg = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    agg.collect()
    assert(ShuffleAudit.shuffledBytes(agg) > 0L)
    assert(ShuffleAudit.shuffledRows(agg) > 0L)
  }

  test("coordinate-only dedup shuffles a small fraction of what a text-keyed plan pays") {
    val docs = graft.sources.Tables.documents(spark, sf).cache()
    val textBytes = docs.agg(sum(length(col("text")))).collect()(0).getLong(0)

    // The library's rule: hash first, shuffle (fingerprint, id) coordinates.
    val coord = docs
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .groupBy("fp").agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))
    coord.collect()
    val coordBytes = ShuffleAudit.shuffledBytes(coord)

    // The anti-pattern: group directly by the text column — every byte of
    // every document crosses the wire.
    val textKeyed = docs.groupBy(col("text"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))
    textKeyed.collect()
    val textKeyedBytes = ShuffleAudit.shuffledBytes(textKeyed)

    assert(coordBytes > 0L && textKeyedBytes > textBytes / 2,
      s"expected the text-keyed shuffle (~$textKeyedBytes B) to carry the corpus (~$textBytes B)")
    assert(coordBytes * 3 < textKeyedBytes,
      s"coordinate shuffle $coordBytes B is not materially smaller than text-keyed $textKeyedBytes B")
    docs.unpersist()
  }

  test("harness incremental-dedup query never shuffles the corpus text (numeric)") {
    val df = graft.queries.PipelineQueries.queries("q61_incremental_dedup")(spark, sf)
    df.collect()
    val bytes = ShuffleAudit.shuffledBytes(df)
    val textBytes = graft.sources.Tables.documents(spark, sf)
      .agg(sum(length(col("text")))).collect()(0).getLong(0)
    // Fingerprint+id coordinates: well under half the raw text volume even
    // at this tiny scale (where per-row framing overhead is at its worst
    // relative to payload).
    assert(bytes < textBytes / 2,
      s"q61 shuffled $bytes B vs $textBytes B of text — payload leaked into the exchange")
  }
}
