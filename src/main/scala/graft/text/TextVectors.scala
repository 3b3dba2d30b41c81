package graft.text

import graft.operators.Sampling
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Feature-hashed document vectors (the hashing trick, Weinberger et al.,
 * "Feature Hashing for Large Scale Multitask Learning", ICML 2009): a
 * fixed-dimension document representation computed from token hashes
 * alone — no vocabulary table, no training pass, no model artifact. The
 * cheap-embedding step a pipeline runs when it needs doc vectors for
 * clustering/near-dup/classification long before a learned encoder
 * exists (and the only one whose output an external engine can re-derive
 * row-for-row).
 *
 * Determinism contract: bucket and sign come from the same md5-64 value
 * hash the sampling/split operators use, restated off-Spark with
 * `md5()` + integer ops — so the q142 oracle rebuilds every coordinate.
 *
 * Scale shape: one map-side pass over text (tokenize → hash → signed
 * coordinate), then ONE aggregation keyed by (doc, bucket) whose rows are
 * integer coordinates — the text itself never shuffles, and output size
 * is at most |docs| × dim (sparse: exact zero counts are dropped).
 */
object TextVectors {

  /**
   * Signed term-frequency hashing into `dim` buckets, as sparse integer
   * coordinates `(doc_id, bucket, tf)`.
   *
   * Per token: `u = md5_hash64(token) >>> 1` (top-63 uniform);
   * `bucket = u % dim`; sign = bit 32 of `u` (independent of the bucket
   * bits for any practical dim) mapping to ±1. A bucket's value is the
   * signed sum — the cancellation trick that keeps hash collisions
   * unbiased in expectation. Buckets summing to exactly 0 are dropped
   * (sparse representation; consumers treat absent as 0).
   */
  def hashedTfCoords(docs: DataFrame, dim: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val u = shiftrightunsigned(Sampling.md5Hash64(col("t")), 1)
    docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .select(col("doc_id"),
        pmod(u, lit(dim.toLong)).as("bucket"),
        when((shiftrightunsigned(u, 32) % 2) === 1, 1L).otherwise(-1L).as("s"))
      .groupBy("doc_id", "bucket")
      .agg(sum(col("s")).as("tf"))
      .filter(col("tf") =!= 0L)
  }
}
