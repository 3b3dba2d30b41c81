package graft.operators

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data selection via importance resampling (the DSIR pipeline stage): score
 * every raw-pool document by how target-like its unigram distribution is,
 * so a selection step can keep the top slice (or sample proportionally to
 * the weights) when assembling a training mix from a large crawl.
 *
 * The classic formulation weighs each document by
 * `Π_w p_target(w) / p_raw(w)` over its tokens. To keep results exact
 * across engines this library's variant stays in integer arithmetic (the
 * q60/q103 fixed-point rule): with add-one smoothing over the joint
 * vocabulary, each token scores
 *
 *   w_e6(w) = (10^6 · (ct(w)+1) · (Nr+V)) div ((cr(w)+1) · (Nt+V))
 *
 * — the e6-scaled smoothed likelihood ratio — and a document's weight is
 * the SUM of its token scores (the log-product's monotone integer stand-in:
 * same keep/drop ordering for same-length docs, and the mean column
 * removes the length bias). All counts are longs; the numerator stays
 * below 2^63 while `10^6 · ct · Nr < 9·10^18` — petabyte vocabularies need
 * a rescale, corpus-per-job slices do not.
 *
 * Scale shape: token coordinates `(doc_id, w)` shuffle twice (vocab count,
 * then the score join keyed by token — the vocab table is corpus-sized, so
 * it is NEVER broadcast; hot-token skew on the probe side is AQE's
 * standard case). Totals are one broadcast row. Text never shuffles.
 */
object Dsir {

  /**
   * Per-document importance weights of the NON-target (raw) documents.
   *
   * @param isTarget predicate column marking the in-domain sample rows
   * @return one row per raw document that has at least one token:
   *         `(id, n_tokens, w_sum, mean_w_e6)`; token-free docs are
   *         absent (left-join + coalesce downstream, as q112 does)
   */
  def unigramImportance(docs: DataFrame, isTarget: Column,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), isTarget.as("tgt"),
      explode(TextAnalysis.tokens(col(textCol))).as("w"))
    val counts = toks.groupBy("w").agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("tgt"), 0L).otherwise(1L)).as("cr"))
    val totals = counts.agg(sum("ct").as("nt"), sum("cr").as("nr"),
      count(lit(1)).as("v"))
    val weights = counts.join(broadcast(totals))
      .select(col("w"),
        expr("(1000000L * (ct + 1) * (nr + v)) div ((cr + 1) * (nt + v))").as("w_e6"))
    toks.filter(!col("tgt")).select(col("id"), col("w"))
      .join(weights, "w")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum("w_e6").as("w_sum"))
      .withColumn("mean_w_e6", expr("w_sum div n_tokens"))
  }

  /**
   * The SELECTION step: turn [[unigramImportance]] weights into a
   * deterministic importance-proportional subset — keep a doc with
   * probability `min(weight_e6, 10^6) / 10^6` decided by an md5 uniform
   * over `(seed, id)`, the Bernoulli form of DSIR's resampling (weights
   * at/above the e6 cap always keep; weight 0 never keeps).
   *
   * Deterministic on purpose (same md5-threshold discipline as
   * [[Sampling.deterministicSample]]): the kept set is identical on every
   * run and engine and auditable off-Spark, where `rand()`-based
   * resampling is not. A fresh `seed` draws an independent selection from
   * the same weights. Purely map-side over the weight table — no shuffle,
   * no state.
   *
   * @param weighted per-doc weights, e.g. [[unigramImportance]] output
   * @return input columns + `u_e6` (the uniform in [0, 10^6)) + `kept`
   */
  def importanceSample(weighted: DataFrame, seed: Long,
      idCol: String = "id", weightCol: String = "mean_w_e6"): DataFrame =
    weighted
      .withColumn("u_e6", pmod(
        shiftrightunsigned(Sampling.md5Hash64(
          concat_ws(":", lit(seed), col(idCol).cast("string"))), 1),
        lit(1000000L)))
      .withColumn("kept", col("u_e6") < least(col(weightCol), lit(1000000L)))
}
