package graft.operators

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Vocabulary-richness / unseen-mass estimation — the "how much more is
 * out there" read a corpus team takes before paying for another crawl:
 * if the frequency-of-frequencies head still holds a lot of singleton
 * mass, new data keeps buying new vocabulary (and conversely a saturated
 * vocabulary argues for quality work over volume). Both classic
 * estimators derive from that head and ship as EXACT integer rationals:
 *
 *  - Chao1 total-vocabulary estimate (bias-corrected form, defined even
 *    with no doubletons): V + f1(f1−1) / (2(f2+1)) where V = observed
 *    vocabulary, f1/f2 = types seen exactly once/twice (Chao 1984).
 *  - Good–Turing unseen-mass estimate: the probability the NEXT token is
 *    a never-seen type ≈ f1 / N with N = total tokens (Good 1953).
 */
object Richness {

  /**
   * One row of corpus-vocabulary accounting over whitespace tokens:
   * (n_tokens, vocab, f1, f2, chao1_num, chao1_den, gt_unseen_num,
   * gt_unseen_den) with chao1 = chao1_num/chao1_den ≥ vocab and
   * gt_unseen = f1/n_tokens (den 0 on an empty corpus — no estimate,
   * not a fake zero).
   *
   * Scale shape: the token explode combines map-side into per-partition
   * (token, count) partials, so the one exchange carries vocabulary
   * coordinates, not corpus tokens; the frequency-of-frequencies fold
   * then reduces |vocab| rows to one. The corpus scan fans out past the
   * single-split trap (no-op at real scale).
   */
  def chao1Vocabulary(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val cnt = graft.dedup.Dedup.fanOutSmallScan(docs)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
    cnt.agg(
        coalesce(sum(col("n")), lit(0L)).as("n_tokens"),
        count(lit(1)).as("vocab"),
        coalesce(sum(when(col("n") === 1L, 1L)), lit(0L)).as("f1"),
        coalesce(sum(when(col("n") === 2L, 1L)), lit(0L)).as("f2"))
      .select(col("n_tokens"), col("vocab"), col("f1"), col("f2"),
        (col("vocab") * 2L * (col("f2") + 1L)
          + col("f1") * (col("f1") - 1L)).as("chao1_num"),
        (lit(2L) * (col("f2") + 1L)).as("chao1_den"),
        col("f1").as("gt_unseen_num"),
        col("n_tokens").as("gt_unseen_den"))
  }
}
