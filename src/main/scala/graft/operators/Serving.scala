package graft.operators

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Serving-side corpus analytics: what an inference fleet can reuse
 * across requests. Prompt caches key on exact token prefixes, so the
 * question "how much of this corpus is cacheable?" is a grouping
 * problem over first-K-token keys — answerable exactly, in one pass,
 * before anyone provisions cache capacity.
 */
object Serving {

  /** Prefix-key token separator. U+0001 cannot appear in whitespace-split
   * tokens, making the joined key injective (see prefixCacheAudit). Kept
   * as a visible escape in a named constant (ADVICE r13): a raw control
   * byte in a string literal renders as `concat_ws("")` in diffs and
   * editors, so tooling could silently drop it and break injectivity. */
  private[graft] val PrefixSep = "\u0001"

  /**
   * Shared-prefix (KV/prompt-cache) audit: for each depth K in `depths`,
   * group documents by their EXACT first K tokens and price the reuse —
   * a group of size s at depth K re-serves (s−1)·K tokens from a warm
   * prefix. Documents shorter than K tokens are not eligible at that
   * depth (a shorter prompt can never hit a K-token prefix key).
   *
   * Scale contract: ONE BOUNDED tokenize pass — the split stops after
   * max(depths) tokens ([[TextAnalysis.tokensPrefix]]), so per-row cost
   * is O(prefix), not O(document), and the bounded array still decides
   * eligibility (its size is min(n_tokens, max depth), which preserves
   * `size >= k` for every audited depth). The array binds below the
   * depth explode — the q64-cliff rule, so |depths| never multiplies
   * the tokenizer; the shuffle carries (K, md5-of-prefix) coordinates,
   * 16-byte keys regardless of prefix depth; both aggregations are
   * group-bounded. Prefix keys join tokens with U+0001 before hashing —
   * whitespace-split tokens cannot contain whitespace, and U+0001 is not
   * producible by splitting ordinary corpora, so the joined key is
   * injective (the oracle groups by the raw prefix list and must agree).
   *
   * @return one row per depth: (prefix_tokens, n_docs, n_groups,
   *   docs_in_shared, cacheable_tokens) — docs_in_shared/cacheable are
   *   0 (not null) when nothing shares.
   */
  def prefixCacheAudit(docs: DataFrame, depths: Seq[Int],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(depths.nonEmpty && depths.forall(_ >= 1),
      s"depths must be positive, got $depths")
    require(depths.distinct.size == depths.size,
      s"depths must be distinct, got $depths")
    val base = docs.select(col(idCol).as("id"),
      TextAnalysis.tokensPrefix(col(textCol), depths.max).as("ts"))
    val keyed = base
      .select(col("id"), col("ts"),
        explode(typedLit(depths.toArray)).as("k"))
      .filter(size(col("ts")) >= col("k"))
      .select(col("k"),
        md5(concat_ws(PrefixSep, slice(col("ts"), lit(1), col("k")))).as("ph"))
    keyed
      .groupBy(col("k"), col("ph"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("k"))
      .agg(sum(col("sz")).as("n_docs"),
        count(lit(1)).as("n_groups"),
        coalesce(sum(when(col("sz") > 1, col("sz"))), lit(0L))
          .as("docs_in_shared"),
        coalesce(sum(when(col("sz") > 1, (col("sz") - 1) * col("k"))), lit(0L))
          .as("cacheable_tokens"))
      .select(col("k").cast("long").as("prefix_tokens"), col("n_docs"), col("n_groups"),
        col("docs_in_shared"), col("cacheable_tokens"))
  }
}
