package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Re-identification-risk audits — the privacy pre-flight a corpus release
 * runs AFTER redaction ([[graft.text.Cleanup]] removes direct
 * identifiers; this measures what the remaining QUASI-identifiers still
 * reveal). Sweeney's k-anonymity is the standard yardstick: a row whose
 * quasi-identifier combination is shared by fewer than k rows is
 * re-identifiable by linking those attributes against any public table
 * that carries them.
 *
 * All outputs are integer counts — the audit is engine-reproducible and
 * threshold decisions stay exact rationals.
 */
object Privacy {

  /**
   * k-anonymity audit over a quasi-identifier tuple: for each threshold
   * k, how many rows sit in a QI-group smaller than k (the linkable
   * rows), and how many groups those are — plus the corpus-wide minimum
   * group size (the k the release actually achieves) and group count.
   *
   * Scale contract: ONE groupBy over the QI tuple (the shuffle carries
   * QI values + a count — never row payloads), then every threshold is
   * a CONDITIONAL aggregate over the |groups|-row size table in one
   * more pass; thresholds fan out as a projection (an explode over a
   * |ks|-element struct array), not as extra scans. |groups| is bounded
   * by the QI domain product, which is what makes the audit meaningful
   * in the first place (an unbounded-domain "QI" is a direct
   * identifier and belongs in redaction, not here).
   *
   * @param ks audit thresholds, e.g. Seq(2, 5, 10) — one output row per
   *   k: (k, rows_below_k, groups_below_k, min_group_size, n_groups)
   */
  def kAnonymityAudit(df: DataFrame, qi: Seq[Column], ks: Seq[Int]): DataFrame = {
    require(qi.nonEmpty, "need at least one quasi-identifier column")
    require(ks.nonEmpty && ks.forall(_ >= 1), s"thresholds must be >= 1, got $ks")
    // Duplicate thresholds would generate duplicate r$k/g$k aggregate
    // aliases and die in analysis with an ambiguous-reference error —
    // fail with the real reason instead (ADVICE r12).
    require(ks.distinct.size == ks.size, s"thresholds must be distinct, got $ks")
    val sizes = df.groupBy(qi: _*).agg(count(lit(1)).as("gsz"))
    // coalesce: an empty corpus has nothing linkable (zeros, not nulls);
    // min_group_size stays null there — "no groups" has no honest number.
    val perK = ks.flatMap(k => Seq(
      coalesce(sum(when(col("gsz") < k, col("gsz")).otherwise(0L)), lit(0L)).as(s"r$k"),
      coalesce(sum(when(col("gsz") < k, 1L).otherwise(0L)), lit(0L)).as(s"g$k")))
    val aggs = Seq(min(col("gsz")).as("min_group_size"),
      count(lit(1)).as("n_groups")) ++ perK
    sizes.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(ks.map(k => struct(lit(k).as("k"),
        col(s"r$k").as("rows_below_k"), col(s"g$k").as("groups_below_k"),
        col("min_group_size"), col("n_groups"))): _*)).as("e"))
      .select(col("e.k").as("k"), col("e.rows_below_k").as("rows_below_k"),
        col("e.groups_below_k").as("groups_below_k"),
        col("e.min_group_size").as("min_group_size"),
        col("e.n_groups").as("n_groups"))
  }
}
