package graft.operators

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Collocation mining — the corpus-linguistics read behind tokenizer and
 * phrase-vocabulary decisions: which adjacent word pairs co-occur far
 * more than their unigram frequencies predict (PMI, Church & Hanks
 * 1990). Ranking is by LIFT n_ab/(n_a·n_b), which orders identically to
 * PMI = log(n_ab·N_u²/(N_b·n_a·n_b)) — the log and the corpus-constant
 * factors are monotone — so the whole ranking is integer arithmetic any
 * engine reproduces bit-for-bit.
 */
object Collocations {

  /**
   * Global top-k adjacent-bigram collocations by exact lift ordering:
   * key `lift_e12 = n_ab·1e12 div (n_a·n_b)` (truncated integer ratio),
   * ties → higher n_ab, then (w1, w2) lexicographic — deterministic on
   * any engine. `minCount` drops noise bigrams before the unigram joins
   * (PMI over singletons is famously degenerate — a pair of two hapaxes
   * maxes the statistic).
   *
   * Scale shape: unigram and bigram streams each combine map-side into
   * vocabulary-coordinate exchanges (the two scans are the q103 floor —
   * the consumers' pruned subtrees cannot canonically share one
   * derivation); the unigram joins move |bigram vocab| slim rows; the
   * global top-k rides the bounded [[TopK.topKStructs]] aggregate, so
   * at most k structs reach the driver-side exchange. Headroom:
   * n_ab·1e12 must fit a long ⇒ n_ab ≲ 9.2e6 per audit — raise
   * `minCount`/partition the corpus (by source/day) beyond that, the
   * same audit-window rule as the agreement statistics.
   *
   * @return (rank, w1, w2, n_ab, n_a, n_b, lift_e12), rank in [1, k]
   */
  def pmiTopK(docs: DataFrame, k: Int, minCount: Int,
      textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val toks = graft.dedup.Dedup.fanOutSmallScan(docs)
      .select(TextAnalysis.tokens(col(textCol)).as("ts"))
    val uni = toks.select(explode(col("ts")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val nb = greatest(size(col("ts")) - 1, lit(0))
    val bi = toks.select(explode(zip_with(
        slice(col("ts"), lit(1), nb), slice(col("ts"), lit(2), nb),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount.toLong)
    bi
      .join(uni.select(col("w").as("w1"), col("n").as("n_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("n").as("n_b")), "w2")
      .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
        expr("n_ab * 1000000000000L div (n_a * n_b)").as("lift_e12"))
      .groupBy()
      .agg(sort_array(TopK.topKStructs(struct(
        (-col("lift_e12")).as("nl"), (-col("n_ab")).as("nn"),
        col("w1"), col("w2"), col("n_a"), col("n_b")), k)).as("tk"))
      .select(posexplode(col("tk")).as(Seq("pos", "t")))
      .select((col("pos") + 1).cast("int").as("rank"),
        col("t.w1").as("w1"), col("t.w2").as("w2"),
        (-col("t.nn")).as("n_ab"), col("t.n_a").as("n_a"),
        col("t.n_b").as("n_b"), (-col("t.nl")).as("lift_e12"))
  }
}
