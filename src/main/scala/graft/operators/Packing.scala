package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Sequence packing for context-window training: lay documents head-to-tail
 * in a deterministic order and chunk the concatenated token stream into
 * fixed-budget bins (the "concat-then-chunk" packing most LLM data loaders
 * use). Each document is assigned the bin its FIRST token lands in, plus
 * its offset inside that bin — enough for a loader to reconstruct every
 * bin's contents without re-scanning.
 *
 * Determinism contract (matches [[Sampling]]/[[Quota]]): stream order
 * within a partition key is (md5(id) hex, id), so the same packing falls
 * out on every run and engine — the q39 oracle re-derives it in DuckDB
 * with a window sum.
 *
 * Scale shape: packing is per stream partition (`partCol` — a shard key
 * like source/domain/split), ONE hash-partitioned window sort, no global
 * ordering anywhere. Prefix sums and the bin division are exact integer
 * arithmetic (`div`/`pmod` on longs — no doubles), so results are
 * reproducible at any stream length.
 */
object Packing {

  /** Assigns each row a `pack_id` (which budget-sized bin its first token
   * lands in, counted per `partCol` stream) and `pack_offset` (token
   * offset inside that bin). `tokensCol` must be a non-negative integral
   * token count; output adds the two columns to the input's. */
  def packByBudget(df: DataFrame, partCol: Column, idCol: Column,
      tokensCol: Column, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val rank = md5(idCol.cast("string"))
    val w = Window.partitionBy(partCol).orderBy(rank.asc, idCol.asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // A negative count would make a later row's prefix sum negative, and
    // div (truncates toward 0) + pmod (positive remainder) then emit a
    // self-INCONSISTENT (pack_id, pack_offset) pair — fail loudly instead.
    val toks = when(tokensCol < 0, raise_error(concat(
      lit("packByBudget: negative token count for id "), idCol.cast("string"))))
      .otherwise(tokensCol.cast("long"))
    df
      .withColumn("__p_start", coalesce(sum(toks).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"__p_start div ${budget}L"))
      .withColumn("pack_offset", pmod(col("__p_start"), lit(budget)))
      .drop("__p_start")
  }
}
