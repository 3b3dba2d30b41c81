package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Per-key quota capping — "keep at most n documents per domain/source" —
 * the standard guard against a handful of mega-domains dominating a
 * training corpus.
 *
 * Determinism contract (matches [[Sampling]]): survivors are the first `n`
 * rows per key under the order (md5(id) hex, id). The same rows survive on
 * every run and every engine — DuckDB/Postgres/Trino re-derive the exact
 * set with `md5()` + `row_number()` (see the q38 oracle).
 *
 * Scale shape: the naive plan — one `row_number` window per key — shuffles
 * EVERY row of a hot key into one task; a 100 TB corpus where one domain
 * holds 10^9 documents puts 10^9 rows through a single sort. `quotaCap`
 * runs two phases instead:
 *
 *  1. cap each (key, salt) cell at `n`, salt = hash(id) mod `salts` — the
 *     hot key's rows spread over `salts` parallel cells, and no task ever
 *     ranks more than one cell;
 *  2. re-rank the ≤ n·salts survivors per key and keep the first `n`.
 *
 * Phase 1 cannot evict a global survivor: ranking order is identical in
 * both phases, so a row in the global top-n of its key is also in the
 * top-n of whichever cell it landed in. Phase 2's per-key input is bounded
 * by n·salts rows — constant, never data-sized.
 */
object Quota {

  /** At most `n` rows per `keyCol`, deterministic by (md5(id), id).
   * `salts` > 1 adds the skew-safe pre-cap phase; `salts = 1` is the
   * single-window plan (fine when no key is hot). Output columns = input
   * columns, order-preserving per the determinism contract. */
  def quotaCap(df: DataFrame, keyCol: Column, idCol: Column, n: Int, salts: Int = 16): DataFrame = {
    require(n > 0, s"quota must be positive, got $n")
    require(salts > 0, s"salts must be positive, got $salts")
    val rank = md5(idCol.cast("string"))
    val pre =
      if (salts == 1) df
      else df
        .withColumn("__q_salt", pmod(xxhash64(idCol), lit(salts.toLong)))
        .withColumn("__q_rn", row_number().over(
          Window.partitionBy(keyCol, col("__q_salt")).orderBy(rank.asc, idCol.asc)))
        .filter(col("__q_rn") <= n)
        .drop("__q_salt", "__q_rn")
    pre
      .withColumn("__q_rn", row_number().over(
        Window.partitionBy(keyCol).orderBy(rank.asc, idCol.asc)))
      .filter(col("__q_rn") <= n)
      .drop("__q_rn")
  }
}
