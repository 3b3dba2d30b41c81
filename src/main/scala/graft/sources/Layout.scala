package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Physical-layout helpers: bucketing for shuffle-free co-located joins.
 *
 * At 100 TB the same fact tables join on the same keys every day; paying a
 * full shuffle of both sides per query is the single largest avoidable
 * cost. Writing both sides bucketed (and sorted) by the join key once means
 * every subsequent equi-join on that key reads co-located buckets and
 * plans a sort-merge join with NO Exchange on either side — the scan IS the
 * shuffle, amortized over every future query.
 */
object Layout {

  /**
   * Write `df` as a bucketed, bucket-sorted table in the session catalog.
   * Joins between tables bucketed the same way (same columns, same count)
   * plan without an exchange; `nBuckets` should be sized so one bucket of
   * the LARGER table fits an executor's memory comfortably.
   */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  // -------------------------------------------------------------- Z-order

  /** Spread the low 16 bits of `c` (a long) so bit i lands at bit 2i —
   * the classic four mask-shift rounds. Pure built-in long arithmetic:
   * whole-stage codegen'd in Spark, and bit-identical in any engine with
   * `|`/`&`/`<<` on 64-bit ints (the oracle re-derives it in DuckDB). */
  private def spread16(c: Column): Column = {
    val s0 = c.bitwiseAND(lit(0xFFFFL))
    val s1 = s0.bitwiseOR(shiftleft(s0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /**
   * Two-dimensional Z-order (Morton) value over two pre-quantized 16-bit
   * cell coordinates: bit i of `x` lands at bit 2i, bit i of `y` at 2i+1.
   * Sorting or range-partitioning by this value clusters BOTH dimensions
   * simultaneously, so per-file min/max statistics prune scans for
   * predicates on either column — the layout move (Delta's `ZORDER BY`,
   * the curve from Morton 1966) that single-column sorting cannot make:
   * sorted-by-x files each span the full y range and vice versa.
   *
   * Callers quantize first (e.g. `quantize16`) — the curve operates on
   * grid cells, not raw values, and the quantizer is where distribution
   * skew is handled (equi-width here; swap in equi-depth ranks upstream
   * for heavy-tailed keys).
   */
  def zorder2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Equi-width quantization of `c` onto the 16-bit grid `[0, 65535]`
   * given inclusive bounds — the Z-order companion. In-range values land
   * strictly below 65536 by construction (the 65535 cap only guards
   * inputs above `hi`, which callers own clamping); domains narrower than
   * the grid occupy every `65536/width`-th cell, which Z-ordering is
   * indifferent to — cell ORDER is all the curve uses.
   *
   * Spark's `/` on longs is double division, exact only while the
   * numerator stays under 2^53 — so the domain width is REQUIRED under
   * 2^37 (the q60 lesson: make integer-semantics bounds explicit, never
   * silent). DuckDB's `//` re-derives the identical cell. */
  def quantize16(c: Column, lo: Long, hi: Long): Column = {
    require(hi > lo, s"quantize16 needs hi > lo, got [$lo, $hi]")
    require(hi - lo + 1 <= (1L << 37),
      s"quantize16 domain width ${hi - lo + 1} exceeds 2^37: " +
        "(c-lo)*65536 would lose integer exactness in double division")
    least(floor((c - lit(lo)) * lit(65536L) / lit(hi - lo + 1)), lit(65535L))
      .cast("long")
  }

  /**
   * Cluster `df` for writing along the 2-D Z-order curve: range-partition
   * into `nFiles` splits of the curve and sort rows by Z within each — the
   * exact physical layout [[zorderAudit]] simulates with top-bit buckets,
   * produced with ONE exchange (the range partitioner's sampling pass
   * included) and parallel local sorts, never a global sort. Write the
   * result with any file sink; each output file then carries tight
   * min/max spans on BOTH quantized dimensions, so parquet statistics
   * pruning works for predicates on either column.
   */
  def repartitionByZOrder(df: DataFrame, x: Column, y: Column,
      nFiles: Int): DataFrame = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    df.withColumn("__z", zorder2(x, y))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Catalyst twin of [[zorder2]] for the SQL registry (a registry builder
   * must return a resolved expression tree — the same Spark-4 constraint
   * as Cleanup's builders). Composes the IDENTICAL four mask-shift rounds,
   * so `zorder2(x, y)` in SQL and the Column DSL cannot drift; inputs are
   * cast to long so SQL integer literals work. */
  private[graft] def zorder2Expr(x: org.apache.spark.sql.catalyst.expressions.Expression,
      y: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Cast, Expression, Literal, ShiftLeft}
    import org.apache.spark.sql.types.LongType
    def spread(e: Expression): Expression = {
      val s0 = BitwiseAnd(Cast(e, LongType), Literal(0xFFFFL))
      val s1 = BitwiseAnd(BitwiseOr(s0, ShiftLeft(s0, Literal(8))), Literal(0x00FF00FFL))
      val s2 = BitwiseAnd(BitwiseOr(s1, ShiftLeft(s1, Literal(4))), Literal(0x0F0F0F0FL))
      val s3 = BitwiseAnd(BitwiseOr(s2, ShiftLeft(s2, Literal(2))), Literal(0x33333333L))
      BitwiseAnd(BitwiseOr(s3, ShiftLeft(s3, Literal(1))), Literal(0x55555555L))
    }
    BitwiseOr(spread(x), ShiftLeft(spread(y), Literal(1)))
  }

  /**
   * Locality audit for a Z-ordered layout: assign each row to one of
   * `1 << (2*bucketBits)` files by the TOP bits of its Z-value (exactly how
   * a range-partitioned write would split the sorted curve), then report
   * per-file row count and min/max of BOTH quantized dimensions. Tight
   * per-file spans on both columns — each file covering ~1/2^bucketBits of
   * each axis — are what make min/max file skipping effective for
   * predicates on either; a single-column sort shows full-range spans on
   * the other column. One pass + one coordinates-only aggregation.
   */
  def zorderAudit(df: DataFrame, x: Column, y: Column, bucketBits: Int = 3): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 8, s"bucketBits in [1,8], got $bucketBits")
    val z = zorder2(x, y)
    df.select(x.as("qx"), y.as("qy"), shiftright(z, 32 - 2 * bucketBits).as("file_id"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min("qx").as("min_x"), max("qx").as("max_x"),
        min("qy").as("min_y"), max("qy").as("max_y"))
  }

  // ------------------------------------------------------- Hilbert curve

  /** Distance along the order-`bits` 2-D Hilbert curve for pre-quantized
   * cells — [[zorder2]]'s better-locality sibling; see [[Hilbert2]]. */
  def hilbert2(x: Column, y: Column, bits: Int = 16): Column =
    org.apache.spark.sql.graft.GraftSqlBridge.column(Hilbert2(
      org.apache.spark.sql.graft.GraftSqlBridge.expression(x),
      org.apache.spark.sql.graft.GraftSqlBridge.expression(y), bits))

  /** [[repartitionByZOrder]] along the Hilbert curve instead: same single
   * range exchange + parallel local sorts, tighter per-file blobs. */
  def repartitionByHilbert(df: DataFrame, x: Column, y: Column,
      nFiles: Int): DataFrame = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    df.withColumn("__h", hilbert2(x, y))
      .repartitionByRange(nFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
  }

  /** [[zorderAudit]] along the Hilbert curve: same top-bits file split of
   * the 32-bit curve position, same per-file span report — run both and
   * compare max spans to price the curve choice on real data. */
  def hilbertAudit(df: DataFrame, x: Column, y: Column, bucketBits: Int = 3): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 8, s"bucketBits in [1,8], got $bucketBits")
    val h = hilbert2(x, y)
    df.select(x.as("qx"), y.as("qy"), shiftright(h, 32 - 2 * bucketBits).as("file_id"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min("qx").as("min_x"), max("qx").as("max_x"),
        min("qy").as("min_y"), max("qy").as("max_y"))
  }

  /**
   * Small-file compaction: rewrite a parquet directory into
   * `ceil(totalBytes / targetFileBytes)` files. Streaming sinks, CDC
   * upserts, and per-partition task writes all accumulate kilobyte files;
   * at scan time each costs a footer read + a task schedule, so a
   * million-file table can spend longer planning than reading — periodic
   * compaction is the standing maintenance job of every large lake.
   *
   * File count is sized from the SOURCE's actual on-disk bytes (listing
   * only — no data read), so compression survives the rewrite estimate.
   * The rewrite is one `coalesce` job: no shuffle at all — existing rows
   * just concatenate into fewer, larger files (row order within the new
   * files is whatever the scan yields; layout-sensitive tables should
   * re-run [[repartitionByZOrder]]/[[repartitionByHilbert]] instead,
   * which pay one range exchange to also restore clustering).
   *
   * Writes to `destDir` (refusing an in-place rewrite: reading and
   * overwriting the same path in one job loses the data on failure —
   * callers atomically swap directories after the job succeeds).
   *
   * @return the number of output files written
   */
  def compact(spark: org.apache.spark.sql.SparkSession, srcDir: String,
      destDir: String, targetFileBytes: Long = 128L << 20): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive")
    require(new java.io.File(srcDir).getCanonicalPath !=
      new java.io.File(destDir).getCanonicalPath,
      "in-place compaction is unsafe: write to a new directory and swap")
    val src = spark.read.parquet(srcDir)
    val totalBytes = src.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = ((totalBytes + BigInt(targetFileBytes) - 1) / BigInt(targetFileBytes))
      .max(BigInt(1)).min(BigInt(Int.MaxValue)).toInt
    src.coalesce(nFiles).write.mode("overwrite").parquet(destDir)
    nFiles
  }

  /**
   * Shard manifest — the per-shard integrity/provenance record a training
   * run publishes next to its data release: row count, content byte mass,
   * the id range, and an ORDER-INDEPENDENT content checksum (bit-XOR of
   * per-row md5-64 over id ‖ ':' ‖ content-md5). A consumer re-derives the
   * manifest on its own copy — any engine with `md5()` can — and a single
   * flipped byte, dropped row, duplicated row, or cross-shard misfile
   * changes the corresponding shard line. XOR is the right fold here: it
   * is commutative/associative (shard-internal row order, partition
   * count, and engine are all free to differ), overflow-free, and its
   * partial values combine map-side, so the manifest is one aggregation
   * whose shuffle is |shards| rows.
   *
   * The checksum hashes CONTENT through its md5, not raw text bytes, so
   * the manifest row stays ~40 bytes regardless of document size, and the
   * id is folded in so two swapped texts between docs of one shard cannot
   * cancel. (A per-row xor of ids alone would miss content edits; content
   * alone would miss re-labeling.)
   *
   * @param df       sharded corpus (e.g. [[graft.operators.Sampling.epochShards]] output)
   * @param shardCol shard assignment column
   * @param idCol    stable row id
   * @param contentCol document payload (string)
   */
  def shardManifest(df: DataFrame, shardCol: Column, idCol: Column,
      contentCol: Column): DataFrame = {
    val rowHash = graft.operators.Sampling.md5Hash64(
      concat(idCol.cast("string"), lit(":"), md5(contentCol.cast("binary"))))
    // bit_xor has no Column-API builder — bind the row hash to a named
    // column and reference it from the SQL aggregate.
    df.withColumn("__row_hash", rowHash)
      .groupBy(shardCol.as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(length(contentCol).cast("long")).as("n_chars"),
        min(idCol).as("min_id"), max(idCol).as("max_id"),
        expr("bit_xor(__row_hash)").as("content_xor"))
  }
}
