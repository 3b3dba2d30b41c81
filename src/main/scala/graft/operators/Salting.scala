package graft.operators

import graft.hll.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew handling for heavy-key aggregation: two-phase salted aggregation.
 *
 * A `groupBy(key)` over data where one key holds a large fraction of all
 * rows puts that key's entire volume on one reducer — the classic straggler
 * at 100 TB. Salting splits each key into `saltBuckets` synthetic sub-keys
 * for the first (parallel) phase, then combines the per-salt partials in a
 * second phase whose input is only |keys| × saltBuckets rows.
 *
 * Only algebraic aggregates compose this way; the helpers here cover the
 * common ones (count, sum, min, max) and — the library's own specialty —
 * HLL sketches, which are mergeable BY DESIGN: phase 1 builds a sketch per
 * (key, salt), phase 2 `hll_merge`s them. AQE's skew-join handling covers
 * joins; salting covers aggregation, which AQE does not rebalance.
 */
object Salting {

  /** Deterministic salt in [0, saltBuckets) derived from arbitrary columns
   * (e.g. a row id); using a hash keeps the phase-1 split even. */
  def salt(saltBuckets: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(saltBuckets))

  /**
   * Salted `count` / `sum` / `min` / `max` aggregation.
   *
   * @param aggs (outputName, aggKind, valueColumn) with aggKind one of
   *             "count" (valueColumn ignored), "sum", "min", "max"
   */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], saltBuckets: Int,
      saltSource: Seq[Column], aggs: Seq[(String, String, Column)]): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val phase1Aggs = aggs.map {
      case (name, "count", _) => count(lit(1)).as(name)
      case (name, "sum", c) => sum(c).as(name)
      case (name, "min", c) => min(c).as(name)
      case (name, "max", c) => max(c).as(name)
      case (_, kind, _) => throw new IllegalArgumentException(
        s"non-algebraic aggregate '$kind' cannot be salted")
    }
    val phase2Aggs = aggs.map {
      case (name, "count", _) => sum(col(name)).as(name)
      case (name, "sum", _) => sum(col(name)).as(name)
      case (name, "min", _) => min(col(name)).as(name)
      case (name, "max", _) => max(col(name)).as(name)
      case (_, kind, _) => throw new IllegalArgumentException(kind)
    }
    df.withColumn("__salt", salt(saltBuckets, saltSource: _*))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(phase1Aggs.head, phase1Aggs.tail: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(phase2Aggs.head, phase2Aggs.tail: _*)
  }

  /**
   * Salted distinct-count via HLL sketches: phase 1 builds one sketch per
   * (key, salt) — bounded reducer state regardless of how hot the key is —
   * phase 2 merges sketches per key. Identical estimate to the unsalted
   * aggregation: sketch union is exactly how the partial/final split works
   * anyway, salting just adds one more merge level.
   */
  def saltedDistinctSketch(df: DataFrame, keyCols: Seq[String], valueCol: Column,
      saltBuckets: Int, relativeSD: Double = 0.05): DataFrame =
    df.withColumn("__salt", salt(saltBuckets, valueCol))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(hll_init_agg(valueCol, relativeSD).as("partial_hll"))
      .groupBy(keyCols.map(col): _*)
      .agg(hll_merge(col("partial_hll")).as("value_hll"))

  /**
   * Skew-safe inner equi-join for the case broadcast can't cover: the
   * build side is too big to broadcast, and a handful of hot keys would
   * drag the probe side's heaviest partitions through single reducers in
   * a sort-merge join. Each probe row takes a deterministic salt (hashed
   * from its whole row, so a hot KEY's rows spread evenly); the build side
   * replicates across all `saltBuckets` salts. Every probe row then meets
   * each matching build row exactly once — at the probe row's own salt —
   * so the result multiset is identical to the plain join, while the hot
   * key's probe rows land on `saltBuckets` reducers instead of one.
   * Cost: |build| × saltBuckets replication — size saltBuckets to the
   * observed skew, not higher.
   */
  def saltedJoin(probe: DataFrame, build: DataFrame, keyCols: Seq[String],
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val probeSalted = probe.withColumn("__salt",
      salt(saltBuckets, probe.columns.map(col).toSeq: _*))
    val buildReplicated = build.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    probeSalted.join(buildReplicated, keyCols :+ "__salt").drop("__salt")
  }
}
